"""Consolidated TPU validation of everything changed since the last
full TPU round: v2-everywhere engine (small tiles), fused coverage,
fixed sdf_pallas, compacted direct page."""
import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
print('devices:', jax.devices(), flush=True)
from fontrx.font.font import Font
from fontrx.engine.raster import RasterEngine
from fontrx.engine.atlas import pack_charset
from fontrx.kernels.grid import RasterGrid
from fontrx.kernels import oracle
f = Font.open('/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf')
eng = RasterEngine()

# 1. small-tile (32px) path through the engine == oracle
batch = pack_charset(f, 'aequos')
w, grids = eng.winding_packed(batch, 32, 2048, 32)
mm = 0
for i, g in enumerate(grids):
    xs, ys = g.sample_coords()
    mm += int((np.asarray(w[i]) != oracle.winding_at(batch.segments[i], xs[None,:], ys[:,None])).sum())
print('engine 32px tiles mismatches:', mm, flush=True)

# 2. fused coverage on TPU == multipass jnp coverage on CPU values
from fontrx.kernels.coverage import sample_offsets
g1, _ = f.get_glyph('g')
from fontrx.pack.segments import glyph_segments
seg = glyph_segments(g1)
grid = RasterGrid.for_glyph_box((g1.box.x_min,g1.box.y_min,g1.box.x_max,g1.box.y_max), 100, 2048)
cov = np.asarray(eng.coverage_batch(jnp.asarray(seg)[None],
    jnp.array([grid.min_x], jnp.int32), jnp.array([grid.max_y], jnp.int32),
    grid.scale, height=grid.height, width=grid.width, samples=2))[0]
ref = np.zeros_like(cov)
for ox, oy in sample_offsets(2):
    xs = ((grid.min_x + np.arange(grid.width)).astype(np.float32) + ox) / np.float32(grid.scale)
    ys = ((grid.max_y - np.arange(grid.height)).astype(np.float32) + oy) / np.float32(grid.scale)
    ref += (oracle.winding_at(seg, xs[None,:], ys[:,None]) != 0).astype(np.float32)
ref /= 4
print('fused coverage TPU vs oracle mismatches:', int((cov != ref).sum()), '/', cov.size, flush=True)

# 3. sdf_pallas on TPU (post reshape-fix) vs jnp-on-CPU values? compare sign+clamp vs oracle-derived
from fontrx.kernels.sdf_pallas import sdf_pallas_batch
from fontrx.pack.segments import pack_glyphs
glyphs = [f.get_glyph(c)[0] for c in 'Ag']
b2 = pack_glyphs(glyphs)
g2 = [RasterGrid.fixed_tile(tuple(bb), 32, 2048, 32) for bb in b2.boxes]
sdf = np.asarray(sdf_pallas_batch(jnp.asarray(b2.segments),
    jnp.array([g.min_x for g in g2], jnp.int32), jnp.array([g.max_y for g in g2], jnp.int32),
    jnp.float32(g2[0].scale), height=32, width=128))[:, :, :32]
for i, g in enumerate(g2):
    xs, ys = g.sample_coords()
    wnd = oracle.winding_at(b2.segments[i], xs[None,:], ys[:,None])
    sgn_ok = ((sdf[i] > 0) == ((wnd != 0) & (np.abs(sdf[i]) > 1e-6))) | (np.abs(sdf[i]) <= 1e-6)
    print('sdf sign consistency glyph', i, ':', bool(sgn_ok.all()), flush=True)

# 4. direct page on TPU == oracle page
from fontrx.scene.layout import layout_text
from fontrx.scene.page import PageRenderer
from fontrx.scene.transform import ViewTransform
layout = layout_text(f, 'TPU!')
pr = PageRenderer(f, layout, 384, 128, eng)
view = ViewTransform.init(2048, 384, 128)
page = np.asarray(pr.render_direct(view))
slots, offs = layout.instance_arrays()
s_px = np.float32(view.scale[0] * (384 / 2.0))
chunks = []
for slot, (ex, ey) in zip(slots, offs):
    ndc = view.apply(float(ex), float(ey))
    off = np.array([(ndc[0]+1)/2*384, (ndc[1]+1)/2*128], np.float32)
    n = layout.batch.seg_counts[slot]
    chunks.append(layout.batch.segments[slot][:n] * s_px + off)
allsegs = np.concatenate(chunks).astype(np.float32)
xs = np.arange(384, dtype=np.float32); ys = (127 - np.arange(128)).astype(np.float32)
wp = oracle.winding_at(allsegs, xs[None,:], ys[:,None])
print('direct page TPU mismatches:', int(((page != 0) != (wp != 0)).sum()), '/', page.size, flush=True)
print('DONE', flush=True)
