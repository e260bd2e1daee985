import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
print('devices:', jax.devices(), flush=True)
# config-3 loopblinn timing investigation: identical vs varying inputs
from fontrx.font.font import Font
from fontrx.geometry import TriangulatedGlyph
from fontrx.kernels.grid import RasterGrid
from fontrx.kernels.loopblinn import _pack_triangle_arrays, loopblinn_batch, pad_triangles
font = Font.open('/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf')
chars = [chr(c) for c in range(33,127)]
tgs = [TriangulatedGlyph.from_glyph(font.get_glyph(c)[0]) for c in chars]
cap = max(len(t.triangles) for t in tgs)
tris = np.zeros((len(tgs), cap, 3, 4), np.float32)
cls = np.full((len(tgs), cap), 3, np.int32)
boxes = []
for i, (c, tg) in enumerate(zip(chars, tgs)):
    p, pc = pad_triangles(_pack_triangle_arrays(tg), tg.classes, cap)
    tris[i] = p; cls[i] = pc
    g, _ = font.get_glyph(c)
    boxes.append((g.box.x_min, g.box.y_min, g.box.x_max, g.box.y_max))
grids = [RasterGrid.fixed_tile(b, 128, 2048, 128) for b in boxes]
mx = jnp.array([g.min_x for g in grids], jnp.int32); my = jnp.array([g.max_y for g in grids], jnp.int32)
dtris = jnp.asarray(tris); dcls = jnp.asarray(cls); sc = jnp.float32(grids[0].scale)
out = loopblinn_batch(dtris, dcls, mx, my, sc, height=128, width=128)
out.block_until_ready()
print('ink fraction:', float(np.asarray(out).mean()), flush=True)
# identical-input timing
t0=time.time()
for _ in range(20):
    loopblinn_batch(dtris, dcls, mx, my, sc, height=128, width=128).block_until_ready()
print('identical inputs: %.3f ms' % ((time.time()-t0)/20*1e3), flush=True)
# varying-input timing (shift mx by 0 alternating objects)
mxs = [jnp.array(np.array([g.min_x for g in grids], np.int32) + (i % 2)) for i in range(20)]
t0=time.time()
for i in range(20):
    loopblinn_batch(dtris, dcls, mxs[i], my, sc, height=128, width=128).block_until_ready()
print('varying inputs:   %.3f ms' % ((time.time()-t0)/20*1e3), flush=True)
# fetch output each time (forces full materialization to host)
t0=time.time()
for i in range(5):
    np.asarray(loopblinn_batch(dtris, dcls, mxs[i], my, sc, height=128, width=128))
print('with host fetch:  %.3f ms' % ((time.time()-t0)/5*1e3), flush=True)
print('DONE', flush=True)
