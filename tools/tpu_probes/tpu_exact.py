import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
print('devices:', jax.devices(), flush=True)
from fontrx.kernels.exactmath import div_cr, sqrt_cr
rng = np.random.default_rng(0)
a = (rng.random((80,128)).astype(np.float32)*4000-2000)
b = (rng.random((80,128)).astype(np.float32)*4000-2000); b = np.where(np.abs(b)<0.5, 1.0, b).astype(np.float32)
q = np.asarray(jax.jit(div_cr)(jnp.array(a), jnp.array(b)))
print('TPU div_cr mismatches vs IEEE:', int((q != a/b).sum()), '/', q.size, flush=True)
d = rng.random((80,128)).astype(np.float32)*4e6
s = np.asarray(jax.jit(sqrt_cr)(jnp.array(d)))
print('TPU sqrt_cr mismatches vs IEEE:', int((s != np.sqrt(d)).sum()), '/', d.size, flush=True)
# adversarial: quotients near ties — random ints (the winding case)
ai = rng.integers(-16384, 16384, (80,128)).astype(np.float32)
bi = rng.integers(1, 16384, (80,128)).astype(np.float32)
qi = np.asarray(jax.jit(div_cr)(jnp.array(ai), jnp.array(bi)))
print('TPU div_cr int-input mismatches:', int((qi != ai/bi).sum()), flush=True)

from fontrx.font.font import Font
from fontrx.pack.segments import glyph_segments
from fontrx.kernels.grid import RasterGrid
from fontrx.kernels import oracle
from fontrx.kernels.winding_pallas_v2 import winding_pallas_v2_batch
f = Font.open('/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf')
tot_mm = tot_px = 0
for ch in 'AQg@&%MW':
    g, _ = f.get_glyph(ch)
    seg = glyph_segments(g)
    grid = RasterGrid.for_glyph_box((g.box.x_min,g.box.y_min,g.box.x_max,g.box.y_max), 256, 2048).padded(128,128)
    out = winding_pallas_v2_batch(jnp.asarray(seg)[None], jnp.array([grid.min_x], jnp.int32),
        jnp.array([grid.max_y], jnp.int32), jnp.float32(grid.scale),
        height=grid.height, width=grid.width, exact=True)
    wo = oracle.winding_map(seg, grid)
    mm = int((np.asarray(out[0])!=wo).sum())
    tot_mm += mm; tot_px += wo.size
    print(ch, 'exact-mode TPU mismatches:', mm, '/', wo.size, flush=True)
print('TOTAL exact-mode TPU mismatches:', tot_mm, '/', tot_px, flush=True)

# perf cost of exact mode
from fontrx.engine.atlas import pack_charset
batch = pack_charset(f, [c for c in range(33,127)])
grids = [RasterGrid.fixed_tile(tuple(bb), 256, 2048, 256) for bb in np.asarray(batch.boxes)]
mx = jnp.array([g2.min_x for g2 in grids], jnp.int32); my = jnp.array([g2.max_y for g2 in grids], jnp.int32)
segs = jnp.array(batch.segments); sc = jnp.float32(grids[0].scale)
def bench(exact, n=20):
    fn = lambda: winding_pallas_v2_batch(segs, mx, my, sc, height=256, width=256, exact=exact)
    fn().block_until_ready()
    t0=time.time()
    for _ in range(n): fn().block_until_ready()
    return (time.time()-t0)/n
df = bench(False); de = bench(True)
print('ascii94@256 fast %.1fms (%.0f g/s)  exact %.1fms (%.0f g/s)  cost %.2fx' % (
    df*1e3, 94/df, de*1e3, 94/de, de/df), flush=True)
print('DONE', flush=True)
