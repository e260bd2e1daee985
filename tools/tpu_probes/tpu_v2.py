import sys, time, json
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from fontrx.font.font import Font
from fontrx.pack.segments import glyph_segments
from fontrx.kernels.grid import RasterGrid
from fontrx.kernels import oracle
from fontrx.kernels.winding_pallas import winding_pallas_batch
from fontrx.kernels.winding_pallas_v2 import winding_pallas_v2_batch
from fontrx.engine.atlas import pack_charset
print('devices:', jax.devices(), flush=True)

f = Font.open('/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf')
batch = pack_charset(f, [c for c in range(33,127)])
grids = [RasterGrid.fixed_tile(tuple(b), 256, 2048, 256) for b in np.asarray(batch.boxes)]
mx = jnp.array([g.min_x for g in grids], jnp.int32); my = jnp.array([g.max_y for g in grids], jnp.int32)
segs = jnp.array(batch.segments)
sc = jnp.float32(grids[0].scale)

# v2 correctness vs v1 on TPU (identical float semantics expected)
t0=time.time()
o2 = winding_pallas_v2_batch(segs, mx, my, sc, height=256, width=256); o2.block_until_ready()
print('v2 compile %.1fs' % (time.time()-t0), flush=True)
t0=time.time()
o1 = winding_pallas_batch(segs, mx, my, sc, height=256, width=256); o1.block_until_ready()
print('v1 compile %.1fs' % (time.time()-t0), flush=True)
d = int((np.asarray(o1) != np.asarray(o2)).sum())
print('v1 vs v2 mismatches on TPU:', d, '/', o1.size, flush=True)

def bench(fn, n=20):
    fn().block_until_ready()
    t0=time.time()
    for _ in range(n): fn().block_until_ready()
    return (time.time()-t0)/n

d1 = bench(lambda: winding_pallas_batch(segs, mx, my, sc, height=256, width=256))
d2 = bench(lambda: winding_pallas_v2_batch(segs, mx, my, sc, height=256, width=256))
print('ascii94@256: v1 %.1f ms (%.0f g/s)  v2 %.1f ms (%.0f g/s)  speedup %.2fx' % (
    d1*1e3, 94/d1, d2*1e3, 94/d2, d1/d2), flush=True)

# larger realistic batch: CJK-ish segment counts via serif font at high S
f2 = Font.open('/usr/share/fonts/truetype/dejavu/DejaVuSerif.ttf')
batch2 = pack_charset(f2, [c for c in range(0x100, 0x200)])
g2 = [RasterGrid.fixed_tile(tuple(b), 128, 2048, 128) for b in np.asarray(batch2.boxes)]
segs2 = jnp.array(batch2.segments)
mx2 = jnp.array([g.min_x for g in g2], jnp.int32); my2 = jnp.array([g.max_y for g in g2], jnp.int32)
sc2 = jnp.float32(g2[0].scale)
print('batch2 B=%d S=%d' % (batch2.segments.shape[0], batch2.segments.shape[1]), flush=True)
d3 = bench(lambda: winding_pallas_v2_batch(segs2, mx2, my2, sc2, height=128, width=128), n=10)
print('latin-ext256@128 v2: %.1f ms (%.0f g/s)' % (d3*1e3, 256/d3), flush=True)
print('DONE', flush=True)
