import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from fontrx.kernels.winding_pallas import winding_pallas_batch
from fontrx.kernels.winding_pallas_v2 import winding_pallas_v2_batch
from fontrx.font.font import Font
from fontrx.kernels.grid import RasterGrid
from fontrx.engine.atlas import pack_charset
print('devices:', jax.devices(), flush=True)
f = Font.open('/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf')
batch = pack_charset(f, [c for c in range(33,127)])
grids = [RasterGrid.fixed_tile(tuple(b), 256, 2048, 256) for b in np.asarray(batch.boxes)]
mx0 = np.array([g.min_x for g in grids], np.int32)
my = jnp.array([g.max_y for g in grids], jnp.int32)
segs = jnp.array(batch.segments); sc_ = jnp.float32(grids[0].scale)
mxs = [jnp.array(mx0 + i) for i in range(8)]

# RTT baseline: trivial kernel on same shapes
triv = jax.jit(lambda mx: (mx.sum() + segs[0,0,0,0]))
float(triv(mxs[0]))
t0=time.time()
for i in range(20): float(triv(mxs[i%8]))
rtt = (time.time()-t0)/20
print('scalar-fetch RTT baseline: %.2f ms' % (rtt*1e3), flush=True)

def bench(name, fn, n=20):
    float(fn(mxs[0])[0,0,0])  # warm
    t0=time.time()
    for i in range(n):
        float(fn(mxs[i % 8])[0,0,0])
    dt=(time.time()-t0)/n
    print('%s: %.1f ms/it (%.0f g/s) [rtt-corrected %.1f ms]' % (
        name, dt*1e3, 94/dt, (dt-rtt)*1e3), flush=True)

bench('v2 exact guard-auto(chunk16)', lambda mx: winding_pallas_v2_batch(segs, mx, my, sc_, height=256, width=256, exact=True))
bench('v2 fast  (chunk16)          ', lambda mx: winding_pallas_v2_batch(segs, mx, my, sc_, height=256, width=256, exact=False))
bench('v2 exact guard=True         ', lambda mx: winding_pallas_v2_batch(segs, mx, my, sc_, height=256, width=256, exact=True, guard=True))
bench('v2 exact chunk=8            ', lambda mx: winding_pallas_v2_batch(segs, mx, my, sc_, height=256, width=256, exact=True, seg_chunk=8))
bench('v1                          ', lambda mx: winding_pallas_batch(segs, mx, my, sc_, height=256, width=256))
print('DONE', flush=True)
