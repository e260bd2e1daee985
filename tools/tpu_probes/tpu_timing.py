import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
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
fn = lambda mx: winding_pallas_v2_batch(segs, mx, my, sc_, height=256, width=256, exact=True)
# stage 8 distinct inputs
mxs = [jnp.array(mx0 + i) for i in range(8)]
fn(mxs[0]).block_until_ready()
print('compiled', flush=True)
# identical inputs
t0=time.time()
for _ in range(20): fn(mxs[0]).block_until_ready()
print('identical: %.2f ms/it' % ((time.time()-t0)/20*1e3), flush=True)
# varying inputs
t0=time.time()
for i in range(20): fn(mxs[i % 8]).block_until_ready()
print('varying:   %.2f ms/it' % ((time.time()-t0)/20*1e3), flush=True)
# varying, second pass (all 8 already seen -> memoized?)
t0=time.time()
for i in range(20): fn(mxs[i % 8]).block_until_ready()
print('varying2:  %.2f ms/it' % ((time.time()-t0)/20*1e3), flush=True)
print('DONE', flush=True)
