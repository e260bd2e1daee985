import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from fontrx.kernels.winding_pallas_v2 import winding_pallas_v2_batch
print('devices:', jax.devices(), flush=True)
# small warmup
rng = np.random.default_rng(0)
w = winding_pallas_v2_batch(jnp.array(rng.integers(-50,50,(2,32,3,2)).astype(np.float32)),
    jnp.zeros(2, jnp.int32), jnp.full(2,127,jnp.int32), jnp.float32(1.0), height=128, width=128)
w.block_until_ready()
print('warmup ok', flush=True)
from fontrx.font.font import Font
from fontrx.kernels.grid import RasterGrid
from fontrx.engine.atlas import pack_charset
f = Font.open('/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf')
batch = pack_charset(f, [c for c in range(33,127)])
grids = [RasterGrid.fixed_tile(tuple(b), 256, 2048, 256) for b in np.asarray(batch.boxes)]
mx = jnp.array([g.min_x for g in grids], jnp.int32); my = jnp.array([g.max_y for g in grids], jnp.int32)
segs = jnp.array(batch.segments); sc_ = jnp.float32(grids[0].scale)
print('data staged', flush=True)
ref = None
def run(sc, tw, gu, n=20):
    global ref
    fn = lambda: winding_pallas_v2_batch(segs, mx, my, sc_, height=256, width=256,
                                          exact=True, seg_chunk=sc, tile_w=tw, guard=gu)
    t0=time.time(); out = fn(); out.block_until_ready()
    print('  compiled in %.1fs' % (time.time()-t0), flush=True)
    if ref is None: ref = out  # stays on device
    else:
        mm = int(jax.jit(lambda a, b: (a != b).sum())(out, ref))  # scalar fetch only
        if mm: print(f'  !! MISMATCH {mm}', flush=True)
    t0=time.time()
    for _ in range(n): fn().block_until_ready()
    dt=(time.time()-t0)/n
    print(f'chunk={sc:2d} tw={tw:3d} guard={int(gu)}: {dt*1e3:6.1f} ms  {94/dt:6.0f} g/s', flush=True)
for sc, tw, gu in [(16,128,False),(16,128,True),(32,128,False),(16,256,False),(8,128,False)]:
    run(sc, tw, gu)
print('DONE', flush=True)
