import sys, time, itertools
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from fontrx.font.font import Font
from fontrx.kernels.grid import RasterGrid
from fontrx.kernels.winding_pallas_v2 import winding_pallas_v2_batch
from fontrx.engine.atlas import pack_charset
print('devices:', jax.devices(), flush=True)
f = Font.open('/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf')
batch = pack_charset(f, [c for c in range(33,127)])
grids = [RasterGrid.fixed_tile(tuple(b), 256, 2048, 256) for b in np.asarray(batch.boxes)]
mx = jnp.array([g.min_x for g in grids], jnp.int32); my = jnp.array([g.max_y for g in grids], jnp.int32)
segs = jnp.array(batch.segments); sc_ = jnp.float32(grids[0].scale)
ref = None
def run(sc, tw, gu, exact=True, n=20):
    global ref
    fn = lambda: winding_pallas_v2_batch(segs, mx, my, sc_, height=256, width=256,
                                          exact=exact, seg_chunk=sc, tile_w=tw, guard=gu)
    out = fn(); out.block_until_ready()
    if ref is None:
        ref = np.asarray(out)
    else:
        mm = int((np.asarray(out) != ref).sum())
        if mm: print(f'  !! chunk={sc} tw={tw} guard={gu}: {mm} MISMATCHES', flush=True)
    t0=time.time()
    for _ in range(n): fn().block_until_ready()
    dt=(time.time()-t0)/n
    print(f'chunk={sc:2d} tw={tw:3d} guard={int(gu)} exact={int(exact)}: {dt*1e3:6.1f} ms  {94/dt:6.0f} g/s', flush=True)
for sc, tw, gu in itertools.product((8,16,32),(128,256),(True,False)):
    run(sc, tw, gu)
print('DONE', flush=True)
