import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from fontrx.kernels.winding_pallas_v2 import winding_pallas_v2_batch
print('devices:', jax.devices(), flush=True)
rng = np.random.default_rng(0)
segs = rng.integers(-50, 50, (2, 32, 3, 2)).astype(np.float32)
for gu in (False, True):
    t0=time.time()
    out = winding_pallas_v2_batch(jnp.array(segs), jnp.zeros(2, jnp.int32), jnp.full(2, 127, jnp.int32),
                                  jnp.float32(1.0), height=128, width=256, guard=gu, exact=True)
    out.block_until_ready()
    print('guard=%s compile+run %.1fs' % (gu, time.time()-t0), flush=True)
print('DONE', flush=True)
