"""Probe: exact-math (correctly-rounded div/sqrt) cost in the dense
kernel, which is now phase-A-bound — and the phase split."""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

from benchmarks.cjk import UPEM, _chained_timer, make_batch  # noqa: E402
from benchmarks.harness import setup_cache  # noqa: E402

setup_cache()

import jax.numpy as jnp  # noqa: E402

from fontrx.kernels.winding_dense import winding_dense_batch  # noqa: E402
from fontrx.pack.segments import xsort_segments  # noqa: E402

B, NSEG = 1000, 288
segs = make_batch(B, NSEG)
d_x = jnp.asarray(np.stack([xsort_segments(s) for s in segs]))
size = 64
scale = np.float32(size / UPEM)
d_my = jnp.asarray(np.full(B, size - 1, np.int32))
d_var = jnp.stack([jnp.full(B, i, jnp.int32) for i in range(4)])

r = {}
for name, ex, xc in (("exact_xcull", True, True),
                     ("inexact_xcull", False, True),
                     ("exact_nocull", True, False)):
    def fn(mx, ex=ex, xc=xc):
        return winding_dense_batch(
            d_x, mx, d_my, jnp.float32(scale), height=size, width=size,
            exact=ex, seg_chunk=64, x_cull=xc)
    fn(d_var[0])
    r[name + "_ms"] = round(
        _chained_timer(fn, d_var, n_iter=12, repeats=4) * 1e3, 2)
print(json.dumps(r), flush=True)
print("DONE", flush=True)
