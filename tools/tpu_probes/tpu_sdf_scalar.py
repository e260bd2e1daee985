"""Probe: scalar-segment flat SDF kernel vs the 3-D chunk kernel on
the CJK (288-seg) and DejaVu-density SDF atlases."""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

from benchmarks.cjk import UPEM, _chained_timer, make_batch  # noqa: E402
from benchmarks.harness import setup_cache  # noqa: E402

setup_cache()

import jax.numpy as jnp  # noqa: E402

from fontrx.kernels.sdf_pallas import sdf_pallas_batch  # noqa: E402

B = 1000
for nseg, sizes in ((288, (32, 64)), (64, (32,))):
    segs = make_batch(B, nseg)
    d_segs = jnp.asarray(segs)
    for size in sizes:
        scale = np.float32(size / UPEM)
        d_my = jnp.asarray(np.full(B, size - 1, np.int32))
        d_var = jnp.stack([jnp.full(B, i, jnp.int32) for i in range(4)])

        def fn(mx, scal=False, size=size, scale=scale, d_my=d_my):
            return sdf_pallas_batch(
                d_segs, mx, d_my, jnp.float32(scale), height=size,
                width=size, flat=True, scalar_segments=scal,
            )

        ref = fn(d_var[1], False)
        out = fn(d_var[1], True)
        dev = float(jnp.max(jnp.abs(out - ref)))
        dt0 = _chained_timer(lambda mx: fn(mx, False), d_var,
                             n_iter=6, repeats=4)
        dt1 = _chained_timer(lambda mx: fn(mx, True), d_var,
                             n_iter=6, repeats=4)
        print(json.dumps({
            "nseg": nseg, "size": size,
            "chunk3d_ms": round(dt0 * 1e3, 2),
            "scalar_ms": round(dt1 * 1e3, 2),
            "max_dev_px": round(dev, 6),
        }), flush=True)
print("DONE", flush=True)
