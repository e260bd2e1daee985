"""Probe: lane-packed dense kernel (chunk groups across row lanes)
vs the shipped lane_pack=1 path on the CJK atlas (288-seg x 1000
glyphs, 64px and 32px).  Device bit-exactness gate + chained timing."""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

from benchmarks.cjk import UPEM, _chained_timer, make_batch  # noqa: E402
from benchmarks.harness import setup_cache  # noqa: E402

setup_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fontrx.kernels.winding_dense import winding_dense_batch  # noqa: E402
from fontrx.pack.segments import xsort_segments  # noqa: E402

B, NSEG = 1000, 288
segs = make_batch(B, NSEG)
d_x = jnp.asarray(np.stack([xsort_segments(s) for s in segs]))


def run(size, packs):
    scale = np.float32(size / UPEM)
    d_my = jnp.asarray(np.full(B, size - 1, np.int32))
    d_var = jnp.stack([jnp.full(B, i, jnp.int32) for i in range(4)])

    def base_fn(mx):
        return winding_dense_batch(
            d_x, mx, d_my, jnp.float32(scale), height=size,
            width=size, exact=True, seg_chunk=64, col_block=8,
        )

    ref = base_fn(d_var[1])
    dt = _chained_timer(base_fn, d_var, n_iter=12, repeats=4)
    print(json.dumps({"size": size, "variant": "dense-lp1-sc64",
                      "ms": round(dt * 1e3, 2)}), flush=True)

    for lp, sc, cb in packs:
        def fn(mx, lp=lp, sc=sc, cb=cb):
            return winding_dense_batch(
                d_x, mx, d_my, jnp.float32(scale), height=size,
                width=size, exact=True, seg_chunk=sc, col_block=cb,
                lane_pack=lp,
            )
        out = fn(d_var[1])
        mism = int(jnp.sum(out[:, :size, :size] != ref[:, :size, :size]))
        dt = _chained_timer(fn, d_var, n_iter=12, repeats=4)
        print(json.dumps(
            {"size": size, "variant": f"dense-lp{lp}-sc{sc}-cb{cb}",
             "ms": round(dt * 1e3, 2), "mismatch": mism}), flush=True)


run(64, [(2, 64, 8), (2, 32, 8), (2, 64, 16)])
run(32, [(2, 64, 8), (4, 64, 8), (4, 32, 8)])
print("DONE", flush=True)
