"""Probe: column-major dense kernel vs row-window v2 on the CJK
atlas (288-seg x 1000 glyphs, 64px and 32px)."""

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
from fontrx.kernels.winding_pallas_v2 import winding_pallas_v2_batch  # noqa: E402
from fontrx.pack.segments import xsort_segments  # noqa: E402

B, NSEG = 1000, 288
segs = make_batch(B, NSEG)
xsegs = np.stack([xsort_segments(s) for s in segs])
d_y = jnp.asarray(segs)      # y-sorted-ish (diamond build order)
d_x = jnp.asarray(xsegs)


def run(size):
    scale = np.float32(size / UPEM)
    d_my = jnp.asarray(np.full(B, size - 1, np.int32))
    d_var = jnp.stack([jnp.full(B, i, jnp.int32) for i in range(4)])

    def ref_fn(mx):
        return winding_pallas_v2_batch(
            d_y, mx, d_my, jnp.float32(scale), height=128, width=128,
            exact=True, guard=False, seg_chunk=64, row_windows=8,
        )

    ref = ref_fn(d_var[1])
    dt = _chained_timer(ref_fn, d_var, n_iter=12, repeats=4)
    print(json.dumps({"size": size, "variant": "v2-rw8",
                      "ms": round(dt * 1e3, 2)}), flush=True)

    for name, data, sc, cb, xc in [
        ("dense-x-sc64-cb8", d_x, 64, 8, True),
        ("dense-x-sc64-cb16", d_x, 64, 16, True),
        ("dense-x-sc32-cb8", d_x, 32, 8, True),
        ("dense-y-sc64-cb8", d_y, 64, 8, True),
        ("dense-x-sc64-nocull", d_x, 64, 8, False),
    ]:
        def fn(mx, data=data, sc=sc, cb=cb, xc=xc):
            return winding_dense_batch(
                data, mx, d_my, jnp.float32(scale), height=size,
                width=size, exact=True, seg_chunk=sc, col_block=cb,
                x_cull=xc,
            )
        out = fn(d_var[1])
        mism = int(jnp.sum(out[:, :, :size] != ref[:, :, :size]))
        dt = _chained_timer(fn, d_var, n_iter=12, repeats=4)
        print(json.dumps({"size": size, "variant": name,
                          "ms": round(dt * 1e3, 2), "mismatch": mism}),
              flush=True)


for size in (64, 32):
    run(size)
print("DONE", flush=True)
