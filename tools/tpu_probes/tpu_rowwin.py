"""Probe: sub-strip row-window gating (`row_windows`) on the dense
CJK regime — VERDICT r2 item 1 (phase B measures ~3.6x above its
compare-op count; nothing sub-strip-granular attacks it).

For each variant: device bit-compare vs the shipped baseline, then
chained-unique-seed RTT-corrected timing (the docs/RESULTS.md
protocol).  Run: nohup python tools/tpu_probes/tpu_rowwin.py > log &
"""

import json
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")

from benchmarks.cjk import UPEM, _chained_timer, make_batch  # noqa: E402
from benchmarks.harness import setup_cache  # noqa: E402

setup_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fontrx.kernels.winding_pallas_v2 import winding_pallas_v2_batch  # noqa: E402

B, NSEG = 1000, 288
segs = make_batch(B, NSEG)
d_segs = jnp.asarray(segs)


def run(size):
    scale = np.float32(size / UPEM)
    d_my = jnp.asarray(np.full(B, size - 1, np.int32))
    d_var = jnp.stack([jnp.full(B, i, jnp.int32) for i in range(4)])

    def make(gd, sc, rw):
        def fn(mx):
            return winding_pallas_v2_batch(
                d_segs, mx, d_my, jnp.float32(scale), height=128, width=128,
                exact=True, guard=gd, seg_chunk=sc, row_windows=rw,
            )
        return fn

    base_fn = make(NSEG > 256, 32, 0)  # shipped cjk.py parameterization
    base = base_fn(d_var[0])
    variants = [
        ("base-gdT-sc32-rw0", NSEG > 256, 32, 0),
        ("gdF-sc64-rw0", False, 64, 0),
        ("gdF-sc64-rw8", False, 64, 8),
        ("gdF-sc64-rw16", False, 64, 16),
        ("gdF-sc32-rw8", False, 32, 8),
        ("gdF-sc32-rw16", False, 32, 16),
        ("gdT-sc32-rw8", True, 32, 8),
    ]
    for name, gd, sc, rw in variants:
        t0 = time.time()
        fn = make(gd, sc, rw)
        out = fn(d_var[1])
        mism = int(jnp.sum(out != base_fn(d_var[1])))
        compile_s = round(time.time() - t0, 1)
        dt = _chained_timer(fn, d_var, n_iter=12, repeats=4)
        print(json.dumps({
            "size": size, "variant": name, "ms": round(dt * 1e3, 2),
            "glyphs_per_s": round(B / dt), "mismatch": mism,
            "compile_s": compile_s,
        }), flush=True)


for size in (64, 32):
    run(size)
print("DONE", flush=True)
