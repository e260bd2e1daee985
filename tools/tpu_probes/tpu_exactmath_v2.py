"""Probe: reciprocal-based correctly-rounded div/sqrt (exactmath v2).

1. Op-level qualification on the real TPU (where hardware div/sqrt are
   only faithful): millions of random/integer/adversarial operands vs
   host NumPy IEEE.
2. A/B timing of the dense CJK atlas (phase-A/transcendental-bound):
   old scheme (div_cr wired in) vs new, exact vs hardware.
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

from benchmarks.cjk import UPEM, _chained_timer, make_batch  # noqa: E402
from benchmarks.harness import setup_cache  # noqa: E402

setup_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fontrx.kernels.exactmath import (  # noqa: E402
    div_cr_recip,
    div_cr,
    sqrt_cr_recip,
    sqrt_cr,
)

r = {}
rng = np.random.default_rng(7)
N = 4_000_000


def rand_f32(n, lo, hi):
    m = rng.random(n) + 1.0
    e = rng.integers(lo, hi, n).astype(np.float64)
    s = rng.choice([-1.0, 1.0], n)
    return (s * m * np.exp2(e)).astype(np.float32)


# --- correctness on TPU ------------------------------------------------
jd = jax.jit(div_cr_recip)
jdr = jax.jit(div_cr)
js = jax.jit(sqrt_cr_recip)
jsr = jax.jit(sqrt_cr)

a = rand_f32(N, -40, 40)
b = rand_f32(N, -40, 40)
ieee = a / b
r["div_rand_new"] = int((np.asarray(jd(jnp.array(a), jnp.array(b))) != ieee).sum())
r["div_rand_ref"] = int((np.asarray(jdr(jnp.array(a), jnp.array(b))) != ieee).sum())

ai = rng.integers(-16384, 16384, N).astype(np.float32)
bi = np.where(
    rng.random(N) < 0.5,
    rng.integers(1, 16384, N),
    -rng.integers(1, 16384, N),
).astype(np.float32)
r["div_int_new"] = int(
    (np.asarray(jd(jnp.array(ai), jnp.array(bi))) != ai / bi).sum())

# adversarial: quotients within 0.5 ulp of halfway points
bq = rand_f32(N, -20, 20)
qt = rand_f32(N, -20, 20)
ulp = np.spacing(np.abs(qt)).astype(np.float64)
mid = qt.astype(np.float64) + 0.5 * ulp * rng.choice([-1.0, 1.0], N)
aa = (mid * bq.astype(np.float64)).astype(np.float32)
fin = np.isfinite(aa) & (aa != 0)
aa2, bq2 = aa[fin], bq[fin]
r["div_adv_new"] = int(
    (np.asarray(jd(jnp.array(aa2), jnp.array(bq2))) != aa2 / bq2).sum())
r["div_adv_n"] = int(fin.sum())

d = np.abs(rand_f32(N, -40, 40))
r["sqrt_rand_new"] = int((np.asarray(js(jnp.array(d))) != np.sqrt(d)).sum())
r["sqrt_rand_ref"] = int((np.asarray(jsr(jnp.array(d))) != np.sqrt(d)).sum())
# perfect squares and ulp-neighbors (winding delta shapes)
base = rng.integers(1, 46000, N).astype(np.float64)
sq = (base * base).astype(np.float32)
for off in (-1, 0, 1):
    dd = sq.copy()
    for _ in range(abs(off)):
        dd = np.nextafter(
            dd, np.float32(np.inf) if off > 0 else np.float32(0)
        ).astype(np.float32)
    r[f"sqrt_sq{off:+d}_new"] = int(
        (np.asarray(js(jnp.array(dd))) != np.sqrt(dd)).sum())

print("CORRECTNESS " + json.dumps(r), flush=True)

# --- dense-atlas A/B timing -------------------------------------------
from fontrx.kernels import winding_dense  # noqa: E402
from fontrx.kernels.winding_dense import winding_dense_batch  # noqa: E402
from fontrx.pack.segments import xsort_segments  # noqa: E402

B, NSEG = 1000, 288
segs = make_batch(B, NSEG)
d_x = jnp.asarray(np.stack([xsort_segments(s) for s in segs]))
size = 64
scale = np.float32(size / UPEM)
d_my = jnp.asarray(np.full(B, size - 1, np.int32))
d_var = jnp.stack([jnp.full(B, i, jnp.int32) for i in range(4)])

t = {}
for name, ex, lp, sc in (
    ("exact_lp2", True, 2, 64),
    ("hw_lp2", False, 2, 64),
):
    def fn(mx, ex=ex, lp=lp, sc=sc):
        return winding_dense_batch(
            d_x, mx, d_my, jnp.float32(scale), height=size, width=size,
            exact=ex, seg_chunk=sc, x_cull=True, lane_pack=lp)
    out_new = np.asarray(fn(d_var[0]))
    t[name + "_ms"] = round(
        _chained_timer(fn, d_var, n_iter=12, repeats=4) * 1e3, 2)
    if name == "exact_lp2":
        # parity vs the old scheme, wired in via monkeypatch
        import fontrx.kernels.winding_pallas_v2 as v2mod
        # wire the reciprocal scheme into the kernels for the parity arm
        winding_dense.div_cr, winding_dense.sqrt_cr = div_cr_recip, sqrt_cr_recip
        v2mod.div_cr, v2mod.sqrt_cr = div_cr_recip, sqrt_cr_recip
        def fn_ref(mx):
            return winding_dense_batch(
                d_x, mx, d_my, jnp.float32(scale), height=size, width=size,
                exact=True, seg_chunk=sc, x_cull=True, lane_pack=lp,
                interpret=False)
        # NB jit caches by static args only; force a distinct trace
        out_ref = np.asarray(
            winding_dense_batch.__wrapped__(
                d_x, d_var[0], d_my, jnp.float32(scale), height=size,
                width=size, exact=True, seg_chunk=sc, x_cull=True,
                lane_pack=lp, interpret=False))
        t["parity_mismatch_px"] = int((out_new != out_ref).sum())
        winding_dense.div_cr, winding_dense.sqrt_cr = div_cr, sqrt_cr
        v2mod.div_cr, v2mod.sqrt_cr = div_cr, sqrt_cr

print("TIMING " + json.dumps(t), flush=True)
print("DONE", flush=True)
