"""Same-process A/B: fused linear/+ root division (one fdiv with
where-selected operands) vs the previous two-division form, in exact
mode, on the dense CJK atlas and the v2 headline kernel.  Per used
lane the operands are identical, so parity must be 0 px; the question
is timing only (exact-mode fdiv is ~30 VPU ops, so eliding one of
three per (segment, row) should trim phase A by up to ~1/3)."""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

from benchmarks.cjk import UPEM, _chained_timer, make_batch  # noqa: E402
from benchmarks.harness import setup_cache  # noqa: E402

setup_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import fontrx.kernels.winding_dense as wd  # noqa: E402
import fontrx.kernels.winding_pallas_v2 as v2  # noqa: E402
from fontrx.pack.segments import xsort_segments  # noqa: E402

FUSED = v2.phase_a_roots_params


def phase_a_unfused(p0x, p0y, p1x, p1y, p2x, p2y, cy, fdiv, fsqrt):
    """The pre-fusion program: separate t_lin / t_pos divisions."""
    a = p0y - 2 * p1y + p2y
    ax = p0x - 2 * p1x + p2x
    bx = 2 * (p1x - p0x)
    lin = a == 0
    denom = p2y - p0y
    py01 = p0y - p1y

    delta = cy * a + p1y * p1y - p0y * p2y
    has = jnp.logical_not(lin) & (delta >= 0)
    sq = fsqrt(jnp.maximum(delta, 0.0))

    t_lin = fdiv(cy - p0y, denom)
    t_pos = fdiv(py01 + sq, a)
    t_neg = fdiv(py01 - sq, a)

    t0 = jnp.where(lin, t_lin, t_pos)
    v0_base = (lin & (denom != 0)) | (jnp.logical_not(lin) & has)
    v0 = v0_base & (t0 >= 0) & (t0 < 1)
    t1 = t_neg
    v1 = has & (t1 >= 0) & (t1 < 1)

    xx0 = (ax * t0 + bx) * t0 + p0x
    xx1 = (ax * t1 + bx) * t1 + p0x
    dy0 = a * t0 + (p1y - p0y)
    sgn_lin = jnp.where(p0y < p2y, -1, 1)
    s0 = jnp.where(
        v0,
        jnp.where(lin, sgn_lin, jnp.where(dy0 > 0, -1, 1)),
        0,
    ).astype(jnp.int32)
    dy1 = a * t1 + (p1y - p0y)
    s1 = jnp.where(v1, jnp.where(dy1 > 0, -1, 1), 0).astype(jnp.int32)
    neg_inf = jnp.float32(-jnp.inf)
    xx0m = jnp.where(s0 != 0, xx0, neg_inf)
    xx1m = jnp.where(s1 != 0, xx1, neg_inf)
    return xx0m, xx1m, s0, s1


def wire(fused: bool):
    f = FUSED if fused else phase_a_unfused
    v2.phase_a_roots_params = f   # phase_a_roots resolves this global
    wd.phase_a_roots_params = f   # direct calls in the dense kernel


# --- dense CJK atlas (1000 x 288 segs @64px, exact, lane-packed) -----
B, NSEG = 1000, 288
segs = make_batch(B, NSEG)
d_x = jnp.asarray(np.stack([xsort_segments(s) for s in segs]))
size = 64
scale = np.float32(size / UPEM)
d_my = jnp.asarray(np.full(B, size - 1, np.int32))
d_var = jnp.stack([jnp.full(B, i, jnp.int32) for i in range(4)])


def dense_fn(mx):
    return wd.winding_dense_batch.__wrapped__(
        d_x, mx, d_my, jnp.float32(scale), height=size, width=size,
        exact=True, seg_chunk=64, x_cull=True, lane_pack=2)


r = {}
arms = {}
for name, fused in (("unfused", False), ("fused", True)):
    wire(fused)
    f = jax.jit(dense_fn)
    arms[name] = (f, np.asarray(f(d_var[0])))
r["parity_px"] = int((arms["unfused"][1] != arms["fused"][1]).sum())
times = {"unfused": [], "fused": []}
for _ in range(3):
    for name in ("unfused", "fused"):
        t = _chained_timer(arms[name][0], d_var, n_iter=12, repeats=2)
        times[name].append(round(t * 1e3, 2))
r["dense_unfused_ms"] = min(times["unfused"])
r["dense_fused_ms"] = min(times["fused"])
r["dense_all"] = times
print("DENSE " + json.dumps(r), flush=True)

# --- headline: 94-glyph ASCII @256px, production gg16 config ---------
from benchmarks.harness import DEJAVU  # noqa: E402
from fontrx.engine.atlas import pack_charset  # noqa: E402
from fontrx.font.font import Font  # noqa: E402
from fontrx.kernels.grid import RasterGrid  # noqa: E402

font = Font.open(DEJAVU)
batch = pack_charset(font, list(range(33, 127)))
grids = [
    RasterGrid.fixed_tile(tuple(box), 256, font.info.units_per_em, 256)
    for box in np.asarray(batch.boxes)
]
d_s = jnp.asarray(batch.segments)
d_mx = jnp.asarray(np.array([g.min_x for g in grids], np.int32))
d_my2 = jnp.asarray(np.array([g.max_y for g in grids], np.int32))
scale2 = np.float32(grids[0].scale)
mxv = jnp.stack([d_mx + i for i in range(4)])


def v2_fn(mx):
    return v2.winding_pallas_v2_batch.__wrapped__(
        d_s, mx, d_my2, jnp.float32(scale2), height=256, width=256,
        exact=True, seg_chunk=32, tile_w=256, guard=True,
        group_guard=16)


h = {}
arms2 = {}
for name, fused in (("unfused", False), ("fused", True)):
    wire(fused)
    f = jax.jit(v2_fn)
    arms2[name] = (f, np.asarray(f(mxv[0])))
h["parity_px"] = int((arms2["unfused"][1] != arms2["fused"][1]).sum())
times = {"unfused": [], "fused": []}
for _ in range(3):
    for name in ("unfused", "fused"):
        t = _chained_timer(arms2[name][0], mxv, n_iter=15, repeats=2)
        times[name].append(round(t * 1e3, 3))
h["v2_unfused_ms"] = min(times["unfused"])
h["v2_fused_ms"] = min(times["fused"])
h["v2_all"] = times
print("HEADLINE " + json.dumps(h), flush=True)
print("DONE", flush=True)
