"""Same-process A/B: old (divide-heavy) vs new (reciprocal) exactmath
wired into the dense kernel AND the v2 headline kernel, interleaved
repeats so tunnel weather hits both arms equally."""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

from benchmarks.cjk import UPEM, _chained_timer, make_batch  # noqa: E402
from benchmarks.harness import setup_cache  # noqa: E402

setup_cache()

import jax.numpy as jnp  # noqa: E402

import fontrx.kernels.winding_dense as wd  # noqa: E402
import fontrx.kernels.winding_pallas_v2 as v2  # noqa: E402
from fontrx.kernels.exactmath import (  # noqa: E402
    div_cr_recip, div_cr, sqrt_cr_recip, sqrt_cr)
from fontrx.pack.segments import xsort_segments  # noqa: E402

B, NSEG = 1000, 288
segs = make_batch(B, NSEG)
d_x = jnp.asarray(np.stack([xsort_segments(s) for s in segs]))
size = 64
scale = np.float32(size / UPEM)
d_my = jnp.asarray(np.full(B, size - 1, np.int32))
d_var = jnp.stack([jnp.full(B, i, jnp.int32) for i in range(4)])


def wire(new: bool):
    d = div_cr_recip if new else div_cr
    s = sqrt_cr_recip if new else sqrt_cr
    wd.div_cr, wd.sqrt_cr = d, s
    v2.div_cr, v2.sqrt_cr = d, s


def dense_fn(mx, *, interp=False):
    # bypass the jit cache (it would conflate the two wirings):
    # __wrapped__ retraces every call, so wrap per-arm jits below
    return wd.winding_dense_batch.__wrapped__(
        d_x, mx, d_my, jnp.float32(scale), height=size, width=size,
        exact=True, seg_chunk=64, x_cull=True, lane_pack=2,
        interpret=interp)


import jax  # noqa: E402

r = {}
arms = {}
for name, new in (("ref", False), ("new", True)):
    wire(new)
    f = jax.jit(dense_fn)
    out = np.asarray(f(d_var[0]))
    arms[name] = (f, out)
r["parity_px"] = int((arms["ref"][1] != arms["new"][1]).sum())

# interleaved timing: 3 rounds each arm, alternating
times = {"ref": [], "new": []}
for _ in range(3):
    for name in ("ref", "new"):
        wire(name == "new")
        t = _chained_timer(arms[name][0], d_var, n_iter=12, repeats=2)
        times[name].append(t * 1e3)
r["dense_ref_ms"] = round(min(times["ref"]), 2)
r["dense_new_ms"] = round(min(times["new"]), 2)
r["dense_ref_all"] = [round(t, 2) for t in times["ref"]]
r["dense_new_all"] = [round(t, 2) for t in times["new"]]
print("DENSE " + json.dumps(r), flush=True)

# headline: 94-glyph ASCII @256px through the v2 kernel
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
have = True
if have:
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
    for name, new in (("ref", False), ("new", True)):
        wire(new)
        f = jax.jit(v2_fn)
        out = np.asarray(f(mxv[0]))
        arms2[name] = (f, out)
    h["parity_px"] = int((arms2["ref"][1] != arms2["new"][1]).sum())
    times = {"ref": [], "new": []}
    for _ in range(3):
        for name in ("ref", "new"):
            t = _chained_timer(arms2[name][0], mxv, n_iter=15, repeats=2)
            times[name].append(t * 1e3)
    h["v2_ref_ms"] = round(min(times["ref"]), 3)
    h["v2_new_ms"] = round(min(times["new"]), 3)
    print("HEADLINE " + json.dumps(h), flush=True)
print("DONE", flush=True)
