"""Probe 2 for row windows: refine knobs, phase-A floor, and check
the OTHER regimes don't regress (headline 94@256px, tall-tile y-cull
workload, full-font cap-64 bucket)."""

import json
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")

from benchmarks.cjk import UPEM, _chained_timer, make_batch  # noqa: E402
from benchmarks.harness import DEJAVU, setup_cache  # noqa: E402

setup_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fontrx.kernels.winding_pallas_v2 import winding_pallas_v2_batch  # noqa: E402

B, NSEG = 1000, 288
segs = make_batch(B, NSEG)
d_segs = jnp.asarray(segs)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def cjk_variants():
    size = 64
    scale = np.float32(size / UPEM)
    d_my = jnp.asarray(np.full(B, size - 1, np.int32))
    d_var = jnp.stack([jnp.full(B, i, jnp.int32) for i in range(4)])

    base = None
    for name, gd, sc, rw, detail in [
        ("gdF-sc64-rw8", False, 64, 8, True),
        ("gdF-sc128-rw8", False, 128, 8, True),
        ("gdF-sc64-rw4", False, 64, 4, True),
        ("phaseA-sc64", False, 64, 0, False),
        ("phaseA-sc128", False, 128, 0, False),
    ]:
        def fn(mx, gd=gd, sc=sc, rw=rw, detail=detail):
            return winding_pallas_v2_batch(
                d_segs, mx, d_my, jnp.float32(scale), height=128,
                width=128, exact=True, guard=gd, seg_chunk=sc,
                row_windows=rw, _detail=detail,
            )
        mism = -1
        if detail:
            out = fn(d_var[1])
            if base is None:
                base = out
            mism = int(jnp.sum(out != base))
        dt = _chained_timer(fn, d_var, n_iter=12, repeats=4)
        emit(probe="cjk64", variant=name, ms=round(dt * 1e3, 2),
             mismatch=mism)


def tall_tile():
    """512px-tall y-cull workload: row windows must not regress the
    multi-strip case."""
    size = 512
    scale = np.float32(size / UPEM)
    rng = np.random.default_rng(11)
    from benchmarks.cjk import synthetic_strokes
    s8 = np.stack([synthetic_strokes(rng, 512) for _ in range(8)])
    d8 = jnp.asarray(s8)
    d_my = jnp.asarray(np.full(8, size - 1, np.int32))
    d_var = jnp.stack([jnp.full(8, i, jnp.int32) for i in range(4)])
    base = None
    for name, gd, rw in [("gdT-rw0", True, 0), ("gdT-rw8", True, 8),
                         ("gdF-rw8", False, 8)]:
        def fn(mx, gd=gd, rw=rw):
            return winding_pallas_v2_batch(
                d8, mx, d_my, jnp.float32(scale), height=size, width=128,
                exact=True, guard=gd, seg_chunk=32, row_windows=rw,
            )
        out = fn(d_var[1])
        if base is None:
            base = out
        mism = int(jnp.sum(out != base))
        dt = _chained_timer(fn, d_var, n_iter=12, repeats=4)
        emit(probe="tall512", variant=name, ms=round(dt * 1e3, 3),
             mismatch=mism)


def headline():
    """94 ASCII @256px — the headline batch must not regress; try the
    shipped params vs shipped+rw8 (bench.py's exact setup)."""
    from fontrx.engine.atlas import pack_charset
    from fontrx.font.font import Font
    from fontrx.kernels.grid import RasterGrid
    font = Font.open(DEJAVU)
    ascii_chars = "".join(chr(c) for c in range(0x21, 0x7F))
    batch = pack_charset(font, ascii_chars)
    grids = [
        RasterGrid.fixed_tile(tuple(box), 256.0,
                              font.info.units_per_em, 256)
        for box in np.asarray(batch.boxes)
    ]
    min_x = np.array([g.min_x for g in grids], np.int32)
    max_y = np.array([g.max_y for g in grids], np.int32)
    scale = np.float32(grids[0].scale)
    d_seg = jnp.asarray(batch.segments)
    d_mx = jnp.asarray(min_x)
    d_var = jnp.stack([jnp.asarray(max_y + i) for i in range(4)])
    base = None
    # NB group_guard takes precedence over row_windows in the kernel,
    # so the rw variant runs with gg=0
    for name, gg, rw in [("gg16-rw0", 16, 0), ("gg0-rw8", 0, 8),
                         ("gg0-rw16", 0, 16)]:
        def fn(my, gg=gg, rw=rw):
            return winding_pallas_v2_batch(
                d_seg, d_mx, my, jnp.float32(scale), height=256,
                width=256, exact=True, guard=True, seg_chunk=32,
                tile_w=256, group_guard=gg, row_windows=rw,
            )
        out = fn(d_var[0])
        if base is None:
            base = out
        mism = int(jnp.sum(out != base))
        dt = _chained_timer(fn, d_var, n_iter=24, repeats=4)
        emit(probe="headline256", variant=name, ms=round(dt * 1e3, 3),
             glyphs_per_s=round(94 / dt), mismatch=mism)


which = sys.argv[1:] or ["cjk", "tall", "headline"]
if "cjk" in which:
    cjk_variants()
if "tall" in which:
    tall_tile()
if "headline" in which:
    headline()
print("DONE", flush=True)
