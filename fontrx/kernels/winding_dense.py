"""Column-major dense-regime winding kernel.

The row-major carry-sweep kernel (``winding_pallas_v2``) spends its
phase B on per-segment ``(R, 1)``-slice lane-broadcasts against column
vectors — measured ~5x above the op-count bound on dense (CJK) atlas
tiles even after sub-strip row windows.  This kernel flips the loop
structure for the single-strip, single-tile regime (tile sizes
<= 128 x 128, hundreds of segments — the CJK atlas shape):

- phase A is THE shared float program
  (``winding_pallas_v2.phase_a_roots``), unchanged;
- phase B iterates **columns** (true raster width — no padding to the
  128-lane tile, a 2x saving at 64px and 4x at 32px): per column a
  scalar ``cx`` compares against the whole ``(C, R)`` crossing tensor
  — full-lane VPU ops with **zero broadcasts or transposes** — and a
  sublane reduction accumulates the column's ``(1, R)`` winding;
- per-chunk **x-window culling**: a column left of every live
  crossing takes the precomputed full-chunk row total (all compares
  true), a column right of all of them adds nothing (all compares
  false) — both exact by monotonicity of ``cx`` in the column index,
  so only columns inside the chunk's crossing x-window pay per-column
  compares.  Pack segments x-sorted (``xsort_segments``) to make
  chunk x-windows narrow; like the y-sort, reordering is free because
  integer winding sums commute.

The output is computed transposed — ``(B, W, R)``, rows on lanes —
and swapped to ``(B, R, W)`` outside the kernel (an exact int32
relayout).  Per (segment, pixel) the float compare ``xx >= cx`` uses
bit-identical values to the row-major kernel (same ``phase_a_roots``
xx, same ``cx = (min_x + c + ox) / scale``), so rasters are
BIT-IDENTICAL to ``winding_pallas_v2_batch`` and to the CPU oracle.

Reference semantics anchor: ``/root/reference/src/tools/
render_glyph.zig:35-73`` (the analytic winding oracle).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fontrx.kernels.exactmath import div_cr, sqrt_cr
from fontrx.kernels.winding_pallas import segments_to_soa
from fontrx.kernels.winding_pallas_v2 import (
    _pad_lanes,
    _round_up,
    phase_a_roots,
    phase_a_roots_params,
)

STRIP_ROWS = 128


def dense_tuning(height: int) -> tuple[int, int]:
    """Measured (lane_pack, seg_chunk) for a tile height
    (tpu_dense_lanepack.py: @64px lp2/sc64 8.2 -> 5.5 ms, @32px
    lp4/sc32 6.6 -> 3.3 ms, both 0 mismatches on device)."""
    if height <= 32:
        return 4, 32
    if height <= 64:
        return 2, 64
    return 1, 64


def dense_win_tuning(height: int) -> tuple[int, int, int]:
    """Measured (win_rows, groups, seg_chunk) for the window-packed
    dense kernel (tpu_dense_windows_ab.py interleaved A/Bs, min-of-6
    chained, all bit-identical: CJK 1000x288 @32px 3.92 -> 2.40 ms
    with 16-row windows x 8 lane groups, @64px 5.70 -> 4.82 with
    32-row windows x 4 groups; 16-row windows at 64px LOSE — 6.7 ms —
    the duplication outgrows the row cull)."""
    if height <= 32:
        return 16, 8, 32
    if height <= 64:
        return 32, 4, 64
    return 128, 1, 64


def _make_dense_kernel(
    exact: bool,
    width: int,
    seg_chunk: int,
    col_block: int,
    x_cull: bool,
    row_bands: int = 1,
    lane_pack: int = 1,
):
    fdiv = div_cr if exact else (lambda a, b: a / b)
    fsqrt = sqrt_cr if exact else jnp.sqrt

    def kernel(min_x_ref, max_y_ref, scale_ref, off_ref, seg_ref, out_ref):
        b = pl.program_id(0)
        strip = pl.program_id(1)
        s_sup = pl.program_id(2)
        scale = scale_ref[0, 0]
        ox = off_ref[0, 0]
        oy = off_ref[0, 1]
        lane = jax.lax.rem(b, 128)

        s_cap = seg_ref.shape[1]
        n_chunks = s_cap // seg_chunk

        row = jax.lax.broadcasted_iota(jnp.int32, (1, STRIP_ROWS), 1)
        if lane_pack > 1:
            # every lane group sees the same real rows [0, R_real);
            # the row VALUES (and hence cy, the whole float program)
            # match the unpacked kernel's rows exactly
            row = jax.lax.rem(row, STRIP_ROWS // lane_pack)
        if row_bands == 1:
            min_x = min_x_ref[0, lane]
            max_y = max_y_ref[0, lane]
            cy = fdiv(
                (max_y - (strip * STRIP_ROWS + row)).astype(jnp.float32)
                + oy,
                scale,
            )
            # per-column em x — the same float program as the row-major
            # kernel's cx ((min_x + t*tile_w + col) + ox) / scale
            cx = [
                fdiv((min_x + c).astype(jnp.float32) + ox, scale)
                for c in range(width)
            ]
            band_f = None
        else:
            # banded: band k owns rows [k*band_h, (k+1)*band_h) with
            # its OWN anchors — every lane of the strip is a real
            # pixel row (the small-tile occupancy fix; same per-row
            # float program as the per-glyph kernel, like the banded
            # row-major kernel)
            band_h = STRIP_ROWS // row_bands
            band = row // band_h                     # (1, R)
            row_in = row - band * band_h
            myv = jnp.zeros((1, STRIP_ROWS), jnp.int32)
            mxv = jnp.zeros((1, STRIP_ROWS), jnp.int32)
            for k in range(row_bands):
                myv = jnp.where(band == k, max_y_ref[k, lane], myv)
                mxv = jnp.where(band == k, min_x_ref[k, lane], mxv)
            cy = fdiv((myv - row_in).astype(jnp.float32) + oy, scale)
            # per-column em x is a per-ROW-LANE vector (each band has
            # its own min_x); compares broadcast it over sublanes
            cx = [
                fdiv((mxv + c).astype(jnp.float32) + ox, scale)
                for c in range(width)
            ]
            band_f = band.astype(jnp.float32)
        # strip y-range for the hull cull (monotone when unbanded, so
        # max/min equal the first/last lanes exactly)
        cy_hi = jnp.max(cy)
        cy_lo = jnp.min(cy)

        @pl.when(s_sup == 0)
        def _():
            out_ref[0] = jnp.zeros((width, STRIP_ROWS), jnp.int32)

        if lane_pack > 1:
            # lane groups: group g of the 128 lanes solves segment
            # chunk (c*lane_pack + g) against the SAME real rows
            # [0, R_real) — full lane occupancy for tiles whose height
            # is <= 128/lane_pack.  Unlike glyph banding (a measured
            # negative — owner masks, per-lane anchors), every lane
            # group shares the glyph, its anchors, and its columns, so
            # phase A and phase B element counts genuinely shrink by
            # lane_pack; the output is folded across lane groups
            # outside the kernel (integer winding adds commute).
            grp = (
                jax.lax.broadcasted_iota(jnp.int32, (1, STRIP_ROWS), 1)
                // (STRIP_ROWS // lane_pack)
            )                                            # (1, R)

        def chunk_body(c, _):
            if lane_pack == 1:
                chunks = [seg_ref[0, pl.ds(c * seg_chunk, seg_chunk), :]]
            else:
                chunks = [
                    seg_ref[
                        0,
                        pl.ds((c * lane_pack + g) * seg_chunk, seg_chunk),
                        :,
                    ]
                    for g in range(lane_pack)
                ]
            hull_min = functools.reduce(jnp.minimum, [
                jnp.min(jnp.minimum(jnp.minimum(ch[:, 1:2], ch[:, 3:4]),
                                    ch[:, 5:6]))
                for ch in chunks
            ])
            hull_max = functools.reduce(jnp.maximum, [
                jnp.max(jnp.maximum(jnp.maximum(ch[:, 1:2], ch[:, 3:4]),
                                    ch[:, 5:6]))
                for ch in chunks
            ])
            chunk = chunks[0]

            @pl.when((hull_max + 1.0 >= cy_lo) & (hull_min - 1.0 <= cy_hi))
            def _():
                if lane_pack == 1:
                    xx0m, xx1m, s0, s1 = phase_a_roots(
                        chunk, cy, fdiv, fsqrt)
                else:
                    params = []
                    for k in range(6):
                        p = chunks[0][:, k : k + 1]
                        for g in range(1, lane_pack):
                            p = jnp.where(
                                grp == g, chunks[g][:, k : k + 1], p)
                        params.append(p)
                    xx0m, xx1m, s0, s1 = phase_a_roots_params(
                        *params, cy, fdiv, fsqrt)
                if row_bands > 1:
                    # a segment exists only on its owner band's rows;
                    # foreign rows contribute integer zeros (banded
                    # row-major kernel's exactness argument)
                    owner_ok = chunk[:, 6:7] == band_f      # (C, R)
                    s0 = jnp.where(owner_ok, s0, 0)
                    s1 = jnp.where(owner_ok, s1, 0)
                    neg_inf = jnp.float32(-jnp.inf)
                    xx0m = jnp.where(s0 != 0, xx0m, neg_inf)
                    xx1m = jnp.where(s1 != 0, xx1m, neg_inf)
                # full-chunk row totals: what a column left of every
                # live crossing accumulates (every compare true; dead
                # slots carry sign 0)
                tot = jnp.sum(s0 + s1, axis=0, keepdims=True)   # (1, R)
                if x_cull:
                    pos_inf = jnp.float32(jnp.inf)
                    max_xx = jnp.maximum(jnp.max(xx0m), jnp.max(xx1m))
                    xx0p = jnp.where(s0 != 0, xx0m, pos_inf)
                    xx1p = jnp.where(s1 != 0, xx1m, pos_inf)
                    min_xx = jnp.minimum(jnp.min(xx0p), jnp.min(xx1p))

                for cb in range(width // col_block):
                    c0 = cb * col_block
                    # block edges for the x-window tests; with bands
                    # cx entries are per-lane vectors, so take the
                    # conservative extremes over lanes (scalars reduce
                    # to themselves)
                    cx_first = jnp.min(cx[c0])           # smallest in block
                    cx_last = jnp.max(cx[c0 + col_block - 1])

                    def detail(c0=c0):
                        blk = out_ref[0, pl.ds(c0, col_block), :]
                        cols = []
                        for k in range(col_block):
                            cxc = cx[c0 + k]
                            v = jnp.sum(
                                jnp.where(xx0m >= cxc, s0, 0)
                                + jnp.where(xx1m >= cxc, s1, 0),
                                axis=0, keepdims=True,
                            )                              # (1, R)
                            cols.append(v)
                        out_ref[0, pl.ds(c0, col_block), :] = (
                            blk + jnp.concatenate(cols, axis=0)
                        )

                    if not x_cull:
                        detail()
                    else:
                        # whole block left of every live crossing:
                        # every compare true -> add the row totals
                        @pl.when(cx_last <= min_xx)
                        def _(c0=c0):
                            blk = out_ref[0, pl.ds(c0, col_block), :]
                            out_ref[0, pl.ds(c0, col_block), :] = (
                                blk + jnp.broadcast_to(
                                    tot, (col_block, STRIP_ROWS))
                            )

                        # block straddles the crossing x-window:
                        # per-column compares (exactly complementary
                        # to the branch above; a block right of every
                        # crossing adds nothing)
                        @pl.when(
                            jnp.logical_not(cx_last <= min_xx)
                            & (cx_first <= max_xx)
                        )
                        def _(c0=c0):
                            detail(c0)

            return 0

        jax.lax.fori_loop(0, n_chunks // lane_pack, chunk_body, 0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "height", "width", "interpret", "exact", "seg_chunk",
        "col_block", "x_cull", "lane_pack",
    ),
)
def winding_dense_batch(
    segments, min_x, max_y, scale, *, height, width, interpret=False,
    sample_offset=(0.0, 0.0), exact=False, seg_chunk=64,
    col_block=8, x_cull=True, lane_pack=1,
):
    """Batched winding maps, column-major kernel.

    ``width`` <= 256 (mult of ``col_block``); ``height`` any (padded
    to 128-row strips; the grid adds a strip dimension and the hull
    y-cull works per strip).  Returns int32 ``[B, ph, width]`` with
    ``ph = ceil(height/128)*128`` (callers slice) — bit-identical to
    ``winding_pallas_v2_batch`` at the same anchors over the shared
    columns.

    ``lane_pack`` (1, 2 or 4; requires ``height <= 128/lane_pack``):
    pack that many consecutive segment chunks into 128/lane_pack-lane
    row groups, so small tiles use every lane (2x fewer phase-A/B
    element ops at 64px, 4x at 32px).  Rows are bit-identical to
    ``lane_pack=1``: each (segment, row) element runs the same float
    program, and the cross-group fold is an integer winding add.
    """
    b = segments.shape[0]
    ph = _round_up(max(height, 1), STRIP_ROWS)
    n_strips = ph // STRIP_ROWS
    assert width <= 256 and width % col_block == 0, (width, col_block)
    if lane_pack > 1:
        assert lane_pack in (2, 4) and height <= STRIP_ROWS // lane_pack, (
            lane_pack, height)
        assert n_strips == 1
    soa = segments_to_soa(segments, chunk=seg_chunk)
    s8 = soa.shape[1]
    if lane_pack > 1 and s8 % (seg_chunk * lane_pack):
        pad = seg_chunk * lane_pack - (s8 % (seg_chunk * lane_pack))
        soa = jnp.pad(soa, ((0, 0), (0, pad), (0, 0)))
        s8 = soa.shape[1]

    b128 = _round_up(b, 128)
    min_x = _pad_lanes(
        jnp.asarray(min_x).reshape(1, b).astype(jnp.int32), b128)
    max_y = _pad_lanes(
        jnp.asarray(max_y).reshape(1, b).astype(jnp.int32), b128)
    scale_arr = jnp.full((1, 1), scale, jnp.float32)
    off_arr = jnp.asarray(sample_offset, jnp.float32).reshape(1, 2)

    seg_super = min(s8, 4096)
    if s8 % seg_super:
        pad = seg_super - (s8 % seg_super)
        soa = jnp.pad(soa, ((0, 0), (0, pad), (0, 0)))
        s8 = soa.shape[1]
    n_super = s8 // seg_super

    grid = (b, n_strips, n_super)
    out_t = pl.pallas_call(
        _make_dense_kernel(exact, width, seg_chunk, col_block, x_cull,
                           lane_pack=lane_pack),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 128), lambda b_, st, s: (0, b_ // 128),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 128), lambda b_, st, s: (0, b_ // 128),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, seg_super, 8), lambda b_, st, s: (b_, s, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, width, STRIP_ROWS), lambda b_, st, s: (b_, 0, st),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, width, ph), jnp.int32),
        interpret=interpret,
    )(min_x, max_y, scale_arr, off_arr, soa)
    if lane_pack > 1:
        # fold lane groups: group g's lanes hold chunk-group-g's
        # winding contribution for rows [0, R_real) — an integer sum
        # over groups (winding adds commute, so this is exact), then
        # zero-pad rows back to the 128-row contract
        r_real = STRIP_ROWS // lane_pack
        folded = jnp.sum(
            out_t.reshape(b, width, lane_pack, r_real), axis=2)
        out_t = jnp.pad(
            folded, ((0, 0), (0, 0), (0, STRIP_ROWS - r_real)))
    # exact int32 relayout: (B, W, PH) -> (B, PH, W)
    return jnp.swapaxes(out_t, 1, 2)


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "row_bands", "interpret", "exact", "seg_chunk",
        "col_block", "x_cull",
    ),
)
def winding_dense_banded_batch(
    segments, owners, min_x, max_y, scale, *, width, row_bands,
    interpret=False, sample_offset=(0.0, 0.0), exact=False,
    seg_chunk=64, col_block=8, x_cull=True,
):
    """Banded column-major winding: ``row_bands`` glyphs share each
    128-row-lane strip, each owning a ``128/row_bands``-lane band with
    its own anchors — so at 64px tiles every lane computes a real
    pixel row (2x the single-band occupancy; 4x at 32px), the
    small-tile occupancy twin of ``winding_pallas_banded_batch``.

    - ``segments``: float32 ``[B, S, 3, 2]`` — each element holds all
      of its bands' glyphs' segments (any order; x-sorted recommended
      for the x-window culls — winding sums commute);
    - ``owners``: int ``[B, S]`` — owning band per segment;
    - ``min_x``/``max_y``: int32 ``[row_bands, B]`` per-band anchors.

    Returns int32 ``[B, 128, width]``; band k of element b is rows
    ``[k*128/row_bands, (k+1)*128/row_bands)`` — bit-identical to the
    per-glyph kernels at the same anchors (foreign-band segments
    contribute integer zeros via the owner mask).
    """
    b = segments.shape[0]
    assert STRIP_ROWS % row_bands == 0, row_bands
    assert width <= 128 and width % col_block == 0, (width, col_block)
    soa = segments_to_soa(segments, chunk=seg_chunk)
    soa = soa.at[:, : owners.shape[1], 6].set(owners.astype(jnp.float32))
    s8 = soa.shape[1]

    b128 = _round_up(b, 128)
    min_x = _pad_lanes(
        jnp.asarray(min_x).reshape(row_bands, b).astype(jnp.int32), b128)
    max_y = _pad_lanes(
        jnp.asarray(max_y).reshape(row_bands, b).astype(jnp.int32), b128)
    scale_arr = jnp.full((1, 1), scale, jnp.float32)
    off_arr = jnp.asarray(sample_offset, jnp.float32).reshape(1, 2)

    seg_super = min(s8, 4096)
    if s8 % seg_super:
        pad = seg_super - (s8 % seg_super)
        soa = jnp.pad(soa, ((0, 0), (0, pad), (0, 0)))
        s8 = soa.shape[1]
    n_super = s8 // seg_super

    grid = (b, 1, n_super)
    out_t = pl.pallas_call(
        _make_dense_kernel(exact, width, seg_chunk, col_block, x_cull,
                           row_bands=row_bands),
        grid=grid,
        in_specs=[
            pl.BlockSpec((row_bands, 128),
                         lambda b_, st, s: (0, b_ // 128),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((row_bands, 128),
                         lambda b_, st, s: (0, b_ // 128),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, seg_super, 8), lambda b_, st, s: (b_, s, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, width, STRIP_ROWS), lambda b_, st, s: (b_, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, width, STRIP_ROWS), jnp.int32),
        interpret=interpret,
    )(min_x, max_y, scale_arr, off_arr, soa)
    return jnp.swapaxes(out_t, 1, 2)


# ---------------------------------------------------------------------------
# Window-packed dense kernel: per-chunk ROW culling via 16-row windows
#
# The lane-packed kernel still evaluates phase A for every (segment,
# real-row) pair.  Y-sorted dense glyphs concentrate each segment's
# influence into a narrow row band, so most of those evaluations
# produce dead crossings.  The window packing assigns every segment to
# the ``win_rows``-row window(s) its control hull (with the same +-1
# font-unit guard band the v2 strip cull uses, plus a sample-offset
# margin) can touch; the kernel then runs ``groups`` window-chunks per
# 128-lane op, each chunk seeing ONLY its window's rows.
#
# Exactness: a Bezier's y-range is inside its control hull's, so a
# crossing can only exist on rows whose em-y lies in the hull range —
# rows outside every assigned window provably contribute zero, and a
# segment duplicated into several windows never double-counts because
# each copy accumulates only its own window's rows (rows partition).
# Per (segment, row) the float program is phase_a_roots verbatim with
# identical cy/cx values, so rasters are BIT-IDENTICAL to
# winding_dense_batch and the CPU oracle.


def pack_dense_windows(
    segments,
    min_x,
    max_y,
    scale: float,
    height: int,
    *,
    win_rows: int = 16,
    seg_chunk: int = 16,
    groups: int = 8,
    sample_margin: float = 1.0,
):
    """Host-side window assignment: ``[B, S, 3, 2]`` segments ->
    ``([B, n_windows*cap, 3, 2]`` window-major stream, ``n_windows``,
    ``cap)``.  Window ``w`` owns pixel rows ``[w*win_rows,
    (w+1)*win_rows)``; each window's sublist is x-sorted (the dense
    kernel's x-window cull wants x-coherent chunks; winding sums
    commute so any order is bit-exact).  ``cap`` is the max per-window
    count rounded up to ``groups * seg_chunk`` (the kernel's lane
    quantum); dead slots are zero segments (provably zero crossings).

    ``sample_margin`` widens the row range by that many pixels on each
    side so one packing serves every MSAA sample offset in [-1, 1].
    """
    seg = np.asarray(segments, np.float32)
    b, s = seg.shape[0], seg.shape[1]
    n_windows = max((height + win_rows - 1) // win_rows, 1)
    max_y = np.asarray(max_y, np.float64).reshape(b)
    ys = seg[:, :, :, 1].astype(np.float64)
    lo = ys.min(axis=2) - 1.0                     # [B, S] hull - guard
    hi = ys.max(axis=2) + 1.0
    # rows r with cy(r) = (max_y - r + oy)/scale inside [lo, hi]
    r_lo = np.floor(max_y[:, None] - scale * hi) - sample_margin
    r_hi = np.ceil(max_y[:, None] - scale * lo) + sample_margin
    w_lo = np.clip(r_lo // win_rows, 0, n_windows - 1).astype(np.int64)
    w_hi = np.clip(r_hi // win_rows, 0, n_windows - 1).astype(np.int64)
    # dead (all-zero) segments contribute nothing anywhere: assign none
    dead = (seg == 0.0).all(axis=(2, 3))
    xmid = seg[:, :, :, 0].min(axis=2) + seg[:, :, :, 0].max(axis=2)

    counts = np.zeros((b, n_windows), np.int64)
    lists: list[list[np.ndarray]] = []
    for i in range(b):
        per_w = []
        for w in range(n_windows):
            m = (w_lo[i] <= w) & (w <= w_hi[i]) & ~dead[i]
            idx = np.nonzero(m)[0]
            idx = idx[np.argsort(xmid[i, idx], kind="stable")]
            per_w.append(idx)
            counts[i, w] = len(idx)
        lists.append(per_w)
    quantum = groups * seg_chunk
    cap = int(max(counts.max(), 1))
    cap = ((cap + quantum - 1) // quantum) * quantum
    out = np.zeros((b, n_windows * cap, 3, 2), np.float32)
    for i in range(b):
        for w in range(n_windows):
            idx = lists[i][w]
            out[i, w * cap : w * cap + len(idx)] = seg[i, idx]
    return out, n_windows, cap


def _make_dense_win_kernel(
    exact: bool,
    width: int,
    seg_chunk: int,
    col_block: int,
    x_cull: bool,
    groups: int,
    win_rows: int,
    n_windows: int,
    cap: int,
):
    fdiv = div_cr if exact else (lambda a, b: a / b)
    fsqrt = sqrt_cr if exact else jnp.sqrt

    assert groups * win_rows == 128, (groups, win_rows)

    def kernel(min_x_ref, max_y_ref, scale_ref, off_ref, seg_ref,
               out_ref):
        b = pl.program_id(0)
        scale = scale_ref[0, 0]
        ox = off_ref[0, 0]
        oy = off_ref[0, 1]
        lane = jax.lax.rem(b, 128)
        min_x = min_x_ref[0, lane]
        max_y = max_y_ref[0, lane]

        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        row_in = jax.lax.rem(lanes, win_rows)     # row within window
        grp = lanes // win_rows                   # lane group 0..groups-1

        # per-column em x — the same float program as every other
        # winding kernel's cx
        cx = [
            fdiv((min_x + c).astype(jnp.float32) + ox, scale)
            for c in range(width)
        ]

        out_ref[0] = jnp.zeros((n_windows, width, 128), jnp.int32)

        n_iters = cap // (groups * seg_chunk)
        for w in range(n_windows):
            # every lane group sees ITS chunk against the SAME window
            # rows; cy values match the full kernel's rows exactly
            cy = fdiv(
                (max_y - (w * win_rows + row_in)).astype(jnp.float32)
                + oy,
                scale,
            )

            def chunk_body(c, _, w=w, cy=cy):
                base = w * cap + c * (groups * seg_chunk)
                chunks = [
                    seg_ref[0, pl.ds(base + g * seg_chunk, seg_chunk), :]
                    for g in range(groups)
                ]
                params = []
                for k in range(6):
                    p = chunks[0][:, k : k + 1]
                    for g in range(1, groups):
                        p = jnp.where(grp == g, chunks[g][:, k : k + 1], p)
                    params.append(p)
                xx0m, xx1m, s0, s1 = phase_a_roots_params(
                    *params, cy, fdiv, fsqrt)
                tot = jnp.sum(s0 + s1, axis=0, keepdims=True)  # (1, 128)
                if x_cull:
                    pos_inf = jnp.float32(jnp.inf)
                    max_xx = jnp.maximum(jnp.max(xx0m), jnp.max(xx1m))
                    xx0p = jnp.where(s0 != 0, xx0m, pos_inf)
                    xx1p = jnp.where(s1 != 0, xx1m, pos_inf)
                    min_xx = jnp.minimum(jnp.min(xx0p), jnp.min(xx1p))

                for cb in range(width // col_block):
                    c0 = cb * col_block
                    cx_first = cx[c0]
                    cx_last = cx[c0 + col_block - 1]

                    def detail(c0=c0, w=w):
                        blk = out_ref[0, w, pl.ds(c0, col_block), :]
                        cols = []
                        for k in range(col_block):
                            cxc = cx[c0 + k]
                            v = jnp.sum(
                                jnp.where(xx0m >= cxc, s0, 0)
                                + jnp.where(xx1m >= cxc, s1, 0),
                                axis=0, keepdims=True,
                            )
                            cols.append(v)
                        out_ref[0, w, pl.ds(c0, col_block), :] = (
                            blk + jnp.concatenate(cols, axis=0)
                        )

                    if not x_cull:
                        detail()
                    else:
                        @pl.when(cx_last <= min_xx)
                        def _(c0=c0, w=w):
                            blk = out_ref[0, w, pl.ds(c0, col_block), :]
                            out_ref[0, w, pl.ds(c0, col_block), :] = (
                                blk + jnp.broadcast_to(
                                    tot, (col_block, 128))
                            )

                        @pl.when(
                            jnp.logical_not(cx_last <= min_xx)
                            & (cx_first <= max_xx)
                        )
                        def _(c0=c0, w=w):
                            detail(c0, w)

                return 0

            jax.lax.fori_loop(0, n_iters, chunk_body, 0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "height", "width", "n_windows", "cap", "interpret", "exact",
        "seg_chunk", "col_block", "x_cull", "groups", "win_rows",
    ),
)
def winding_dense_win_batch(
    segments_win, min_x, max_y, scale, *, height, width, n_windows,
    cap, interpret=False, sample_offset=(0.0, 0.0), exact=False,
    seg_chunk=16, col_block=8, x_cull=True, groups=8, win_rows=16,
):
    """Batched winding maps through the window-packed dense kernel.

    ``segments_win``/``n_windows``/``cap`` come from
    :func:`pack_dense_windows` (same ``win_rows``/``seg_chunk``/
    ``groups``).  Returns int32 ``[B, ph, width]`` with ``ph`` padded
    to the 128-row contract — bit-identical to
    :func:`winding_dense_batch` on the shared rows (same
    ``phase_a_roots`` float program per (segment, row); the
    cross-group/window fold is an integer winding add).
    """
    b = segments_win.shape[0]
    assert groups * win_rows == 128, (groups, win_rows)
    assert width <= 256 and width % col_block == 0, (width, col_block)
    assert cap % (groups * seg_chunk) == 0, (cap, groups, seg_chunk)
    soa = segments_to_soa(segments_win, chunk=seg_chunk)
    assert soa.shape[1] == n_windows * cap, (soa.shape, n_windows, cap)

    b128 = _round_up(b, 128)
    min_x = _pad_lanes(
        jnp.asarray(min_x).reshape(1, b).astype(jnp.int32), b128)
    max_y = _pad_lanes(
        jnp.asarray(max_y).reshape(1, b).astype(jnp.int32), b128)
    scale_arr = jnp.full((1, 1), scale, jnp.float32)
    off_arr = jnp.asarray(sample_offset, jnp.float32).reshape(1, 2)

    grid = (b,)
    out_t = pl.pallas_call(
        _make_dense_win_kernel(
            exact, width, seg_chunk, col_block, x_cull, groups,
            win_rows, n_windows, cap),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 128), lambda b_: (0, b_ // 128),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 128), lambda b_: (0, b_ // 128),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, n_windows * cap, 8), lambda b_: (b_, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, n_windows, width, 128), lambda b_: (b_, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, n_windows, width, 128), jnp.int32),
        interpret=interpret,
    )(min_x, max_y, scale_arr, off_arr, soa)
    # fold lane groups (integer winding adds commute), stitch windows
    # back into rows, pad to the 128-row contract
    folded = jnp.sum(
        out_t.reshape(b, n_windows, width, groups, win_rows), axis=3)
    rows = jnp.transpose(folded, (0, 2, 1, 3)).reshape(
        b, width, n_windows * win_rows)
    ph = _round_up(max(height, 1), STRIP_ROWS)
    if rows.shape[2] < ph:
        rows = jnp.pad(rows, ((0, 0), (0, 0), (0, ph - rows.shape[2])))
    else:
        rows = rows[:, :, :ph]
    return jnp.swapaxes(rows, 1, 2)
