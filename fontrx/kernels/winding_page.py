"""Deferred-carry page winding kernel — the wide-raster (multi
column-tile) specialization of the carry sweep.

The v2 kernel's guard mode pays, per (segment chunk, column tile):
a ``(C, R)`` in-tile classification, an ``any_in`` branch, and a full
``(STRIP_ROWS, tile_w)`` read-modify-write to apply the running carry
— for EVERY tile, even the ~28 of 30 a page chunk's ink never touches
(text ink is x-local; measured 94-206 ms for the 4K stress page).

This kernel restructures the sweep with two exact observations:

1. **X-hull windows**: a quadratic's crossings lie within its control
   hull's x-range, so a chunk only needs classification/detail work in
   the column tiles its hull overlaps (plus one virtual "right of the
   raster" bucket) — the page twin of the dense kernel's x-window
   cull.
2. **Deferred carries**: a crossing in tile ``t`` adds its sign to
   every pixel of tiles ``t' < t``.  Instead of folding that into a
   per-(chunk, tile) base applied with a full-tile RMW, each chunk
   deposits per-tile row sums into a ``(n_tiles+1, 128)`` VMEM bucket
   scratch (a ``(1, R)`` RMW, 128x less traffic), and ONE
   right-to-left suffix-sum flush per strip broadcasts the accumulated
   carries into the output after the whole segment stream has run.

Winding is an order-independent integer sum, so regrouping the carry
additions is bit-exact; detail compares use the shared
``phase_a_roots`` float program and the same per-column ``cx`` values,
so rasters are BIT-IDENTICAL to ``winding_pallas_v2_batch`` (pinned in
the exhaustive gate and device A/Bs).

Semantics anchor: ``/root/reference/src/tools/render_glyph.zig:35-73``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fontrx.kernels.exactmath import div_cr, sqrt_cr
from fontrx.kernels.winding_pallas import segments_to_soa
from fontrx.kernels.winding_pallas_v2 import (
    STRIP_ROWS,
    _pad_lanes,
    _round_up,
    phase_a_roots,
)


def _make_page_kernel(
    exact: bool,
    seg_chunk: int,
    tile_w: int,
    n_super: int,
    row_windows: int = 8,
    dynamic_tiles: bool = False,
):
    fdiv = div_cr if exact else (lambda a, b: a / b)
    fsqrt = sqrt_cr if exact else jnp.sqrt

    def kernel(min_x_ref, max_y_ref, scale_ref, off_ref, seg_ref,
               out_ref, bucket_ref):
        b = pl.program_id(0)
        i = pl.program_id(1)
        s_sup = pl.program_id(2)
        scale = scale_ref[0, 0]
        ox = off_ref[0, 0]
        oy = off_ref[0, 1]
        lane = jax.lax.rem(b, 128)
        min_x = min_x_ref[0, lane]
        max_y = max_y_ref[0, lane]

        width = out_ref.shape[2]
        n_tiles = width // tile_w
        s_cap = seg_ref.shape[1]
        n_chunks = s_cap // seg_chunk

        row = jax.lax.broadcasted_iota(jnp.int32, (1, STRIP_ROWS), 1)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, tile_w), 1)
        cy = fdiv(
            (max_y - (i * STRIP_ROWS + row)).astype(jnp.float32) + oy,
            scale,
        )
        cy_hi = cy[0, 0]
        cy_lo = cy[0, STRIP_ROWS - 1]
        cx_tiles = [
            fdiv((min_x + t * tile_w + col).astype(jnp.float32) + ox,
                 scale)
            for t in range(n_tiles)
        ]
        cx_end = fdiv((min_x + width).astype(jnp.float32) + ox, scale)
        tile_lo = [cxt[0, 0] for cxt in cx_tiles] + [cx_end]
        # em x of the raster's left edge (hull test lower bound)
        cx_first = tile_lo[0]

        @pl.when(s_sup == 0)
        def _():
            out_ref[0] = jnp.zeros((STRIP_ROWS, width), jnp.int32)
            bucket_ref[...] = jnp.zeros(
                (n_tiles + 1, STRIP_ROWS), jnp.int32)

        def chunk_body(c, _):
            chunk = seg_ref[0, pl.ds(c * seg_chunk, seg_chunk), :]
            p0x = chunk[:, 0:1]
            p0y = chunk[:, 1:2]
            p1x = chunk[:, 2:3]
            p1y = chunk[:, 3:4]
            p2x = chunk[:, 4:5]
            p2y = chunk[:, 5:6]
            hull_min = jnp.min(jnp.minimum(jnp.minimum(p0y, p1y), p2y))
            hull_max = jnp.max(jnp.maximum(jnp.maximum(p0y, p1y), p2y))
            # x hull: crossings' xx lie inside it (quadratics are
            # bounded by their control hull in every direction)
            # (font-unit values compare directly against the em-space
            # tile edges: cx/xx share the same unit system)
            hx_min = jnp.min(jnp.minimum(jnp.minimum(p0x, p1x), p2x))
            hx_max = jnp.max(jnp.maximum(jnp.maximum(p0x, p1x), p2x))

            @pl.when((hull_max + 1.0 >= cy_lo) & (hull_min - 1.0 <= cy_hi)
                     & (hx_max + 1.0 >= cx_first))
            def _():
                xx0m, xx1m, s0, s1 = phase_a_roots(chunk, cy, fdiv, fsqrt)
                xxT0 = xx0m.T
                xxT1 = xx1m.T
                sT0 = s0.T
                sT1 = s1.T
                guard_lo = hx_min - 1.0
                guard_hi = hx_max + 1.0

                # virtual bucket: crossings right of the raster
                @pl.when(guard_hi >= cx_end)
                def _():
                    r0 = (jnp.sum(jnp.where(xx0m >= cx_end, s0, 0),
                                  axis=0, keepdims=True)
                          + jnp.sum(jnp.where(xx1m >= cx_end, s1, 0),
                                    axis=0, keepdims=True))
                    bucket_ref[pl.ds(n_tiles, 1), :] = (
                        bucket_ref[pl.ds(n_tiles, 1), :] + r0)

                def tile_work(t, lo, hi, cxt):
                    """Classify + bucket + windowed details for one
                    column tile.  ``t`` may be traced (dynamic mode);
                    ``lo``/``hi``/``cxt`` carry the SAME float program
                    as the static tile tables."""
                    in0 = (xx0m >= lo) & (xx0m < hi)
                    in1 = (xx1m >= lo) & (xx1m < hi)
                    rsum = (
                        jnp.sum(jnp.where(in0, s0, 0), axis=0,
                                keepdims=True)
                        + jnp.sum(jnp.where(in1, s1, 0), axis=0,
                                  keepdims=True)
                    )
                    bucket_ref[pl.ds(t, 1), :] = (
                        bucket_ref[pl.ds(t, 1), :] + rsum)
                    t_off = pl.multiple_of(t * tile_w, tile_w)

                    @pl.when(jnp.any(in0 | in1))
                    def _():
                        sd0 = jnp.where(in0, s0, 0).T
                        sd1 = jnp.where(in1, s1, 0).T
                        win_h = STRIP_ROWS // row_windows
                        for w in range(row_windows):
                            r0w = w * win_h
                            cyw_hi = cy[0, r0w]
                            cyw_lo = cy[0, r0w + win_h - 1]

                            @pl.when(
                                (hull_max + 1.0 >= cyw_lo)
                                & (hull_min - 1.0 <= cyw_hi)
                            )
                            def _(r0w=r0w):
                                acc = out_ref[
                                    0, pl.ds(r0w, win_h),
                                    pl.ds(t_off, tile_w),
                                ]
                                for s in range(seg_chunk):
                                    acc = acc + jnp.where(
                                        xxT0[r0w : r0w + win_h,
                                             s : s + 1] >= cxt,
                                        sd0[r0w : r0w + win_h,
                                            s : s + 1],
                                        0,
                                    )
                                    acc = acc + jnp.where(
                                        xxT1[r0w : r0w + win_h,
                                             s : s + 1] >= cxt,
                                        sd1[r0w : r0w + win_h,
                                            s : s + 1],
                                        0,
                                    )
                                out_ref[
                                    0, pl.ds(r0w, win_h),
                                    pl.ds(t_off, tile_w),
                                ] = acc

                if not dynamic_tiles:
                    for t in range(n_tiles):

                        @pl.when((guard_hi >= tile_lo[t])
                                 & (guard_lo < tile_lo[t + 1]))
                        def _(t=t):
                            tile_work(t, tile_lo[t], tile_lo[t + 1],
                                      cx_tiles[t])
                else:
                    # dynamic x-hull tile window: loop ONLY the tiles
                    # the chunk's hull overlaps (typically 1-2 of 30 on
                    # text pages) — the tile bounds are a conservative
                    # superset (pixel-space hull with +-2px slack on
                    # top of the +-1 font-unit guard), so every tile a
                    # crossing can exactly land in is visited; the
                    # per-tile float program is unchanged
                    px_lo = guard_lo * scale - ox - min_x.astype(
                        jnp.float32)
                    px_hi = guard_hi * scale - ox - min_x.astype(
                        jnp.float32)
                    t_lo = jnp.maximum(
                        0, jnp.floor((px_lo - 2.0) / tile_w)
                    ).astype(jnp.int32)
                    t_hi = jnp.minimum(
                        n_tiles - 1,
                        jnp.floor((px_hi + 2.0) / tile_w),
                    ).astype(jnp.int32)

                    def tile_body(t, _):
                        base = (min_x + t * tile_w).astype(jnp.float32)
                        lo = fdiv(base + ox, scale)
                        hi = fdiv(
                            (min_x + (t + 1) * tile_w).astype(
                                jnp.float32) + ox, scale)
                        cxt = fdiv(
                            (min_x + t * tile_w + col).astype(
                                jnp.float32) + ox, scale)
                        tile_work(t, lo, hi, cxt)
                        return 0

                    jax.lax.fori_loop(t_lo, t_hi + 1, tile_body, 0)

            return 0

        jax.lax.fori_loop(0, n_chunks, chunk_body, 0)

        # flush: one right-to-left suffix-sum of the buckets broadcast
        # into the output — the ONLY full-tile carry traffic per strip
        @pl.when(s_sup == n_super - 1)
        def _():
            carry = bucket_ref[pl.ds(n_tiles, 1), :]
            for t in range(n_tiles - 1, -1, -1):
                out_ref[0, :, pl.ds(t * tile_w, tile_w)] = (
                    out_ref[0, :, pl.ds(t * tile_w, tile_w)]
                    + jnp.broadcast_to(carry.T, (STRIP_ROWS, tile_w))
                )
                carry = carry + bucket_ref[pl.ds(t, 1), :]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "height", "width", "interpret", "exact", "seg_chunk", "tile_w",
        "row_windows", "dynamic_tiles",
    ),
)
def winding_page_batch(
    segments, min_x, max_y, scale, *, height, width, interpret=False,
    sample_offset=(0.0, 0.0), exact=False, seg_chunk=32, tile_w=128,
    row_windows=8, dynamic_tiles=False,
):
    """Deferred-carry page winding: int32 ``[B, height, width]``,
    bit-identical to ``winding_pallas_v2_batch`` at the same anchors.
    ``height`` mult of 128, ``width`` of ``tile_w``."""
    b = segments.shape[0]
    assert height % STRIP_ROWS == 0 and width % tile_w == 0
    assert STRIP_ROWS % row_windows == 0
    soa = segments_to_soa(segments, chunk=seg_chunk)
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

    grid = (b, height // STRIP_ROWS, n_super)
    return pl.pallas_call(
        _make_page_kernel(exact, seg_chunk, tile_w, n_super,
                          row_windows=row_windows,
                          dynamic_tiles=dynamic_tiles),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 128), lambda b_, i, s: (0, b_ // 128),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 128), lambda b_, i, s: (0, b_ // 128),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, seg_super, 8), lambda b_, i, s: (b_, s, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, STRIP_ROWS, width), lambda b_, i, s: (b_, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, height, width), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((width // tile_w + 1, STRIP_ROWS), jnp.int32),
        ],
        interpret=interpret,
    )(min_x, max_y, scale_arr, off_arr, soa)


# -- fused x-pair MSAA variant ---------------------------------------------


def _make_page_msaa_kernel(
    exact: bool,
    seg_chunk: int,
    tile_w: int,
    n_super: int,
    row_windows: int = 8,
):
    """Two x-sample offsets per launch, sharing phase A.

    2x2 MSAA needs 4 sub-pixel sample lattices but only 2 distinct row
    offsets ``oy`` — and the root solve (phase A) depends on rows only.
    One launch therefore computes BOTH x samples of one ``oy``: the
    per-chunk stream cost (segment loads, hull tests, branch setup) and
    the root solve are paid once, while classification/buckets/details
    run per sample against its own ``cx`` tables.  Every per-(crossing,
    pixel, sample) indicator uses the float program of the
    single-sample kernel verbatim (same ``fdiv`` tile edges, same
    compares), and winding is an order-independent integer sum — so
    each output plane is BIT-IDENTICAL to ``winding_page_batch`` at
    ``(ox_s, oy)`` (device-validated, tools/tpu_probes/tpu_page_msaa.py).

    Dynamic-tile mode only (the shipped page configuration): the tile
    window is the union of both samples' hull windows — visiting a tile
    the other sample's window wouldn't is harmless because
    classification is exact (it adds zeros).
    """
    fdiv = div_cr if exact else (lambda a, b: a / b)
    fsqrt = sqrt_cr if exact else jnp.sqrt

    def kernel(min_x_ref, max_y_ref, scale_ref, off_ref, seg_ref,
               out_ref, bucket_ref):
        b = pl.program_id(0)
        i = pl.program_id(1)
        s_sup = pl.program_id(2)
        scale = scale_ref[0, 0]
        oy = off_ref[0, 0]
        oxs = (off_ref[0, 1], off_ref[0, 2])
        lane = jax.lax.rem(b, 128)
        min_x = min_x_ref[0, lane]
        max_y = max_y_ref[0, lane]

        width = out_ref.shape[3]
        n_tiles = width // tile_w
        s_cap = seg_ref.shape[1]
        n_chunks = s_cap // seg_chunk

        row = jax.lax.broadcasted_iota(jnp.int32, (1, STRIP_ROWS), 1)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, tile_w), 1)
        cy = fdiv(
            (max_y - (i * STRIP_ROWS + row)).astype(jnp.float32) + oy,
            scale,
        )
        cy_hi = cy[0, 0]
        cy_lo = cy[0, STRIP_ROWS - 1]
        cx_end = [fdiv((min_x + width).astype(jnp.float32) + ox, scale)
                  for ox in oxs]
        cx_first = [fdiv(min_x.astype(jnp.float32) + ox, scale)
                    for ox in oxs]
        cx_first_min = jnp.minimum(cx_first[0], cx_first[1])

        @pl.when(s_sup == 0)
        def _():
            out_ref[0] = jnp.zeros((2, STRIP_ROWS, width), jnp.int32)
            bucket_ref[...] = jnp.zeros(
                (2, n_tiles + 1, STRIP_ROWS), jnp.int32)

        def chunk_body(c, _):
            chunk = seg_ref[0, pl.ds(c * seg_chunk, seg_chunk), :]
            p0x = chunk[:, 0:1]
            p0y = chunk[:, 1:2]
            p1x = chunk[:, 2:3]
            p1y = chunk[:, 3:4]
            p2x = chunk[:, 4:5]
            p2y = chunk[:, 5:6]
            hull_min = jnp.min(jnp.minimum(jnp.minimum(p0y, p1y), p2y))
            hull_max = jnp.max(jnp.maximum(jnp.maximum(p0y, p1y), p2y))
            hx_min = jnp.min(jnp.minimum(jnp.minimum(p0x, p1x), p2x))
            hx_max = jnp.max(jnp.maximum(jnp.maximum(p0x, p1x), p2x))

            @pl.when((hull_max + 1.0 >= cy_lo) & (hull_min - 1.0 <= cy_hi)
                     & (hx_max + 1.0 >= cx_first_min))
            def _():
                xx0m, xx1m, s0, s1 = phase_a_roots(chunk, cy, fdiv, fsqrt)
                xxT0 = xx0m.T
                xxT1 = xx1m.T
                guard_lo = hx_min - 1.0
                guard_hi = hx_max + 1.0

                for s in range(2):

                    @pl.when(guard_hi >= cx_end[s])
                    def _(s=s):
                        r0 = (jnp.sum(jnp.where(xx0m >= cx_end[s], s0, 0),
                                      axis=0, keepdims=True)
                              + jnp.sum(jnp.where(xx1m >= cx_end[s], s1, 0),
                                        axis=0, keepdims=True))
                        bucket_ref[s, pl.ds(n_tiles, 1), :] = (
                            bucket_ref[s, pl.ds(n_tiles, 1), :] + r0)

                def tile_work(s, t, lo, hi, cxt):
                    in0 = (xx0m >= lo) & (xx0m < hi)
                    in1 = (xx1m >= lo) & (xx1m < hi)
                    rsum = (
                        jnp.sum(jnp.where(in0, s0, 0), axis=0,
                                keepdims=True)
                        + jnp.sum(jnp.where(in1, s1, 0), axis=0,
                                  keepdims=True)
                    )
                    bucket_ref[s, pl.ds(t, 1), :] = (
                        bucket_ref[s, pl.ds(t, 1), :] + rsum)
                    t_off = pl.multiple_of(t * tile_w, tile_w)

                    @pl.when(jnp.any(in0 | in1))
                    def _():
                        sd0 = jnp.where(in0, s0, 0).T
                        sd1 = jnp.where(in1, s1, 0).T
                        win_h = STRIP_ROWS // row_windows
                        for w in range(row_windows):
                            r0w = w * win_h
                            cyw_hi = cy[0, r0w]
                            cyw_lo = cy[0, r0w + win_h - 1]

                            @pl.when(
                                (hull_max + 1.0 >= cyw_lo)
                                & (hull_min - 1.0 <= cyw_hi)
                            )
                            def _(r0w=r0w):
                                acc = out_ref[
                                    0, s, pl.ds(r0w, win_h),
                                    pl.ds(t_off, tile_w),
                                ]
                                for sg in range(seg_chunk):
                                    acc = acc + jnp.where(
                                        xxT0[r0w : r0w + win_h,
                                             sg : sg + 1] >= cxt,
                                        sd0[r0w : r0w + win_h,
                                            sg : sg + 1],
                                        0,
                                    )
                                    acc = acc + jnp.where(
                                        xxT1[r0w : r0w + win_h,
                                             sg : sg + 1] >= cxt,
                                        sd1[r0w : r0w + win_h,
                                            sg : sg + 1],
                                        0,
                                    )
                                out_ref[
                                    0, s, pl.ds(r0w, win_h),
                                    pl.ds(t_off, tile_w),
                                ] = acc

                # union dynamic x-hull window across both samples
                px_lo = jnp.minimum(
                    guard_lo * scale - oxs[0],
                    guard_lo * scale - oxs[1],
                ) - min_x.astype(jnp.float32)
                px_hi = jnp.maximum(
                    guard_hi * scale - oxs[0],
                    guard_hi * scale - oxs[1],
                ) - min_x.astype(jnp.float32)
                t_lo = jnp.maximum(
                    0, jnp.floor((px_lo - 2.0) / tile_w)
                ).astype(jnp.int32)
                t_hi = jnp.minimum(
                    n_tiles - 1,
                    jnp.floor((px_hi + 2.0) / tile_w),
                ).astype(jnp.int32)

                def tile_body(t, _):
                    for s in range(2):
                        base = (min_x + t * tile_w).astype(jnp.float32)
                        lo = fdiv(base + oxs[s], scale)
                        hi = fdiv(
                            (min_x + (t + 1) * tile_w).astype(
                                jnp.float32) + oxs[s], scale)
                        cxt = fdiv(
                            (min_x + t * tile_w + col).astype(
                                jnp.float32) + oxs[s], scale)
                        tile_work(s, t, lo, hi, cxt)
                    return 0

                jax.lax.fori_loop(t_lo, t_hi + 1, tile_body, 0)

            return 0

        jax.lax.fori_loop(0, n_chunks, chunk_body, 0)

        @pl.when(s_sup == n_super - 1)
        def _():
            for s in range(2):
                carry = bucket_ref[s, pl.ds(n_tiles, 1), :]
                for t in range(n_tiles - 1, -1, -1):
                    out_ref[0, s, :, pl.ds(t * tile_w, tile_w)] = (
                        out_ref[0, s, :, pl.ds(t * tile_w, tile_w)]
                        + jnp.broadcast_to(carry.T, (STRIP_ROWS, tile_w))
                    )
                    carry = carry + bucket_ref[s, pl.ds(t, 1), :]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "height", "width", "interpret", "exact", "seg_chunk", "tile_w",
        "row_windows",
    ),
)
def winding_page_msaa_batch(
    segments, min_x, max_y, scale, *, height, width, interpret=False,
    sample_oy=0.0, sample_oxs=(0.0, 0.0), exact=False, seg_chunk=32,
    tile_w=128, row_windows=8,
):
    """Fused x-pair page winding for MSAA: int32 ``[B, 2, height,
    width]`` — plane ``s`` bit-identical to ``winding_page_batch`` with
    ``sample_offset=(sample_oxs[s], sample_oy)``.  One launch per
    distinct row offset => a 2x2-MSAA page costs 2 launches, not 4."""
    b = segments.shape[0]
    assert height % STRIP_ROWS == 0 and width % tile_w == 0
    assert STRIP_ROWS % row_windows == 0
    soa = segments_to_soa(segments, chunk=seg_chunk)
    s8 = soa.shape[1]

    b128 = _round_up(b, 128)
    min_x = _pad_lanes(
        jnp.asarray(min_x).reshape(1, b).astype(jnp.int32), b128)
    max_y = _pad_lanes(
        jnp.asarray(max_y).reshape(1, b).astype(jnp.int32), b128)
    scale_arr = jnp.full((1, 1), scale, jnp.float32)
    off_arr = jnp.asarray(
        [sample_oy, sample_oxs[0], sample_oxs[1]], jnp.float32
    ).reshape(1, 3)

    seg_super = min(s8, 4096)
    if s8 % seg_super:
        pad = seg_super - (s8 % seg_super)
        soa = jnp.pad(soa, ((0, 0), (0, pad), (0, 0)))
        s8 = soa.shape[1]
    n_super = s8 // seg_super

    grid = (b, height // STRIP_ROWS, n_super)
    return pl.pallas_call(
        _make_page_msaa_kernel(exact, seg_chunk, tile_w, n_super,
                               row_windows=row_windows),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 128), lambda b_, i, s: (0, b_ // 128),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 128), lambda b_, i, s: (0, b_ // 128),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, seg_super, 8), lambda b_, i, s: (b_, s, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 2, STRIP_ROWS, width), lambda b_, i, s: (b_, 0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, 2, height, width), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((2, width // tile_w + 1, STRIP_ROWS), jnp.int32),
        ],
        interpret=interpret,
    )(min_x, max_y, scale_arr, off_arr, soa)
