"""Pallas TPU winding kernel, v2 — row-strip carry-sweep formulation.

Replaces the v1 per-row scalar-ish root solve (which wasted 127/128 VPU
lanes on ``(C, 1)`` columns) with a structure where every op runs on
full ``(8, 128)`` register tiles:

- **Grid** = (glyph, row-strip, segment-super-chunk): each instance
  owns a strip of ``STRIP_ROWS = 128`` pixel rows x the full width for
  one window of the segment stream, so the quadratic root solve per
  (segment-chunk, row) — the expensive math — is computed ONCE per
  strip on ``(C, R)`` tiles with rows on lanes, and arbitrarily large
  segment counts stream through VMEM (the out strip stays resident
  across the stream).
- **Crossing factorization**: a winding crossing at em-x ``xx`` adds
  its sign to every pixel left of it.  Column tiles sweep right-to-left
  carrying a per-row base: crossings right of the tile fold into the
  carry with one ``(C, R)`` compare; only crossings *landing inside*
  the tile do per-pixel ``(R, TILE_W)`` compares — and that whole block
  is skipped (``@pl.when``) for (chunk, tile) pairs with no in-tile
  crossing.  The tile classification is exact: it compares against the
  same float cx values the per-pixel test uses, so results are
  bit-identical to the unfactored kernel.
- **Y-culling**: a segment chunk whose control-hull y-range misses the
  strip (with a +-1 font-unit guard band for float slack) skips
  entirely — the big win for high-segment-count (CJK) glyphs.

Float semantics per crossing match ``oracle.winding_at`` exactly (same
op order).  Interface-compatible with ``winding_pallas_batch``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fontrx.kernels.exactmath import div_cr, sqrt_cr
from fontrx.kernels.winding_pallas import segments_to_soa

STRIP_ROWS = 128
TILE_W = 128
SEG_CHUNK = 8


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _pad_lanes(a, lanes: int):
    """Zero-pad the last dim to ``lanes`` (SMEM anchor blocks must be
    128-wide windows)."""
    if a.shape[-1] == lanes:
        return a
    return jnp.pad(a, ((0, 0), (0, lanes - a.shape[-1])))


def phase_a_roots(chunk, cy, fdiv, fsqrt):
    """The shared per-(segment, row) root solve — THE float program
    whose per-crossing semantics match ``oracle.winding_at`` op for op
    (and therefore must never change silently; see CLAUDE.md).

    ``chunk``: (C, >=6) SoA segment window; ``cy``: (1, R) row em-y.
    Returns ``(xx0m, xx1m, s0, s1)``: crossing x positions per slot
    with dead crossings at -inf, and their int32 signs (0 when dead).
    Used by the row-major carry-sweep kernel and the column-major
    dense kernel — both kernels' phase B consume these identically,
    which is what makes their rasters bit-identical.
    """
    return phase_a_roots_params(
        chunk[:, 0:1], chunk[:, 1:2], chunk[:, 2:3],
        chunk[:, 3:4], chunk[:, 4:5], chunk[:, 5:6],
        cy, fdiv, fsqrt,
    )


def phase_a_roots_params(p0x, p0y, p1x, p1y, p2x, p2y, cy, fdiv, fsqrt):
    """``phase_a_roots`` with the six control-point tensors pre-sliced.

    Params may be ``(C, 1)`` columns (the classic layout) or ``(C, R)``
    tensors varying along lanes (the lane-packed dense kernel, where
    different lane groups carry different segment chunks).  Every op is
    elementwise-after-broadcast, so each (segment, row) element sees
    exactly the float program of the ``(C, 1)`` form — results are
    bit-identical per element regardless of lane placement.
    """
    a = p0y - 2 * p1y + p2y      # (C, 1)
    ax = p0x - 2 * p1x + p2x
    bx = 2 * (p1x - p0x)
    lin = a == 0
    denom = p2y - p0y
    py01 = p0y - p1y

    delta = cy * a + p1y * p1y - p0y * p2y       # (C, R)
    has = jnp.logical_not(lin) & (delta >= 0)
    sq = fsqrt(jnp.maximum(delta, 0.0))

    # NB fusing the (per-lane exclusive) linear/+ divisions into one
    # fdiv over where-selected operands is bit-identical but measured
    # a wash on TPU (tools/tpu_probes/tpu_fusedfdiv_ab.py; RESULTS.md
    # "Exact-math variants") — the separate form stays.
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


def _make_v2_kernel(
    exact: bool,
    seg_chunk: int = SEG_CHUNK,
    tile_w: int = TILE_W,
    guard: bool = True,
    group_guard: int = 0,
    _detail: bool = True,
    row_bands: int = 1,
    glyphs_per_step: int = 1,
    row_windows: int = 0,
):
    """Kernel factory.

    - ``exact``: correctly-rounded div/sqrt in the per-row phase
      (``fontrx.kernels.exactmath``) — TPU tie-pixel parity with the
      IEEE-correct CPU oracle.
    - ``seg_chunk`` / ``tile_w`` / ``guard``: tuning knobs (segment
      chunk height, column-tile width, whether detail compares are
      skipped behind ``@pl.when`` per (chunk, tile)).
    - ``group_guard`` (guard mode only): additionally skip the
      per-pixel compare/select/add for *groups* of this many segments
      when no segment in the group has an in-tile crossing.  Phase B
      (those per-pixel ops) dominates the kernel (docs/KERNELS.md), and
      a glyph segment only crosses rows in its own y-span, so group
      activity per (chunk, tile) is well under 100%.  Exactness is
      unaffected: skipped groups contribute exactly zero (integer adds
      commute).
    - ``_detail=False``: timing-only instrumentation — skips phase B
      entirely (WRONG results) to measure the phase A / phase B split.
    - ``row_bands``: pack this many glyphs per 128-row strip, each
      owning a ``128/row_bands``-row band with its OWN (min_x, max_y)
      anchor — the small-tile atlas optimization (a 64px tile alone
      wastes half a strip; 32px three quarters).  Anchors become
      per-row vectors (one select per band), ``cx`` becomes per-row,
      and each segment carries its owner band in SoA lane 6, masked
      into the existing sign mask — so a glyph's rows compute exactly
      the per-glyph float program, and foreign segments contribute
      integer zeros.  Requires a single-strip launch (height == 128).
    - ``glyphs_per_step``: process this many batch elements per grid
      step (static inner loop; out/segment blocks grow a leading dim).
      Amortizes the measured ~1.2-2.4 us per-grid-step fixed cost that
      dominates small-tile atlases (36% of the full-font frame).  Must
      divide 128 so a step's anchors share one SMEM window.
    - ``row_windows``: the dense-regime optimization — split each
      strip's per-pixel detail phase into this many static row windows
      (``128/row_windows`` rows each, register-tile aligned) and gate
      every (chunk, window) on control-hull overlap with the window's
      ``cy`` range, exactly like the existing strip-level cull but at
      sub-strip granularity.  A chunk's segments provably contribute
      zero winding at rows outside their hull (the hull bounds the
      curve's y-range), so skipped windows are exact — bit-identical
      to ``row_windows=0``.  This is what makes a 288-segment CJK
      glyph in a single 128-row strip cheap: phase B touches only the
      ~1-2 windows each y-sorted chunk actually crosses instead of the
      whole strip.
    """
    if row_windows:
        assert row_bands == 1 and STRIP_ROWS % row_windows == 0, (
            row_windows, row_bands)
    fdiv = div_cr if exact else (lambda a, b: a / b)
    fsqrt = sqrt_cr if exact else jnp.sqrt

    def kernel(min_x_ref, max_y_ref, scale_ref, off_ref, seg_ref, out_ref):
        b = pl.program_id(0)
        i = pl.program_id(1)
        # segment super-chunk index: the segment axis streams through
        # the grid so VMEM holds one (SEG_SUPER, 8) window at a time
        # (the (.., 8) lane dim pads to 128 in VMEM — holding ALL
        # segments resident costs 64 bytes/segment and breaks at
        # page-scale segment counts)
        s_sup = pl.program_id(2)
        scale = scale_ref[0, 0]
        ox = off_ref[0, 0]
        oy = off_ref[0, 1]

        width = out_ref.shape[2]
        n_tiles = width // tile_w
        s_cap = seg_ref.shape[1]
        n_chunks = s_cap // seg_chunk

        row = jax.lax.broadcasted_iota(jnp.int32, (1, STRIP_ROWS), 1)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, tile_w), 1)
        def one_glyph(g):
            # anchors arrive in (row_bands, 128) SMEM windows; this
            # glyph's scalars sit at lane (b*G + g) % 128
            lane = jax.lax.rem(b * glyphs_per_step + g, 128)
            # blocked anchors: each grid step DMAs a 128-wide SMEM window
            # instead of the whole (row_bands, B) array — whole-array SMEM
            # staging made per-instance cost grow linearly in B (quadratic
            # total; measured 5x on 6k-glyph atlases,
            # tools/tpu_probes/tpu_banded*)
            if row_bands == 1:
                min_x = min_x_ref[0, lane]
                max_y = max_y_ref[0, lane]
                # per-row em y: (1, R), rows on lanes, descending
                cy = fdiv(
                    (max_y - (i * STRIP_ROWS + row)).astype(jnp.float32) + oy,
                    scale,
                )
                cy_hi = cy[0, 0]                   # strip's largest em y
                cy_lo = cy[0, STRIP_ROWS - 1]

                # per-tile em x row vectors and their left-edge values; tiles
                # are indexed left-to-right, plus the one-past-the-end left
                # edge
                cx_tiles = []
                for t in range(n_tiles):
                    cx_tiles.append(
                        fdiv(
                            (min_x + t * tile_w + col).astype(jnp.float32) + ox,
                            scale,
                        )
                    )
                cx_end = fdiv((min_x + width).astype(jnp.float32) + ox, scale)
                tile_lo = [cxt[0, 0] for cxt in cx_tiles] + [cx_end]
                band_f = None
            else:
                # banded anchors: band k owns rows [k*band_h, (k+1)*band_h)
                # with its own (min_x, max_y); each row computes exactly the
                # per-glyph float program (same int adds, same f32 divides)
                band_h = STRIP_ROWS // row_bands
                band = row // band_h                      # (1, R)
                row_in = row - band * band_h
                myv = jnp.zeros((1, STRIP_ROWS), jnp.int32)
                mxv = jnp.zeros((1, STRIP_ROWS), jnp.int32)
                for k in range(row_bands):
                    myv = jnp.where(band == k, max_y_ref[k, lane], myv)
                    mxv = jnp.where(band == k, min_x_ref[k, lane], mxv)
                cy = fdiv((myv - row_in).astype(jnp.float32) + oy, scale)
                cy_hi = jnp.max(cy)
                cy_lo = jnp.min(cy)
                cx_tiles = []
                for t in range(n_tiles):
                    cx_tiles.append(
                        fdiv(
                            (mxv.reshape(STRIP_ROWS, 1) + (t * tile_w + col))
                            .astype(jnp.float32) + ox,
                            scale,
                        )
                    )  # (R, tile_w)
                cx_end = fdiv((mxv + width).astype(jnp.float32) + ox, scale)
                # per-row left edges: (1, R) vectors (broadcast against the
                # (C, R) crossing tensors exactly like the scalar case),
                # computed in row layout directly — same float program as
                # each tile's column 0
                tile_lo = [
                    fdiv((mxv + t * tile_w).astype(jnp.float32) + ox, scale)
                    for t in range(n_tiles)
                ] + [cx_end]
                band_f = band.astype(jnp.float32)

            @pl.when(s_sup == 0)
            def _():
                out_ref[g] = jnp.zeros((STRIP_ROWS, width), jnp.int32)

            def chunk_body(c, _):
                chunk = seg_ref[g, pl.ds(c * seg_chunk, seg_chunk), :]  # (C, 8)
                p0x = chunk[:, 0:1]
                p0y = chunk[:, 1:2]
                p1x = chunk[:, 2:3]
                p1y = chunk[:, 3:4]
                p2x = chunk[:, 4:5]
                p2y = chunk[:, 5:6]

                hull_min = jnp.min(jnp.minimum(jnp.minimum(p0y, p1y), p2y))
                hull_max = jnp.max(jnp.maximum(jnp.maximum(p0y, p1y), p2y))

                @pl.when((hull_max + 1.0 >= cy_lo) & (hull_min - 1.0 <= cy_hi))
                def _():
                    # phase A on (C, R): roots + crossings for the whole
                    # strip (the shared float program — slot 0: linear
                    # crossing or +root; slot 1: -root; boolean selects
                    # via logic ops because Mosaic cannot truncate i8
                    # selects to i1)
                    xx0m, xx1m, s0, s1 = phase_a_roots(
                        chunk, cy, fdiv, fsqrt)
                    if row_bands > 1:
                        # a segment only exists on its owner band's rows;
                        # foreign rows contribute integer zeros (exactness
                        # preserved: sums of zero).  Masking after the
                        # helper's neutralization is equivalent to the
                        # pre-neutralization masking: it only zeroes
                        # MORE slots, and xx re-neutralizes below.
                        owner_ok = chunk[:, 6:7] == band_f    # (C, R)
                        s0 = jnp.where(owner_ok, s0, 0)
                        s1 = jnp.where(owner_ok, s1, 0)
                        neg_inf = jnp.float32(-jnp.inf)
                        xx0m = jnp.where(s0 != 0, xx0m, neg_inf)
                        xx1m = jnp.where(s1 != 0, xx1m, neg_inf)

                    # crossing positions/signs in pixel-major layout, hoisted
                    # out of the tile loop (one relayout per chunk)
                    xxT0 = xx0m.T          # (R, C)
                    xxT1 = xx1m.T
                    sT0 = s0.T
                    sT1 = s1.T

                    def tile_detail(t, sd_t0, sd_t1, sl, base):
                        """Per-pixel compares for tile t.  A crossing with
                        ``xx >= tile_hi`` compares true on every column, so
                        unmasked inputs yield the *complete* winding for all
                        crossings at/right of the tile's left edge."""
                        cxt = cx_tiles[t]      # (1, tile_w)
                        detail = base
                        for s in range(seg_chunk):
                            detail = detail + jnp.where(
                                xxT0[:, s : s + 1] >= cxt, sd_t0[:, s : s + 1], 0
                            )
                            detail = detail + jnp.where(
                                xxT1[:, s : s + 1] >= cxt, sd_t1[:, s : s + 1], 0
                            )
                        out_ref[g, :, pl.ds(t * tile_w, tile_w)] = sl + detail

                    if not _detail:
                        # timing-only: consume phase A results with one cheap
                        # carry-style fold so Mosaic cannot DCE the root
                        # solve; all per-pixel (phase B) work is skipped
                        s_all = jnp.sum(
                            jnp.where(xx0m >= cx_end, s0, 0)
                            + jnp.where(xx1m >= cx_end, s1, 0),
                            axis=0, keepdims=True,
                        )
                        out_ref[g, :, pl.ds(0, tile_w)] = (
                            out_ref[g, :, pl.ds(0, tile_w)]
                            + jnp.broadcast_to(s_all.T, (STRIP_ROWS, tile_w))
                        )
                    elif not guard:
                        # carry-free: every tile compares every crossing at or
                        # right of its left edge (correct per docstring above)
                        if row_windows:
                            win_h = STRIP_ROWS // row_windows
                            for t in range(n_tiles):
                                cxt = cx_tiles[t]
                                for w in range(row_windows):
                                    r0 = w * win_h
                                    # rows descend in em y: cy[r0] is the
                                    # window's high edge
                                    cyw_hi = cy[0, r0]
                                    cyw_lo = cy[0, r0 + win_h - 1]

                                    @pl.when(
                                        (hull_max + 1.0 >= cyw_lo)
                                        & (hull_min - 1.0 <= cyw_hi)
                                    )
                                    def _(t=t, r0=r0, cxt=cxt):
                                        acc = out_ref[
                                            g, pl.ds(r0, win_h),
                                            pl.ds(t * tile_w, tile_w),
                                        ]
                                        for s in range(seg_chunk):
                                            acc = acc + jnp.where(
                                                xxT0[r0 : r0 + win_h, s : s + 1]
                                                >= cxt,
                                                sT0[r0 : r0 + win_h, s : s + 1],
                                                0,
                                            )
                                            acc = acc + jnp.where(
                                                xxT1[r0 : r0 + win_h, s : s + 1]
                                                >= cxt,
                                                sT1[r0 : r0 + win_h, s : s + 1],
                                                0,
                                            )
                                        out_ref[
                                            g, pl.ds(r0, win_h),
                                            pl.ds(t * tile_w, tile_w),
                                        ] = acc
                        else:
                            zero = jnp.zeros((STRIP_ROWS, tile_w), jnp.int32)
                            for t in range(n_tiles):
                                sl = out_ref[g, :, pl.ds(t * tile_w, tile_w)]
                                tile_detail(t, sT0, sT1, sl, zero)
                    else:
                        # carry sweep: far-right crossings fold into a per-row
                        # base; per-pixel compares (and their stores) are
                        # skipped for tiles with no in-tile crossing
                        carry = jnp.zeros((1, STRIP_ROWS), jnp.int32)
                        carry = carry + jnp.sum(
                            jnp.where(xx0m >= cx_end, s0, 0), axis=0, keepdims=True
                        )
                        carry = carry + jnp.sum(
                            jnp.where(xx1m >= cx_end, s1, 0), axis=0, keepdims=True
                        )
                        for t in range(n_tiles - 1, -1, -1):
                            lo = tile_lo[t]
                            hi = tile_lo[t + 1]
                            in0 = (xx0m >= lo) & (xx0m < hi)
                            in1 = (xx1m >= lo) & (xx1m < hi)
                            base = jnp.broadcast_to(
                                carry.T, (STRIP_ROWS, tile_w)
                            )
                            sl = out_ref[g, :, pl.ds(t * tile_w, tile_w)]
                            any_in = jnp.any(in0 | in1)

                            if group_guard:
                                # base first, then per-group guarded
                                # accumulate: a segment only crosses rows in
                                # its y-span, so most groups are dead for a
                                # given (strip, tile) and skip their
                                # (R, tile_w) compare/select/adds entirely
                                @pl.when(any_in)
                                def _(t=t, in0=in0, in1=in1, sl=sl, base=base):
                                    out_ref[g, :, pl.ds(t * tile_w, tile_w)] = (
                                        sl + base
                                    )
                                    cxt = cx_tiles[t]
                                    sd0 = jnp.where(in0, s0, 0).T
                                    sd1 = jnp.where(in1, s1, 0).T
                                    for g0 in range(0, seg_chunk, group_guard):
                                        g1 = min(g0 + group_guard, seg_chunk)

                                        @pl.when(jnp.any(in0[g0:g1]))
                                        def _(g0=g0, g1=g1, t=t, sd=sd0, xxT=xxT0):
                                            acc = out_ref[
                                                g, :, pl.ds(t * tile_w, tile_w)
                                            ]
                                            for s in range(g0, g1):
                                                acc = acc + jnp.where(
                                                    xxT[:, s : s + 1] >= cxt,
                                                    sd[:, s : s + 1], 0,
                                                )
                                            out_ref[
                                                g, :, pl.ds(t * tile_w, tile_w)
                                            ] = acc

                                        @pl.when(jnp.any(in1[g0:g1]))
                                        def _(g0=g0, g1=g1, t=t, sd=sd1, xxT=xxT1):
                                            acc = out_ref[
                                                g, :, pl.ds(t * tile_w, tile_w)
                                            ]
                                            for s in range(g0, g1):
                                                acc = acc + jnp.where(
                                                    xxT[:, s : s + 1] >= cxt,
                                                    sd[:, s : s + 1], 0,
                                                )
                                            out_ref[
                                                g, :, pl.ds(t * tile_w, tile_w)
                                            ] = acc
                            elif row_windows:
                                # base everywhere, then details per live
                                # hull-overlapped row window only
                                @pl.when(any_in)
                                def _(t=t, in0=in0, in1=in1, sl=sl, base=base):
                                    out_ref[g, :, pl.ds(t * tile_w, tile_w)] = (
                                        sl + base
                                    )
                                    cxt = cx_tiles[t]
                                    sd0 = jnp.where(in0, s0, 0).T
                                    sd1 = jnp.where(in1, s1, 0).T
                                    win_h = STRIP_ROWS // row_windows
                                    for w in range(row_windows):
                                        r0 = w * win_h
                                        cyw_hi = cy[0, r0]
                                        cyw_lo = cy[0, r0 + win_h - 1]

                                        @pl.when(
                                            (hull_max + 1.0 >= cyw_lo)
                                            & (hull_min - 1.0 <= cyw_hi)
                                        )
                                        def _(t=t, r0=r0, cxt=cxt,
                                              sd0=sd0, sd1=sd1, win_h=win_h):
                                            acc = out_ref[
                                                g, pl.ds(r0, win_h),
                                                pl.ds(t * tile_w, tile_w),
                                            ]
                                            for s in range(seg_chunk):
                                                acc = acc + jnp.where(
                                                    xxT0[r0 : r0 + win_h,
                                                         s : s + 1] >= cxt,
                                                    sd0[r0 : r0 + win_h,
                                                        s : s + 1],
                                                    0,
                                                )
                                                acc = acc + jnp.where(
                                                    xxT1[r0 : r0 + win_h,
                                                         s : s + 1] >= cxt,
                                                    sd1[r0 : r0 + win_h,
                                                        s : s + 1],
                                                    0,
                                                )
                                            out_ref[
                                                g, pl.ds(r0, win_h),
                                                pl.ds(t * tile_w, tile_w),
                                            ] = acc
                            else:
                                @pl.when(any_in)
                                def _(t=t, in0=in0, in1=in1, sl=sl, base=base):
                                    tile_detail(
                                        t,
                                        jnp.where(in0, s0, 0).T,
                                        jnp.where(in1, s1, 0).T,
                                        sl,
                                        base,
                                    )

                            @pl.when(jnp.logical_not(any_in))
                            def _(sl=sl, base=base, t=t):
                                out_ref[g, :, pl.ds(t * tile_w, tile_w)] = sl + base

                            carry = carry + jnp.sum(
                                jnp.where(in0, s0, 0), axis=0, keepdims=True
                            )
                            carry = carry + jnp.sum(
                                jnp.where(in1, s1, 0), axis=0, keepdims=True
                            )

                return 0

            jax.lax.fori_loop(0, n_chunks, chunk_body, 0)

        for g in range(glyphs_per_step):
            one_glyph(g)



    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "row_bands", "interpret", "exact", "seg_chunk", "tile_w",
        "guard", "group_guard",
    ),
)
def winding_pallas_banded_batch(
    segments, owners, min_x, max_y, scale, *, width, row_bands,
    interpret=False, sample_offset=(0.0, 0.0), exact=False, seg_chunk=32,
    tile_w=TILE_W, guard=True, group_guard=8,
):
    """Row-banded winding maps: ``row_bands`` glyphs share each 128-row
    strip (the small-tile atlas optimization — see ``_make_v2_kernel``'s
    ``row_bands`` doc).

    - ``segments``: float32 ``[B, S, 3, 2]`` — each element holds all of
      its bands' glyphs' segments (any order, zero-padded)
    - ``owners``: int ``[B, S]`` — owning band (0..row_bands-1) per
      segment
    - ``min_x``/``max_y``: int32 ``[row_bands, B]`` per-band anchors
    -> int32 ``[B, 128, width]``; band k of element b is rows
    ``[k*128/row_bands, (k+1)*128/row_bands)``, bit-identical to the
    per-glyph kernel at the same anchors.
    """
    b = segments.shape[0]
    assert STRIP_ROWS % row_bands == 0, row_bands
    assert width % tile_w == 0, (width, tile_w)
    soa = segments_to_soa(segments, chunk=seg_chunk)
    soa = soa.at[:, : owners.shape[1], 6].set(owners.astype(jnp.float32))
    s8 = soa.shape[1]

    b128 = _round_up(b, 128)
    min_x = _pad_lanes(min_x.reshape(row_bands, b).astype(jnp.int32), b128)
    max_y = _pad_lanes(max_y.reshape(row_bands, b).astype(jnp.int32), b128)
    scale_arr = jnp.full((1, 1), scale, jnp.float32)
    off_arr = jnp.asarray(sample_offset, jnp.float32).reshape(1, 2)

    seg_super = min(s8, 4096)
    if s8 % seg_super:
        pad = seg_super - (s8 % seg_super)
        soa = jnp.pad(soa, ((0, 0), (0, pad), (0, 0)))
        s8 = soa.shape[1]
    n_super = s8 // seg_super

    grid = (b, 1, n_super)
    return pl.pallas_call(
        _make_v2_kernel(
            exact, seg_chunk, tile_w, guard, group_guard,
            row_bands=row_bands,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((row_bands, 128), lambda b_, i, s: (0, b_ // 128),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((row_bands, 128), lambda b_, i, s: (0, b_ // 128),
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
        out_shape=jax.ShapeDtypeStruct((b, STRIP_ROWS, width), jnp.int32),
        interpret=interpret,
    )(min_x, max_y, scale_arr, off_arr, soa)


@functools.partial(
    jax.jit,
    static_argnames=(
        "height", "width", "interpret", "exact", "seg_chunk", "tile_w",
        "guard", "group_guard", "_detail", "glyphs_per_step", "row_windows",
    ),
)
def winding_pallas_v2_batch(
    segments, min_x, max_y, scale, *, height, width, interpret=False,
    sample_offset=(0.0, 0.0), exact=False, seg_chunk=16,
    tile_w=TILE_W, guard=True, group_guard=0, _detail=True,
    glyphs_per_step=1, row_windows=0,
):
    """Batched winding maps, v2 kernel.  height must be a multiple of
    ``STRIP_ROWS`` (128) and width of ``TILE_W`` (128).

    ``exact=True``: correctly-rounded div/sqrt in the root solve —
    bit-parity with the CPU oracle even on TPU tie pixels.
    ``glyphs_per_step``: amortize the per-grid-step fixed cost by
    rastering this many glyphs per step (must divide 128; the batch
    pads with empty glyphs)."""
    b = segments.shape[0]
    gps = glyphs_per_step
    assert height % STRIP_ROWS == 0 and width % tile_w == 0, (height, width)
    assert gps >= 1 and 128 % gps == 0, gps
    soa = segments_to_soa(segments, chunk=seg_chunk)
    s8 = soa.shape[1]

    bp = _round_up(b, gps)
    if bp != b:
        soa = jnp.pad(soa, ((0, bp - b), (0, 0), (0, 0)))
        min_x = jnp.pad(jnp.asarray(min_x), (0, bp - b))
        max_y = jnp.pad(jnp.asarray(max_y), (0, bp - b))
    b128 = _round_up(bp, 128)
    min_x = _pad_lanes(min_x.reshape(1, bp).astype(jnp.int32), b128)
    max_y = _pad_lanes(max_y.reshape(1, bp).astype(jnp.int32), b128)
    scale_arr = jnp.full((1, 1), scale, jnp.float32)
    off_arr = jnp.asarray(sample_offset, jnp.float32).reshape(1, 2)

    # stream the segment axis in super-chunks: the (.., 8) lane dim pads
    # to 128 in VMEM (64 B/segment), so holding every segment resident
    # breaks at page-scale segment counts
    seg_super = min(s8, 4096)
    if s8 % seg_super:
        pad = seg_super - (s8 % seg_super)
        soa = jnp.pad(soa, ((0, 0), (0, pad), (0, 0)))
        s8 = soa.shape[1]
    n_super = s8 // seg_super

    grid = (bp // gps, height // STRIP_ROWS, n_super)
    out = pl.pallas_call(
        _make_v2_kernel(exact, seg_chunk, tile_w, guard, group_guard, _detail,
                        glyphs_per_step=gps, row_windows=row_windows),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 128), lambda b_, i, s: (0, b_ * gps // 128),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 128), lambda b_, i, s: (0, b_ * gps // 128),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (gps, seg_super, 8), lambda b_, i, s: (b_, s, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (gps, STRIP_ROWS, width), lambda b_, i, s: (b_, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bp, height, width), jnp.int32),
        interpret=interpret,
    )(min_x, max_y, scale_arr, off_arr, soa)
    return out[:b] if bp != b else out
