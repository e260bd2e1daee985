"""Pallas TPU supersampled-coverage kernel (in-register MSAA).

One launch computes k x k supersampled coverage — the fused alternative
to ``fontrx.kernels.coverage``'s k^2 re-invocations of the winding
kernel.  Structure extends the v2 carry-sweep kernel
(``winding_pallas_v2``):

- for each of the k sub-row offsets, the root solve (phase A) runs once
  per segment chunk and is *shared* by all k sub-column offsets — so
  the expensive math scales with k, not k^2;
- per sub-column offset, the right-to-left carry sweep accumulates a
  winding buffer in VMEM scratch; after all chunks, each buffer's
  nonzero mask adds into the coverage accumulator;
- the same hull y-cull and in-tile-crossing skip guards apply per
  sub-row.

Sample lattice matches ``coverage.sample_offsets``: centered
``(i + 0.5)/k - 0.5``.  ``exact`` mode available as in v2.
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
# round-3 close partition sweep (tools/tpu_probes/tpu_cov_knobs.py, 94
# ASCII @256px 2x2): sc8 6.11 ms, sc16 5.14 (-16%), sc32 5.28 — winding
# sums are order-independent so every chunking is bit-identical (device
# parity 0; the nested-when detail unroll compiles correctly at 16/32,
# unlike the page kernel's sc64).
SEG_CHUNK = 16


def _make_coverage_kernel(k: int, exact: bool, seg_chunk: int = SEG_CHUNK):
    fdiv = div_cr if exact else (lambda a, b: a / b)
    fsqrt = sqrt_cr if exact else jnp.sqrt
    offs = [(i + 0.5) / k - 0.5 for i in range(k)]

    def kernel(min_x_ref, max_y_ref, scale_ref, seg_ref, out_ref, wind_ref):
        b = pl.program_id(0)
        i = pl.program_id(1)
        min_x = min_x_ref[0, b]
        max_y = max_y_ref[0, b]
        scale = scale_ref[0, 0]

        width = out_ref.shape[2]
        n_tiles = width // TILE_W
        s_cap = seg_ref.shape[1]
        n_chunks = s_cap // seg_chunk

        row = jax.lax.broadcasted_iota(jnp.int32, (1, STRIP_ROWS), 1)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_W), 1)

        out_ref[0] = jnp.zeros((STRIP_ROWS, width), jnp.float32)

        for ky in range(k):
            oy = jnp.float32(offs[ky])
            cy = fdiv((max_y - (i * STRIP_ROWS + row)).astype(jnp.float32) + oy,
                      scale)
            cy_hi = cy[0, 0]
            cy_lo = cy[0, STRIP_ROWS - 1]

            # per sub-column: tile cx vectors and edges
            cx_tiles = []   # [kx][tile] -> (1, TILE_W)
            tile_lo = []    # [kx][tile+1] scalars
            cx_end = []
            for kx in range(k):
                ox = jnp.float32(offs[kx])
                tiles_kx = [
                    fdiv((min_x + t * TILE_W + col).astype(jnp.float32) + ox,
                         scale)
                    for t in range(n_tiles)
                ]
                end = fdiv((min_x + width).astype(jnp.float32) + ox, scale)
                cx_tiles.append(tiles_kx)
                tile_lo.append([c[0, 0] for c in tiles_kx] + [end])
                cx_end.append(end)

            wind_ref[:] = jnp.zeros((k, STRIP_ROWS, width), jnp.int32)

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

                @pl.when((hull_max + 1.0 >= cy_lo) & (hull_min - 1.0 <= cy_hi))
                def _():
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
                    t0 = jnp.where(lin, t_lin, fdiv(py01 + sq, a))
                    v0b = (lin & (denom != 0)) | (jnp.logical_not(lin) & has)
                    v0 = v0b & (t0 >= 0) & (t0 < 1)
                    t1 = fdiv(py01 - sq, a)
                    v1 = has & (t1 >= 0) & (t1 < 1)
                    xx0 = (ax * t0 + bx) * t0 + p0x
                    xx1 = (ax * t1 + bx) * t1 + p0x
                    dy0 = a * t0 + (p1y - p0y)
                    sgn_lin = jnp.where(p0y < p2y, -1, 1)
                    s0 = jnp.where(
                        v0, jnp.where(lin, sgn_lin, jnp.where(dy0 > 0, -1, 1)), 0
                    ).astype(jnp.int32)
                    dy1 = a * t1 + (p1y - p0y)
                    s1 = jnp.where(v1, jnp.where(dy1 > 0, -1, 1), 0).astype(
                        jnp.int32
                    )
                    neg_inf = jnp.float32(-jnp.inf)
                    xx0m = jnp.where(s0 != 0, xx0, neg_inf)
                    xx1m = jnp.where(s1 != 0, xx1, neg_inf)

                    for kx in range(k):
                        carry = jnp.zeros((1, STRIP_ROWS), jnp.int32)
                        carry += jnp.sum(
                            jnp.where(xx0m >= cx_end[kx], s0, 0), axis=0,
                            keepdims=True,
                        )
                        carry += jnp.sum(
                            jnp.where(xx1m >= cx_end[kx], s1, 0), axis=0,
                            keepdims=True,
                        )
                        for t in range(n_tiles - 1, -1, -1):
                            lo = tile_lo[kx][t]
                            hi = tile_lo[kx][t + 1]
                            in0 = (xx0m >= lo) & (xx0m < hi)
                            in1 = (xx1m >= lo) & (xx1m < hi)
                            base = jnp.broadcast_to(
                                carry.T, (STRIP_ROWS, TILE_W)
                            )
                            sl = wind_ref[kx, :, pl.ds(t * TILE_W, TILE_W)]

                            @pl.when(jnp.any(in0 | in1))
                            def _():
                                sd0 = jnp.where(in0, s0, 0)
                                sd1 = jnp.where(in1, s1, 0)
                                xxT0 = xx0m.T
                                xxT1 = xx1m.T
                                sT0 = sd0.T
                                sT1 = sd1.T
                                cxt = cx_tiles[kx][t]
                                detail = jnp.zeros(
                                    (STRIP_ROWS, TILE_W), jnp.int32
                                )
                                for s in range(seg_chunk):
                                    detail += jnp.where(
                                        xxT0[:, s : s + 1] >= cxt,
                                        sT0[:, s : s + 1], 0,
                                    )
                                    detail += jnp.where(
                                        xxT1[:, s : s + 1] >= cxt,
                                        sT1[:, s : s + 1], 0,
                                    )
                                wind_ref[kx, :, pl.ds(t * TILE_W, TILE_W)] = (
                                    sl + base + detail
                                )

                            @pl.when(jnp.logical_not(jnp.any(in0 | in1)))
                            def _():
                                wind_ref[kx, :, pl.ds(t * TILE_W, TILE_W)] = (
                                    sl + base
                                )

                            carry += jnp.sum(
                                jnp.where(in0, s0, 0), axis=0, keepdims=True
                            )
                            carry += jnp.sum(
                                jnp.where(in1, s1, 0), axis=0, keepdims=True
                            )

                return 0

            jax.lax.fori_loop(0, n_chunks, chunk_body, 0)

            acc = out_ref[0]
            for kx in range(k):
                acc = acc + (wind_ref[kx] != 0).astype(jnp.float32)
            out_ref[0] = acc

        out_ref[0] = out_ref[0] * jnp.float32(1.0 / (k * k))

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "samples", "exact", "interpret",
                     "seg_chunk"),
)
def coverage_pallas_batch(
    segments, min_x, max_y, scale, *, height, width, samples=2,
    exact=True, interpret=False, seg_chunk=SEG_CHUNK,
):
    """Batched k x k supersampled coverage in one kernel launch.

    Same conventions as ``coverage.coverage_batch``; returns float32
    ``[B, height, width]`` in [0, 1].  height % 128 == 0, width % 128
    == 0.
    """
    b = segments.shape[0]
    assert height % STRIP_ROWS == 0 and width % TILE_W == 0
    soa = segments_to_soa(segments, chunk=seg_chunk)
    s8 = soa.shape[1]
    min_x = min_x.reshape(1, b).astype(jnp.int32)
    max_y = max_y.reshape(1, b).astype(jnp.int32)
    scale_arr = jnp.full((1, 1), scale, jnp.float32)

    grid = (b, height // STRIP_ROWS)
    return pl.pallas_call(
        _make_coverage_kernel(samples, exact, seg_chunk=seg_chunk),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, s8, 8), lambda b_, i: (b_, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, STRIP_ROWS, width), lambda b_, i: (b_, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, height, width), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((samples, STRIP_ROWS, width), jnp.int32),
        ],
        interpret=interpret,
    )(min_x, max_y, scale_arr, soa)
