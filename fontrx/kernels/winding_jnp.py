"""Vectorized ``jax.numpy`` winding fill — the XLA reference kernel.

Same math and float32 operation order as ``fontrx.kernels.oracle`` (and
hence ``src/tools/render_glyph.zig:35-73``), expressed as a jittable,
batchable XLA program.  Serves three roles:

1. correctness reference for the Pallas kernel (interpret-mode testing),
2. portable fallback backend (CPU/GPU),
3. the zero-Pallas-risk end-to-end slice (SURVEY §7 build order step 3).

Memory shape: the (segments x pixels) cross product is processed in
segment chunks under ``lax.fori_loop`` so peak live intermediates stay
at ``chunk * H * W`` regardless of glyph complexity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

SEG_CHUNK = 32


def winding_contrib(seg, cx, cy):
    """Winding contribution of segment parameter arrays against sample
    points.  ``seg``: float32 ``[..., 3, 2]`` (broadcastable against
    ``cx``/``cy``); returns int32 winding contributions summed over
    nothing — caller reduces.

    Operation-for-operation with ``oracle.winding_at``:
    degenerate branch (``render_glyph.zig:49-57``), reduced discriminant
    and two roots (``:58-69``), half-open ``t in [0,1)``, ``xx < cx``
    exclusion, sign from ``dy > 0``.
    """
    p0x, p0y = seg[..., 0, 0], seg[..., 0, 1]
    p1x, p1y = seg[..., 1, 0], seg[..., 1, 1]
    p2x, p2y = seg[..., 2, 0], seg[..., 2, 1]

    a = p0y - 2 * p1y + p2y
    ax = p0x - 2 * p1x + p2x
    bx = 2 * (p1x - p0x)

    # degenerate (linear in y)
    lin = a == 0
    denom = p2y - p0y
    t_lin = (cy - p0y) / denom
    xx_lin = (ax * t_lin + bx) * t_lin + p0x
    valid_lin = lin & (denom != 0) & (t_lin >= 0) & (t_lin < 1) & ~(xx_lin < cx)
    sign_lin = jnp.where(p0y < p2y, -1, 1).astype(jnp.int32)
    w = jnp.where(valid_lin, sign_lin, 0)

    # quadratic: two roots
    delta = cy * a + p1y * p1y - p0y * p2y
    has_roots = ~lin & (delta >= 0)
    sq = jnp.sqrt(jnp.where(delta >= 0, delta, 0.0))
    for root_sign in (1.0, -1.0):
        t = ((p0y - p1y) + jnp.float32(root_sign) * sq) / a
        xx = (ax * t + bx) * t + p0x
        valid = has_roots & (t >= 0) & (t < 1) & ~(xx < cx)
        dy = a * t + (p1y - p0y)
        contrib = jnp.where(dy > 0, -1, 1).astype(jnp.int32)
        w = w + jnp.where(valid, contrib, 0)
    return w


def _winding_single(segments, cx, cy):
    """Winding map for one glyph: ``segments [S,3,2]``, ``cx [W]``,
    ``cy [H]`` -> int32 ``[H, W]``, chunked over segments."""
    s = segments.shape[0]
    n_chunks = (s + SEG_CHUNK - 1) // SEG_CHUNK
    pad = n_chunks * SEG_CHUNK - s
    seg = jnp.pad(segments, ((0, pad), (0, 0), (0, 0)))  # zero pad is inert
    seg = seg.reshape(n_chunks, SEG_CHUNK, 3, 2)

    cxb = cx[None, None, :]  # [1, 1, W]
    cyb = cy[None, :, None]  # [1, H, 1]
    h, w = cy.shape[0], cx.shape[0]

    def body(i, acc):
        chunk = seg[i][:, None, None, :, :]  # [C, 1, 1, 3, 2]
        contrib = winding_contrib(chunk, cxb, cyb)  # [C, H, W]
        return acc + contrib.sum(axis=0, dtype=jnp.int32)

    return jax.lax.fori_loop(0, n_chunks, body, jnp.zeros((h, w), jnp.int32))


@functools.partial(jax.jit, static_argnames=("height", "width"))
def winding_batch(
    segments, min_x, max_y, scale, *, height, width, sample_offset=(0.0, 0.0)
):
    """Batched winding maps with per-glyph grid anchors.

    - ``segments``: float32 ``[B, S, 3, 2]`` (zero-padded)
    - ``min_x``, ``max_y``: int32 ``[B]`` pixel-space anchors
    - ``scale``: float32 scalar (pixels per font unit)
    - ``sample_offset``: (ox, oy) sub-pixel sample offsets in pixel
      units (MSAA); (0, 0) is bit-neutral vs the oracle grid.
    -> int32 ``[B, height, width]``, row 0 at the top.

    Sample coords follow ``render_glyph.zig:26-27``: integer add/sub
    first, then a single f32 divide.
    """
    scale = jnp.asarray(scale, jnp.float32)
    ox = jnp.asarray(sample_offset[0], jnp.float32)
    oy = jnp.asarray(sample_offset[1], jnp.float32)

    def one(seg, mx, my):
        xi = (mx + jnp.arange(width, dtype=jnp.int32)).astype(jnp.float32)
        yi = (my - jnp.arange(height, dtype=jnp.int32)).astype(jnp.float32)
        return _winding_single(seg, (xi + ox) / scale, (yi + oy) / scale)

    return jax.vmap(one)(segments, min_x, max_y)


def winding_grid(segments, grid):
    """Single-glyph convenience over a ``RasterGrid`` (oracle-parity
    config): returns int32 ``[H, W]``."""
    out = winding_batch(
        segments[None],
        jnp.array([grid.min_x], jnp.int32),
        jnp.array([grid.max_y], jnp.int32),
        jnp.float32(grid.scale),
        height=grid.height,
        width=grid.width,
    )
    return out[0]
