"""Exact integer winding — the tie-free ground-truth oracle.

The reference ships a second, exact-arithmetic winding path
(``src/tools/render_glyph.zig:76-300``): 10 curve classes by
monotonicity, an ``include_p0`` tie-break for ray-through-vertex cases,
and root-free integer predicates.  Its author marks it broken
("still has some problem / TODO: fix it!", ``render_glyph.zig:157-159``;
"wrong implementation", ``README.md:25``).

This module provides the same capability with a *sound* construction:
**symbolic perturbation**.  The sample point ``(px, py)`` (integers, in
font units) is treated as ``(px, py + eps)`` for an infinitesimal
``eps > 0``; every tie (ray exactly through a vertex or a horizontal
extremum) then resolves consistently, and all decisions reduce to exact
integer sign tests — no floats anywhere.  For non-tie points the result
equals the float oracle; for ties it gives the canonical
just-above-the-ray answer.

Math per quadratic segment (p0, p1, p2), ray to +x from (px, py+eps):
``y(t) = A t^2 + B t + C0`` with ``A = p0y - 2 p1y + p2y``,
``B = 2 (p1y - p0y)``, ``C0 = p0y - py``; crossings are roots of
``y(t) = eps`` in ``t in [0, 1)`` with ``x(t) >= px``, signed by the
direction of ``y`` at the root (ascending => -1, matching the float
oracle's convention, ``render_glyph.zig:55,68``).

The rational root comparisons (t vs 0/1, x(t) vs px) are decided by
exact integer arithmetic on the polynomial coefficients; sqrt
comparisons square through with sign bookkeeping.  Python ints are
arbitrary precision, so nothing overflows.
"""

from __future__ import annotations

import math

import numpy as np


def _sqrt_floor(n: int) -> int:
    return math.isqrt(n)


def _cmp_sqrt(q: int, d: int) -> int:
    """sign(q - sqrt(d)) for integer q (any sign), integer d >= 0."""
    if q < 0:
        return -1
    qq = q * q
    if qq > d:
        return 1
    if qq < d:
        return -1
    return 0


def _x_at_root_ge_px(Ax, Bx, Cx, A, B, s, d):
    """Decide ``x(t) >= 0`` (Cx is already ``p0x - px``) for the root
    ``t = (-B + s*sqrt(d)) / (2A)`` of the y-quadratic (A != 0).

    x(t) = (Ax t^2 + Bx t + Cx).  Substituting and clearing the positive
    factor (2A)^2:

      N = Ax (B^2 + d) - 2 A B Bx + 4 A^2 Cx  +  s * sqrt(d) * (2 A Bx - 2 Ax B)

    so x(t) >= 0  <=>  N >= 0, decided exactly.
    """
    P = Ax * (B * B + d) - 2 * A * B * Bx + 4 * A * A * Cx
    Q = s * 2 * (A * Bx - Ax * B)  # coefficient of sqrt(d)
    # N = P + Q sqrt(d)
    if Q == 0:
        return P >= 0
    if d == 0:
        return P >= 0
    if P >= 0 and Q > 0:
        return True
    if P < 0 and Q < 0:
        return False
    # signs differ: compare |P| vs |Q| sqrt(d) by squaring
    if Q > 0:  # P < 0: N >= 0 <=> Q sqrt(d) >= -P <=> Q^2 d >= P^2
        return Q * Q * d >= P * P
    # Q < 0, P >= 0: N >= 0 <=> P >= -Q sqrt(d) <=> P^2 >= Q^2 d
    return P * P >= Q * Q * d


def _root_in_01(A, B, C0, s, d) -> bool:
    """Is the root ``t = (-B + s*sqrt(d)) / (2A)`` of
    ``A t^2 + B t + (C0 - eps)`` in ``[0, 1)``, for infinitesimal
    ``eps > 0``?

    Handled by exact comparisons with eps-aware tie-breaks:
    at a tie (t == 0 or t == 1 exactly for eps=0), the perturbed root
    moves by ``dt = eps / y'(t)`` — its sign decides inclusion.
    """
    twoA = 2 * A
    # t >= 0: compare (-B + s sqrt(d)) with 0, sign-adjusted by A
    num_sign = _num_sign(-B, s, d)
    t_sign = num_sign * (1 if twoA > 0 else -1)
    if t_sign < 0:
        return False
    if t_sign == 0:
        # t == 0 at eps=0: root is at p0 exactly (C0 == 0 case feeds
        # this).  Perturbed: dt = eps / y'(0) = eps / B ... if B == 0
        # the root is a double/extremum at t=0 handled by d's
        # perturbation; approximate by y' at the root: y'(t) = 2At + B
        # = s*sqrt(d) here.  dt has the sign of 1/y'.
        deriv_sign = _num_sign(0, s, d)  # sign of s*sqrt(d)
        if deriv_sign == 0:
            deriv_sign = 1 if B == 0 else (1 if B > 0 else -1)
        if deriv_sign < 0:
            return False  # root moves to t < 0
    # t < 1: (-B + s sqrt(d)) vs 2A
    num_minus = _diff_sign(-B - twoA, s, d)  # sign of (t-1)*2A numerator
    lt1_sign = num_minus * (1 if twoA > 0 else -1)
    if lt1_sign > 0:
        return False
    if lt1_sign == 0:
        # t == 1 tie: perturbed dt = eps / y'(1); include iff dt < 0
        deriv_sign = _num_sign(0, s, d)
        if deriv_sign == 0:
            deriv_sign = 1 if (2 * A + B) >= 0 else -1
        if deriv_sign > 0:
            return False  # moves to t >= 1 still
    return True


def _num_sign(q: int, s: int, d: int) -> int:
    """sign(q + s*sqrt(d))."""
    if d == 0:
        return 0 if q == 0 else (1 if q > 0 else -1)
    if s > 0:
        return -_cmp_sqrt(-q, d) if q < 0 else 1
    return _cmp_sqrt(q, d)


def _diff_sign(q: int, s: int, d: int) -> int:
    return _num_sign(q, s, d)


def winding_at_exact(segments, px: int, py: int) -> int:
    """Exact winding of integer point ``(px, py + eps)`` against
    integer-coordinate quadratic segments ``[S, 3, 2]``."""
    seg = np.asarray(segments)
    w = 0
    for p0x, p0y, p1x, p1y, p2x, p2y in seg.reshape(-1, 6).astype(np.int64):
        p0x, p0y = int(p0x), int(p0y)
        p1x, p1y = int(p1x), int(p1y)
        p2x, p2y = int(p2x), int(p2y)
        A = p0y - 2 * p1y + p2y
        B = 2 * (p1y - p0y)
        C0 = p0y - py          # y(t) - py = A t^2 + B t + C0; solve = eps
        Ax = p0x - 2 * p1x + p2x
        Bx = 2 * (p1x - p0x)
        Cx = p0x - px

        if A == 0:
            if B == 0:
                continue  # horizontal (or degenerate) — never crosses py+eps
            # t = (eps - C0)/B: in [0,1) with eps tie-break
            # t > 0 <=> (eps - C0)/B > 0:
            #   B>0: eps > C0 <=> C0 <= 0 ; B<0: eps < C0 <=> C0 > 0
            if B > 0:
                t_ge0 = C0 <= 0
                t_lt1 = C0 + B > 0   # t < 1 <=> eps - C0 < B <=> C0 + B > eps <=> C0+B >= 1 i.e. > 0
            else:
                t_ge0 = C0 > 0
                t_lt1 = C0 + B <= 0
            if not (t_ge0 and t_lt1):
                continue
            # x(t) >= px with t = (eps - C0)/B -> to first order t0 = -C0/B
            # x(t) - px = Ax t^2 + Bx t + Cx ; multiply by B^2 > 0:
            #   N = Ax C0^2 - Bx C0 B + Cx B^2 (+ O(eps))
            N = Ax * C0 * C0 - Bx * C0 * B + Cx * B * B
            if N < 0:
                continue
            if N == 0:
                # sample exactly on the curve: perturbation moves x by
                # eps * dx/dy = eps * x'(t)/y'(t); count iff moved x
                # still >= px <=> x'(t0)/B >= 0
                xp_num = 2 * Ax * (-C0) + Bx * B  # x'(t0) * B
                if xp_num < 0:
                    continue
            w += -1 if B > 0 else 1
            continue

        # quadratic: discriminant of A t^2 + B t + (C0 - eps):
        # d(eps) = B^2 - 4 A (C0 - eps) = d0 + 4 A eps
        d0 = B * B - 4 * A * C0
        if d0 < 0:
            continue
        if d0 == 0:
            # tangent ray: perturbed d = 4 A eps — two roots appear only
            # if A > 0 (curve opens up in y); they straddle the extremum
            # and contribute +1 and -1 at the same x to first order —
            # net zero.  A < 0: no real roots.  Either way: skip.
            continue
        for s_root in (1, -1):
            if not _root_in_01(A, B, C0, s_root, d0):
                continue
            if not _x_at_root_ge_px(Ax, Bx, Cx, A, B, s_root, d0):
                continue
            # direction: y'(t) = 2A t + B = s*sqrt(d0) at the root
            dy_sign = s_root  # sign of s*sqrt(d0)), d0 > 0
            w += -1 if dy_sign > 0 else 1
    return w


def winding_map_exact(segments, grid) -> np.ndarray:
    """Exact winding over a ``RasterGrid`` whose samples land on integer
    font units (requires ``1/scale`` integer); int32 ``[H, W]``."""
    inv = 1.0 / grid.scale
    if abs(inv - round(inv)) > 1e-9:
        raise ValueError("exact winding needs integer font-unit samples")
    inv = int(round(inv))
    out = np.zeros((grid.height, grid.width), np.int32)
    for yy in range(grid.height):
        py = (grid.max_y - yy) * inv
        for xx in range(grid.width):
            px = (grid.min_x + xx) * inv
            out[yy, xx] = winding_at_exact(segments, px, py)
    return out
