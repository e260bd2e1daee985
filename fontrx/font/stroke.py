"""Stroke-to-outline conversion for the restricted SVG engine.

SVG ``stroke`` paint lowers onto the same winding-fill machinery as
everything else: the stroked region of a path is emitted as a CLOSED
outline polygon filled nonzero (the classic stroker construction —
FreeType's ft_stroker and every vector engine's fallback path do the
same).  Curves flatten to polylines first (tolerance in the caller's
units), each subpath offsets to one closed boundary per side, and
joins/caps insert their geometry at the vertices:

- **joins**: miter (single intersection point while the spec ratio
  ``1/sin(theta/2)`` stays within ``stroke-miterlimit``, else bevel),
  bevel (straight cut), round (sampled arc);
- **caps**: butt (no extension), square (half-width extension), round
  (sampled semicircle); a zero-length subpath with round/square caps
  draws the spec'd dot;
- **dashes**: ``stroke-dasharray``/``stroke-dashoffset`` split the
  flattened polyline by arc length into open dashes before offsetting.

Concave-side offset points simply cross (the outline self-intersects
there); nonzero winding fills such regions correctly, which is why
stroke outlines are always filled nonzero regardless of the element's
``fill-rule``.  Exactness anchor for tests: a straight segment with
butt or square caps strokes to exactly the 4-point rectangle a hand
construction gives, so stroke-vs-fill twins are pixel-identical.

Capability extension (the reference renders monochrome fills only,
``/root/reference/src/main.zig``); consumed by
:mod:`fontrx.font.svgdoc`.
"""

from __future__ import annotations

import math

__all__ = ["stroke_chains", "flatten_chain"]


def _flatten_cubic(p0, c1, c2, p1, tol, out):
    """Uniform de-Casteljau sampling; step count from the standard
    control-polygon deviation bound (d = max distance of controls from
    the chord; error <= 3/4 * d / n^2)."""
    dx, dy = p1[0] - p0[0], p1[1] - p0[1]
    d1 = abs((c1[0] - p0[0]) * dy - (c1[1] - p0[1]) * dx)
    d2 = abs((c2[0] - p0[0]) * dy - (c2[1] - p0[1]) * dx)
    chord = math.hypot(dx, dy)
    dev = max(d1, d2) / chord if chord > 1e-12 else max(
        math.hypot(c1[0] - p0[0], c1[1] - p0[1]),
        math.hypot(c2[0] - p0[0], c2[1] - p0[1]))
    n = max(1, int(math.ceil(math.sqrt(0.75 * dev / max(tol, 1e-9)))))
    for k in range(1, n + 1):
        t = k / n
        mt = 1.0 - t
        x = (mt * mt * mt * p0[0] + 3 * mt * mt * t * c1[0]
             + 3 * mt * t * t * c2[0] + t * t * t * p1[0])
        y = (mt * mt * mt * p0[1] + 3 * mt * mt * t * c1[1]
             + 3 * mt * t * t * c2[1] + t * t * t * p1[1])
        out.append((x, y))


def _flatten_quad(p0, c, p1, tol, out):
    dx, dy = p1[0] - p0[0], p1[1] - p0[1]
    chord = math.hypot(dx, dy)
    dev = (abs((c[0] - p0[0]) * dy - (c[1] - p0[1]) * dx) / chord
           if chord > 1e-12
           else math.hypot(c[0] - p0[0], c[1] - p0[1]))
    n = max(1, int(math.ceil(math.sqrt(0.5 * dev / max(tol, 1e-9)))))
    for k in range(1, n + 1):
        t = k / n
        mt = 1.0 - t
        x = mt * mt * p0[0] + 2 * mt * t * c[0] + t * t * p1[0]
        y = mt * mt * p0[1] + 2 * mt * t * c[1] + t * t * p1[1]
        out.append((x, y))


def flatten_chain(chain, tol: float):
    """One ``_PathBuilder`` subpath chain -> (polyline points, closed).

    The chain grammar is the builder's: ``("pt", p, on)`` vertices and
    quadratic controls, ``("cub", c1, c2, p)`` cubics, and an optional
    trailing ``("close",)`` sentinel marking an explicit Z."""
    pts: list[tuple[float, float]] = []
    closed = False
    pending_ctrl = None
    for item in chain:
        if item[0] == "close":
            closed = True
            continue
        if item[0] == "cub":
            _, c1, c2, p1 = item
            if not pts:
                pts.append(p1)
                continue
            _flatten_cubic(pts[-1], c1, c2, p1, tol, pts)
            pending_ctrl = None
            continue
        _, p, on = item
        if not on:
            pending_ctrl = p
            continue
        if pending_ctrl is not None and pts:
            _flatten_quad(pts[-1], pending_ctrl, p, tol, pts)
            pending_ctrl = None
        else:
            pts.append(p)
    # drop consecutive duplicates (they produce zero-length edges)
    out = []
    for p in pts:
        if not out or math.hypot(p[0] - out[-1][0],
                                 p[1] - out[-1][1]) > 1e-9:
            out.append(p)
    if closed and len(out) > 1 and math.hypot(
            out[0][0] - out[-1][0], out[0][1] - out[-1][1]) <= 1e-9:
        out.pop()
    return out, closed


def _arc_points(center, radius, a0, a1, tol):
    """Sampled arc from angle ``a0`` to ``a1`` (radians, signed sweep),
    endpoints EXCLUDED (callers add them exactly)."""
    sweep = a1 - a0
    if radius <= 0 or abs(sweep) < 1e-9:
        return []
    dphi = 2.0 * math.acos(max(-1.0, min(1.0, 1.0 - tol / radius)))
    dphi = max(min(dphi, math.pi / 4.0), 1e-3)
    n = int(math.ceil(abs(sweep) / dphi))
    return [
        (center[0] + radius * math.cos(a0 + sweep * k / n),
         center[1] + radius * math.sin(a0 + sweep * k / n))
        for k in range(1, n)
    ]


def _join_points(p, n_in, n_out, h, join, miterlimit, tol):
    """Offset-side geometry at a vertex where the side GAPS open:
    points from ``p + h*n_in`` to ``p + h*n_out`` exclusive of both
    (the edge walks add those)."""
    if join == "round":
        a0 = math.atan2(n_in[1], n_in[0])
        a1 = math.atan2(n_out[1], n_out[0])
        # shortest sweep (the gap side is always < pi)
        while a1 - a0 > math.pi:
            a1 -= 2.0 * math.pi
        while a1 - a0 < -math.pi:
            a1 += 2.0 * math.pi
        return _arc_points(p, h, a0, a1, tol)
    if join == "miter":
        dot = n_in[0] * n_out[0] + n_in[1] * n_out[1]
        denom = 1.0 + dot
        if denom > 1e-9:
            # spec ratio: miter length / stroke width = 1/sin(theta/2)
            # with theta the angle between the segments;
            # sin(theta/2) = sqrt((1+dot)/2) for unit normals
            ratio = 1.0 / math.sqrt(max(denom / 2.0, 1e-12))
            if ratio <= miterlimit:
                mx = (n_in[0] + n_out[0]) / denom
                my = (n_in[1] + n_out[1]) / denom
                return [(p[0] + h * mx, p[1] + h * my)]
    return []  # bevel (and miter fallback): straight cut


def _cap_points(p, n, d, h, cap, tol):
    """Cap geometry from ``p + h*n`` to ``p - h*n`` around the endpoint
    ``p`` with outward direction ``d`` (both endpoints EXCLUDED)."""
    if cap == "square":
        return [
            (p[0] + h * (n[0] + d[0]), p[1] + h * (n[1] + d[1])),
            (p[0] + h * (d[0] - n[0]), p[1] + h * (d[1] - n[1])),
        ]
    if cap == "round":
        a0 = math.atan2(n[1], n[0])
        ad = math.atan2(d[1], d[0])
        # sweep the half turn passing through the outward direction
        while ad - a0 > math.pi:
            ad -= 2.0 * math.pi
        while ad - a0 < -math.pi:
            ad += 2.0 * math.pi
        return _arc_points(p, h, a0, a0 + 2.0 * (ad - a0), tol)
    return []  # butt


def _side(pts, closed, h, join, miterlimit, tol):
    """Left-offset boundary of the polyline at distance ``h``: the
    forward walk's contribution (one closed loop when ``closed``, an
    open chain otherwise)."""
    n = len(pts)
    dirs = []
    for i in range(n - 1 + (1 if closed else 0)):
        a, b = pts[i], pts[(i + 1) % n]
        dx, dy = b[0] - a[0], b[1] - a[1]
        ln = math.hypot(dx, dy)
        dirs.append((dx / ln, dy / ln))
    normals = [(-d[1], d[0]) for d in dirs]
    out: list[tuple[float, float]] = []
    ne = len(dirs)

    def vertex(i_prev, i_next, p):
        n_in, n_out = normals[i_prev], normals[i_next]
        cross = (dirs[i_prev][0] * dirs[i_next][1]
                 - dirs[i_prev][1] * dirs[i_next][0])
        out.append((p[0] + h * n_in[0], p[1] + h * n_in[1]))
        if cross < -1e-12:  # the left side gaps open: join geometry
            out.extend(_join_points(p, n_in, n_out, h, join,
                                    miterlimit, tol))
        elif cross > 1e-12:
            # converging side: the exact boundary is the offset-line
            # intersection — the unlimited miter point (the raw edge
            # endpoints overshoot it as zero-width collinear spikes
            # whose winding cancels).  Guarded against near-reversal
            # blow-up; join style only dresses the gapping side.
            dot = n_in[0] * n_out[0] + n_in[1] * n_out[1]
            denom = 1.0 + dot
            if denom > 2e-4:  # ratio bound ~100x the half-width
                out.append((p[0] + h * (n_in[0] + n_out[0]) / denom,
                            p[1] + h * (n_in[1] + n_out[1]) / denom))
        out.append((p[0] + h * n_out[0], p[1] + h * n_out[1]))

    if closed:
        for i in range(ne):
            vertex((i - 1) % ne, i, pts[i])
    else:
        out.append((pts[0][0] + h * normals[0][0],
                    pts[0][1] + h * normals[0][1]))
        for i in range(1, n - 1):
            vertex(i - 1, i, pts[i])
        out.append((pts[-1][0] + h * normals[-1][0],
                    pts[-1][1] + h * normals[-1][1]))
    return out, dirs, normals


def _dedupe(poly):
    out = []
    for p in poly:
        if not out or math.hypot(p[0] - out[-1][0],
                                 p[1] - out[-1][1]) > 1e-9:
            out.append(p)
    while len(out) > 1 and math.hypot(
            out[0][0] - out[-1][0], out[0][1] - out[-1][1]) <= 1e-9:
        out.pop()
    return out


def _stroke_polyline(pts, closed, h, cap, join, miterlimit, tol):
    """One flattened subpath -> list of closed outline polygons."""
    if len(pts) < 2:
        if not pts or cap == "butt":
            return []
        # zero-length subpath: round cap draws a dot, square a square
        p = pts[0]
        if cap == "round":
            ring = [(p[0] + h, p[1])]
            ring += _arc_points(p, h, 0.0, 2.0 * math.pi, tol)
            return [ring]
        return [[(p[0] - h, p[1] - h), (p[0] + h, p[1] - h),
                 (p[0] + h, p[1] + h), (p[0] - h, p[1] + h)]]
    if closed and len(pts) < 3:
        closed = False
    if closed:
        left, _, _ = _side(pts, True, h, join, miterlimit, tol)
        rpts = pts[::-1]
        right, _, _ = _side(rpts, True, h, join, miterlimit, tol)
        return [_dedupe(left), _dedupe(right)]
    left, dirs, normals = _side(pts, False, h, join, miterlimit, tol)
    rpts = pts[::-1]
    right, rdirs, rnorms = _side(rpts, False, h, join, miterlimit, tol)
    # end cap: from left's last point around pts[-1] to right's first
    end_p, end_d, end_n = pts[-1], dirs[-1], normals[-1]
    start_p = pts[0]
    start_d = (-dirs[0][0], -dirs[0][1])   # outward at the start
    start_n = rnorms[-1]                   # right side's exit normal
    poly = list(left)
    poly += _cap_points(end_p, end_n, end_d, h, cap, tol)
    poly += right
    poly += _cap_points(start_p, start_n, start_d, h, cap, tol)
    return [_dedupe(poly)]


def _apply_dashes(pts, closed, dash, offset):
    """Split a flattened polyline into open dash polylines by arc
    length.  A closed subpath dashes as a ring starting at its first
    point (the first/last-dash merge nicety is out of scope)."""
    pattern = [d for d in dash if d >= 0]
    total = sum(pattern)
    if not pattern or total <= 0:
        return [(pts, closed)]
    if len(pattern) % 2:
        pattern = pattern + pattern  # odd lists repeat doubled (spec)
        total *= 2.0
    walk = pts + [pts[0]] if closed else pts
    # position inside the pattern from the offset
    pos = offset % total
    idx = 0
    while pos >= pattern[idx]:
        pos -= pattern[idx]
        idx = (idx + 1) % len(pattern)
    on = idx % 2 == 0
    remain = pattern[idx] - pos
    dashes: list[list[tuple[float, float]]] = []
    cur: list[tuple[float, float]] = [walk[0]] if on else []
    for a, b in zip(walk, walk[1:]):
        seg = math.hypot(b[0] - a[0], b[1] - a[1])
        t0 = 0.0
        while seg - t0 > remain + 1e-12:
            t0 += remain
            t = t0 / seg
            cut = (a[0] + (b[0] - a[0]) * t, a[1] + (b[1] - a[1]) * t)
            if on:
                cur.append(cut)
                dashes.append(cur)
                cur = []
            else:
                cur = [cut]
            on = not on
            idx = (idx + 1) % len(pattern)
            remain = pattern[idx]
        remain -= seg - t0
        if on:
            cur.append(b)
    if on and len(cur) > 1:
        dashes.append(cur)
    return [(d, False) for d in dashes if len(d) > 1]


def stroke_chains(
    chains,
    width: float,
    *,
    cap: str = "butt",
    join: str = "miter",
    miterlimit: float = 4.0,
    dash=None,
    dashoffset: float = 0.0,
    tol: float = 0.25,
):
    """Subpath chains -> stroke-outline chains (closed, all-on-curve,
    to be filled NONZERO).  ``width`` is the full stroke width in the
    chains' coordinate space; ``tol`` the flattening/arc tolerance in
    the same units."""
    h = width / 2.0
    if h <= 0:
        return []
    out_chains = []
    for chain in chains:
        pts, closed = flatten_chain(chain, tol)
        if not pts:
            continue
        pieces = ([(pts, closed)] if not dash
                  else _apply_dashes(pts, closed, dash, dashoffset))
        for ppts, pclosed in pieces:
            for poly in _stroke_polyline(
                    ppts, pclosed, h, cap, join, miterlimit, tol):
                if len(poly) >= 3:
                    out_chains.append(
                        [("pt", p, True) for p in poly] + [("close",)])
    return out_chains
