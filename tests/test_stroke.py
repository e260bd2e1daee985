"""Stroke-to-outline conversion (`fontrx/font/stroke.py`): geometry
unit vectors (exact hand constructions for straight segments) plus the
SVG integration twins in test_svg.py."""

import math

import numpy as np

from fontrx.font.stroke import flatten_chain, stroke_chains


def _line_chain(p0, p1, closed=False):
    ch = [("pt", p0, True), ("pt", p1, True)]
    if closed:
        ch.append(("close",))
    return ch


def _poly(chain):
    return [it[1] for it in chain if it[0] == "pt"]


def _area(poly):
    s = 0.0
    for (x0, y0), (x1, y1) in zip(poly, poly[1:] + poly[:1]):
        s += x0 * y1 - x1 * y0
    return s / 2.0


class TestFlatten:
    def test_polyline_passthrough(self):
        pts, closed = flatten_chain(
            [("pt", (0, 0), True), ("pt", (10, 0), True),
             ("pt", (10, 10), True)], 0.25)
        assert pts == [(0, 0), (10, 0), (10, 10)]
        assert not closed

    def test_close_sentinel(self):
        pts, closed = flatten_chain(
            _line_chain((0, 0), (10, 0), closed=True), 0.25)
        assert closed

    def test_quadratic_within_tolerance(self):
        # quad from (0,0) to (100,0) with control (50,50): max
        # deviation of the flattened polyline from the curve is <= tol
        chain = [("pt", (0, 0), True), ("pt", (50, 50), False),
                 ("pt", (100, 0), True)]
        pts, _ = flatten_chain(chain, 0.5)
        assert len(pts) > 4

        def q(t):
            mt = 1 - t
            return (mt * mt * 0 + 2 * mt * t * 50 + t * t * 100,
                    2 * mt * t * 50)
        # every flattened vertex lies ON the curve (uniform sampling)
        for x, y in pts:
            # invert x -> t via the quadratic's monotone x(t)
            ts = np.roots([100 - 2 * 100 / 2, 100, -x])  # fallback scan
            best = min(
                (abs(q(t)[0] - x) + abs(q(t)[1] - y))
                for t in np.linspace(0, 1, 2001))
            assert best < 0.3

    def test_cubic_endpoint_exact(self):
        chain = [("pt", (0, 0), True),
                 ("cub", (30, 40), (70, 40), (100, 0))]
        pts, _ = flatten_chain(chain, 0.25)
        assert pts[0] == (0, 0)
        assert pts[-1] == (100, 0)


class TestStrokeExact:
    """Straight segments stroke to EXACT hand constructions — the
    anchor for the SVG stroke-vs-fill pixel twins."""

    def test_butt_line_is_rect(self):
        out = stroke_chains([_line_chain((200, 500), (800, 500))],
                            100, cap="butt")
        assert len(out) == 1
        poly = _poly(out[0])
        assert sorted(poly) == sorted(
            [(200.0, 550.0), (800.0, 550.0), (800.0, 450.0),
             (200.0, 450.0)])

    def test_square_cap_extends_half_width(self):
        out = stroke_chains([_line_chain((200, 500), (800, 500))],
                            100, cap="square")
        poly = _poly(out[0])
        xs = [p[0] for p in poly]
        ys = [p[1] for p in poly]
        assert min(xs) == 150.0 and max(xs) == 850.0
        assert min(ys) == 450.0 and max(ys) == 550.0
        assert len(poly) == 8  # 2 side points + 2 cap points per end

    def test_round_cap_area(self):
        out = stroke_chains([_line_chain((0, 0), (100, 0))],
                            10, cap="round", tol=0.01)
        a = abs(_area(_poly(out[0])))
        expect = 100 * 10 + math.pi * 25  # rect + two half-disks
        assert abs(a - expect) / expect < 0.01

    def test_closed_square_miter_is_two_rects(self):
        sq = [("pt", (300, 300), True), ("pt", (700, 300), True),
              ("pt", (700, 700), True), ("pt", (300, 700), True),
              ("close",)]
        out = stroke_chains([sq], 60, join="miter")
        assert len(out) == 2
        a, b = _poly(out[0]), _poly(out[1])
        if abs(_area(a)) < abs(_area(b)):
            a, b = b, a
        outer, inner = a, b
        # right-angle miter tips ARE the rect corners; intermediate
        # points are collinear on the rect edges, so region equality
        # pins as: every vertex ON the rect boundary + exact area
        for x, y in outer:
            assert x in (270.0, 730.0) or y in (270.0, 730.0)
            assert 270.0 <= x <= 730.0 and 270.0 <= y <= 730.0
        # the inner boundary may carry zero-width collinear spikes
        # (raw offset endpoints past the intersection; their winding
        # cancels) — every vertex lies ON an inner-rect edge LINE
        for x, y in inner:
            assert x in (330.0, 670.0) or y in (330.0, 670.0)
        assert abs(_area(outer)) == 460.0 * 460.0
        assert abs(_area(inner)) == 340.0 * 340.0
        # opposite orientations (annulus fills, hole empties, nonzero)
        assert _area(outer) * _area(inner) < 0

    def test_bevel_cuts_the_corner(self):
        chain = [("pt", (0, 0), True), ("pt", (100, 0), True),
                 ("pt", (100, 100), True)]
        out = stroke_chains([chain], 20, join="bevel")
        poly = _poly(out[0])
        # the outer corner is cut: both offset corner points present
        assert (100.0, -10.0) in poly and (110.0, 0.0) in poly
        # and the miter tip is NOT
        assert (110.0, -10.0) not in poly

    def test_miter_limit_falls_back_to_bevel(self):
        # 180-degree-ish turn: ratio exceeds any small limit
        chain = [("pt", (0, 0), True), ("pt", (100, 0), True),
                 ("pt", (0, 10), True)]
        lim = stroke_chains([chain], 20, join="miter", miterlimit=1.1)
        wide = stroke_chains([chain], 20, join="miter",
                             miterlimit=100.0)
        # the unlimited miter has one extra (tip) point
        assert len(_poly(wide[0])) == len(_poly(lim[0])) + 1

    def test_right_angle_miter_within_default_limit(self):
        chain = [("pt", (0, 0), True), ("pt", (100, 0), True),
                 ("pt", (100, 100), True)]
        out = stroke_chains([chain], 20, join="miter")
        assert (110.0, -10.0) in _poly(out[0])  # the miter tip


class TestDashes:
    def test_dash_splits_line(self):
        out = stroke_chains([_line_chain((0, 0), (100, 0))],
                            10, dash=[20, 5])
        # dashes at [0,20],[25,45],[50,70],[75,95] -> 4 rects
        assert len(out) == 4
        first = _poly(out[0])
        xs = sorted({p[0] for p in first})
        assert xs == [0.0, 20.0]

    def test_dashoffset_shifts_pattern(self):
        out = stroke_chains([_line_chain((0, 0), (100, 0))],
                            10, dash=[20, 5], dashoffset=10)
        first = _poly(out[0])
        assert max(p[0] for p in first) == 10.0  # first dash truncated

    def test_odd_dasharray_doubles(self):
        out = stroke_chains([_line_chain((0, 0), (100, 0))],
                            10, dash=[10])
        # [10] -> [10,10]: dashes at [0,10],[20,30],... -> 5 rects
        assert len(out) == 5

    def test_zero_pattern_ignored(self):
        out = stroke_chains([_line_chain((0, 0), (100, 0))],
                            10, dash=[0, 0])
        assert len(out) == 1


class TestDegenerate:
    def test_zero_length_round_cap_dot(self):
        out = stroke_chains(
            [[("pt", (50, 50), True), ("pt", (50, 50), True)]],
            10, cap="round", tol=0.01)
        assert len(out) == 1
        a = abs(_area(_poly(out[0])))
        assert abs(a - math.pi * 25) / (math.pi * 25) < 0.01

    def test_zero_length_butt_is_empty(self):
        out = stroke_chains(
            [[("pt", (50, 50), True), ("pt", (50, 50), True)]],
            10, cap="butt")
        assert out == []

    def test_zero_width_is_empty(self):
        assert stroke_chains([_line_chain((0, 0), (10, 0))], 0) == []
