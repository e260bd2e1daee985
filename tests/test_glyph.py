"""Contour-normalization invariant tests (``Glyph.zig:11-74`` semantics)."""
# (repeat-flag RLE length case lives in test_ttf.py)

import numpy as np

from fontrx.font.glyph import _normalize_contour, _trunc_midpoint
from fontrx.utils.fixed_point import div_trunc


def norm(pts_on):
    pts = np.array([(x, y) for x, y, _ in pts_on], dtype=np.int32)
    on = np.array([o for _, _, o in pts_on], dtype=bool)
    return _normalize_contour(pts, on)


class TestNormalization:
    def test_all_on_curve_square(self):
        out = norm([(0, 0, True), (0, 10, True), (10, 10, True), (10, 0, True)])
        # 4 points, all-on: midpoint between every pair -> 4 segments
        assert len(out) == 9
        np.testing.assert_array_equal(out[0], out[-1])
        # contour starts at the last TTF point; odd slots are midpoints:
        # out[0] == p3 = (10, 0); out[1] = mid(p3, p0) = (5, 0)
        assert tuple(out[0]) == (10, 0)
        assert tuple(out[1]) == (5, 0)
        assert tuple(out[2]) == (0, 0)
        assert tuple(out[3]) == (0, 5)
        assert tuple(out[4]) == (0, 10)

    def test_alternating_on_off(self):
        # on-off-on-off: no midpoints needed
        out = norm([(0, 0, True), (5, 10, False), (10, 0, True), (5, -10, False)])
        assert len(out) == 5
        assert tuple(out[0]) == (0, 0)
        assert tuple(out[1]) == (5, 10)
        assert tuple(out[2]) == (10, 0)
        assert tuple(out[3]) == (5, -10)
        assert tuple(out[4]) == (0, 0)

    def test_all_off_curve(self):
        # TTF allows fully off-curve contours: every pair gets an implied
        # on-curve midpoint, and the contour starts at mid(p_last, p0)
        out = norm([(0, 0, False), (10, 0, False), (10, 10, False), (0, 10, False)])
        assert len(out) == 9
        assert tuple(out[0]) == (0, 5)  # mid(p3=(0,10), p0=(0,0))
        assert tuple(out[1]) == (0, 0)
        np.testing.assert_array_equal(out[0], out[-1])

    def test_starts_with_off_curve_last_on(self):
        out = norm([(5, 5, False), (10, 0, True), (0, 0, True)])
        # last point on-curve -> contour starts (and ends) with it
        assert tuple(out[0]) == (0, 0)
        np.testing.assert_array_equal(out[0], out[-1])
        assert len(out) % 2 == 1

    def test_truncating_midpoint_negative(self):
        # (-3 + -4) / 2 = -3.5 -> trunc to -3 (Zig @divTrunc), not floor -4
        a = np.array([[-3, -3]], dtype=np.int32)
        b = np.array([[-4, 0]], dtype=np.int32)
        m = _trunc_midpoint(a, b)
        assert tuple(m[0]) == (-3, -1)

    def test_div_trunc_matches(self):
        for a in range(-9, 10):
            expect = int(a / 2)  # trunc toward zero
            assert div_trunc(a, 2) == expect


class TestInvariantOnRealFont:
    def test_even_odd_closed(self, dejavu):
        # even-index on-curve points must lie *on* the curve; check the
        # structural parts: odd total length, closure, and that every
        # quadratic's endpoints differ from its control generically
        for ch in "ABCjy&@g8":
            g, _ = dejavu.get_glyph(ch)
            for c in g.contours:
                assert len(c.points) % 2 == 1
                np.testing.assert_array_equal(c.points[0], c.points[-1])
                assert c.num_segments * 2 + 1 == len(c.points)
