"""Winding-oracle property tests (SURVEY §4 item 3)."""

import numpy as np

from fontrx.kernels import oracle
from fontrx.kernels.grid import RasterGrid
from fontrx.pack.segments import glyph_segments, pack_glyph


def square_segments(size=100):
    """A CCW (in math orientation) square as 4 line segments encoded as
    degenerate quadratics (control = midpoint)."""
    corners = [(0, 0), (size, 0), (size, size), (0, size)]
    segs = []
    for i in range(4):
        p0 = corners[i]
        p2 = corners[(i + 1) % 4]
        p1 = ((p0[0] + p2[0]) / 2, (p0[1] + p2[1]) / 2)
        segs.append([p0, p1, p2])
    return np.array(segs, dtype=np.float32)


class TestWindingBasics:
    def test_inside_square(self):
        segs = square_segments(100)
        w = oracle.winding_at(segs, np.float32(50), np.float32(50))
        assert abs(int(w)) == 1

    def test_outside_square(self):
        segs = square_segments(100)
        for cx, cy in [(-10, 50), (110, 50), (50, -10), (50, 110)]:
            w = oracle.winding_at(segs, np.float32(cx), np.float32(cy))
            assert int(w) == 0

    def test_contour_reversal_flips_sign(self):
        segs = square_segments(100)
        rev = segs[::-1, ::-1, :].copy()
        w1 = oracle.winding_at(segs, np.float32(50), np.float32(50))
        w2 = oracle.winding_at(rev, np.float32(50), np.float32(50))
        assert int(w1) == -int(w2)

    def test_segment_order_invariance(self, rng):
        segs = square_segments(100)
        perm = rng.permutation(len(segs))
        w1 = oracle.winding_at(segs, np.float32(30), np.float32(70))
        w2 = oracle.winding_at(segs[perm], np.float32(30), np.float32(70))
        assert int(w1) == int(w2)

    def test_zero_padding_inert(self, dejavu):
        g, _ = dejavu.get_glyph("Q")
        segs = glyph_segments(g)
        padded = np.concatenate([segs, np.zeros((37, 3, 2), np.float32)])
        grid = RasterGrid.for_glyph_box(
            (g.box.x_min, g.box.y_min, g.box.x_max, g.box.y_max),
            64, dejavu.info.units_per_em,
        )
        np.testing.assert_array_equal(
            oracle.winding_map(segs, grid), oracle.winding_map(padded, grid)
        )

    def test_nested_contours_hole(self, dejavu):
        # 'O' has an outer contour and a hole: winding 0 in the hole,
        # nonzero in the ring
        g, _ = dejavu.get_glyph("O")
        segs = glyph_segments(g)
        grid = RasterGrid.for_glyph_box(
            (g.box.x_min, g.box.y_min, g.box.x_max, g.box.y_max),
            128, dejavu.info.units_per_em,
        )
        w = oracle.winding_map(segs, grid)
        h, wd = w.shape
        assert w[h // 2, wd // 2] == 0          # hole center
        assert w[h // 2, 3] != 0 or w[h // 2, 4] != 0  # left ring wall


class TestRenderModes:
    def grid_for(self, font, ch, size):
        g, _ = font.get_glyph(ch)
        segs = glyph_segments(g)
        grid = RasterGrid.for_glyph_box(
            (g.box.x_min, g.box.y_min, g.box.x_max, g.box.y_max),
            size, font.info.units_per_em,
        )
        return segs, grid

    def test_gray_is_winding_viz(self, dejavu):
        segs, grid = self.grid_for(dejavu, "A", 32)
        w = oracle.winding_map(segs, grid)
        gray = oracle.render_gray(segs, grid)
        np.testing.assert_array_equal(
            gray, np.clip(w * 20 + 100, 0, 255).astype(np.uint8)
        )

    def test_fill_nonzero_rule(self, dejavu):
        segs, grid = self.grid_for(dejavu, "A", 64)
        fill = oracle.render_fill(segs, grid)
        assert set(np.unique(fill)) <= {0, 255}
        frac = (fill == 255).mean()
        assert 0.1 < frac < 0.9  # a glyph, not empty/solid

    def test_grid_matches_reference_shape(self, dejavu):
        # reference grid: ceil-expanded bbox + 1 (render_glyph.zig:16-19)
        g, _ = dejavu.get_glyph("A")
        grid = RasterGrid.for_glyph_box(
            (g.box.x_min, g.box.y_min, g.box.x_max, g.box.y_max),
            256, dejavu.info.units_per_em,
        )
        scale = np.float32(256) / np.float32(2048)
        assert grid.width == int(np.ceil(np.float32(g.box.x_max) * scale)) - int(
            np.floor(np.float32(g.box.x_min) * scale)) + 1
        assert grid.height == int(np.ceil(np.float32(g.box.y_max) * scale)) - int(
            np.floor(np.float32(g.box.y_min) * scale)) + 1
