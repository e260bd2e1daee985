"""Exact integer winding oracle tests: agreement with the float oracle
off ties, canonical tie resolution on them."""

import numpy as np
import pytest

from fontrx.kernels import oracle
from fontrx.kernels.oracle_exact import winding_at_exact
from fontrx.pack.segments import glyph_segments


def square(size=100):
    corners = [(0, 0), (size, 0), (size, size), (0, size)]
    segs = np.zeros((4, 3, 2), np.float32)
    for i in range(4):
        p0 = np.array(corners[i], np.float32)
        p2 = np.array(corners[(i + 1) % 4], np.float32)
        segs[i] = [p0, (p0 + p2) / 2, p2]
    return segs


class TestBasics:
    def test_inside_outside(self):
        segs = square(100)
        assert abs(winding_at_exact(segs, 50, 50)) == 1
        assert winding_at_exact(segs, 150, 50) == 0
        assert winding_at_exact(segs, -10, 50) == 0

    def test_ray_through_vertex_canonical(self):
        """The classic failure of naive winding: a ray exactly through a
        corner.  With eps-perturbation the answer equals sampling just
        above the corner row."""
        segs = square(100)
        # point level with the bottom edge, left of the square: ray
        # passes through both bottom corners; py+eps => inside-band rows
        w_on = winding_at_exact(segs, -10, 0)
        w_above = winding_at_exact(segs, -10, 1)
        assert w_on == w_above  # canonical: counts as just above
        # level with the top edge: py+eps is outside
        assert winding_at_exact(segs, -10, 100) == 0

    def test_on_curve_point(self):
        segs = square(100)
        # samples exactly on an edge follow the float oracle's inclusive
        # xx >= cx convention: on the LEFT edge both vertical crossings
        # count and cancel (winding 0); on the RIGHT edge only the right
        # crossing counts (winding +-1).  Verify parity with the float
        # oracle at the same points.
        for px in (0, 100):
            we = winding_at_exact(segs, px, 50)
            wf = int(oracle.winding_at(segs, np.float32(px), np.float32(50)))
            assert we == wf, px
        assert abs(winding_at_exact(segs, 100, 50)) == 1

    def test_segment_order_invariance(self, rng):
        segs = square(100)
        perm = rng.permutation(4)
        assert winding_at_exact(segs, 30, 70) == winding_at_exact(segs[perm], 30, 70)

    def test_reversal_flips(self):
        segs = square(100)
        rev = segs[::-1, ::-1, :].copy()
        assert winding_at_exact(segs, 50, 50) == -winding_at_exact(rev, 50, 50)


class TestAgainstFloatOracle:
    @pytest.mark.parametrize("ch", list("AQg8"))
    def test_agrees_off_ties(self, dejavu, ch):
        """On a coarse integer lattice, wherever the float oracle is
        locally stable (same winding at y +- 0.5), the exact oracle must
        agree with it."""
        g, _ = dejavu.get_glyph(ch)
        segs = glyph_segments(g)
        xs = np.linspace(g.box.x_min - 10, g.box.x_max + 10, 12).astype(int)
        ys = np.linspace(g.box.y_min - 10, g.box.y_max + 10, 12).astype(int)
        checked = 0
        for px in xs:
            for py in ys:
                w_above = int(
                    oracle.winding_at(segs, np.float32(px), np.float32(py + 0.25))
                )
                w_below = int(
                    oracle.winding_at(segs, np.float32(px), np.float32(py - 0.25))
                )
                if w_above != w_below:
                    continue  # near a horizontal feature; skip
                we = winding_at_exact(segs, int(px), int(py))
                # the exact point is py+eps: compare against the stable
                # float value
                assert we == w_above, (ch, px, py)
                checked += 1
        assert checked > 80  # most of the lattice is stable

    def test_eps_semantics_on_tie_rows(self, dejavu):
        """On a row passing exactly through on-curve points, the exact
        winding equals the float winding evaluated just above."""
        g, _ = dejavu.get_glyph("A")
        segs = glyph_segments(g)
        # baseline row (y=0) passes through several vertices of 'A'
        for px in range(g.box.x_min - 5, g.box.x_max + 5, 97):
            we = winding_at_exact(segs, px, 0)
            wf = int(oracle.winding_at(segs, np.float32(px), np.float32(0.125)))
            assert we == wf, px
