"""GPOS pair-positioning tests (capability extension — the reference
does no kerning, ``src/Appli.zig:343-351``).

The strongest check is differential: DejaVu ships the same kerning
data in both the legacy ``kern`` table and GPOS, so the two lookups
must agree on every pair."""

import struct

import numpy as np
import pytest

from fontrx.font.font import Font
from fontrx.font.gpos import ClassDef, Coverage, GposKernTable
from fontrx.utils.reader import BigEndianReader

DEJAVU = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"
SERIF = "/usr/share/fonts/truetype/dejavu/DejaVuSerif.ttf"


class TestPrimitives:
    def test_coverage_format1(self):
        blob = struct.pack(">HHHHH", 1, 3, 5, 9, 12)
        cov = Coverage.parse(BigEndianReader(blob))
        np.testing.assert_array_equal(
            cov.rank(np.array([5, 9, 12, 6, 0])), [0, 1, 2, -1, -1]
        )

    def test_coverage_format2(self):
        blob = struct.pack(">HHHHHHHH", 2, 2, 10, 12, 0, 20, 21, 3)
        cov = Coverage.parse(BigEndianReader(blob))
        np.testing.assert_array_equal(
            cov.rank(np.array([10, 11, 12, 20, 21, 13, 9])),
            [0, 1, 2, 3, 4, -1, -1],
        )

    def test_classdef_format1(self):
        blob = struct.pack(">HHHHHH", 1, 10, 3, 7, 0, 7)
        cd = ClassDef.parse(BigEndianReader(blob))
        np.testing.assert_array_equal(
            cd.class_of(np.array([10, 11, 12, 9, 13])), [7, 0, 7, 0, 0]
        )

    def test_classdef_format2(self):
        blob = struct.pack(">HHHHHHHH", 2, 2, 5, 8, 2, 9, 9, 4)
        cd = ClassDef.parse(BigEndianReader(blob))
        np.testing.assert_array_equal(
            cd.class_of(np.array([5, 8, 9, 4, 10])), [2, 2, 4, 0, 0]
        )


class TestRealFonts:
    @pytest.mark.parametrize("path", [DEJAVU, SERIF])
    def test_gpos_agrees_with_kern_on_every_pair(self, path):
        f = Font.open(path)
        assert f.gpos_kerning is not None
        assert f.kerning is not f.gpos_kerning  # both tables present
        keys = f.kerning.keys
        lefts = (keys >> 16).astype(np.int64)
        rights = (keys & 0xFFFF).astype(np.int64)
        gv = f.gpos_kerning.lookup(lefts, rights)
        kv = f.kerning.values.astype(np.int32)
        np.testing.assert_array_equal(gv, kv)

    def test_unkerned_pairs_are_zero(self, dejavu):
        g = dejavu.gpos_kerning
        oo = dejavu.glyph_index("o")
        assert g.lookup(np.array([oo]), np.array([oo]))[0] == 0
        # glyph 0 (.notdef) never kerns
        assert g.lookup(np.array([0]), np.array([0]))[0] == 0

    def test_scalar_like_shapes(self, dejavu):
        g = dejavu.gpos_kerning
        a = dejavu.glyph_index("A")
        v = dejavu.glyph_index("V")
        out = g.lookup(a, v)  # scalars are promoted to 1-element arrays
        assert out.shape == (1,)
        assert out[0] == dejavu.kerning.lookup(
            np.array([a]), np.array([v])
        )[0]


class TestMarkToBase:
    """GPOS lookup 4 (combining diacritics) — validated against
    DejaVu's own precomposed composites."""

    def test_attach_known_pair(self, dejavu):
        mt = dejavu.mark_positioning
        assert mt is not None and len(mt.subtables) > 0
        e = dejavu.glyph_index("e")
        acute = dejavu.glyph_index(chr(0x0301))
        assert mt.is_mark(acute)
        assert not mt.is_mark(e)
        d = mt.attach(e, acute)
        assert d is not None
        dx, dy = d
        # lands horizontally inside the base's advance, vertically sane
        assert 0 < dx < int(dejavu.advance_widths[e]) + 600
        assert abs(dy) < 1000
        # non-mark pair does not attach
        assert mt.attach(e, dejavu.glyph_index("x")) is None

    def test_composed_matches_precomposed_ink(self, dejavu):
        import numpy as np

        from fontrx.kernels import oracle
        from fontrx.pack.segments import glyph_segments

        # NFC in the layout now (correctly) prefers the precomposed
        # glyph, so the anchor math is exercised directly: place the
        # mark via mark_positioning.attach and compare ink against the
        # font's own precomposed composite
        e = dejavu.glyph_index("e")
        acute = dejavu.glyph_index(chr(0x0301))
        dx, dy = dejavu.mark_positioning.attach(e, acute)
        placements = [(e, 0.0, 0.0), (acute, float(dx), float(dy))]
        scale = np.float32(96 / dejavu.info.units_per_em)
        W, H = 96, 128
        xs = np.arange(W).astype(np.float32) / scale
        ys = ((H - 32) - np.arange(H)).astype(np.float32) / scale
        comp = np.zeros((H, W), bool)
        for gid, ix, iy in placements:
            segs = glyph_segments(dejavu.load_glyph(gid)) + np.float32(
                [ix, iy]
            )
            comp |= oracle.winding_at(
                segs.astype(np.float32), xs[None, :], ys[:, None]
            ) != 0
        pre = oracle.winding_at(
            glyph_segments(dejavu.load_glyph(dejavu.glyph_index(chr(0xE9)))),
            xs[None, :], ys[:, None],
        ) != 0
        iou = (comp & pre).sum() / (comp | pre).sum()
        assert iou > 0.95, iou

    def test_mark_consumes_no_advance(self, dejavu):
        from fontrx.scene.layout import layout_text

        # x + combining acute has no precomposed form, so the mark
        # path (not NFC composition) is what's exercised
        plain = layout_text(dejavu, "xo", marks=True)
        marked = layout_text(dejavu, "x" + chr(0x0301) + "o", marks=True)
        # the x lands at the same pen position with or without the mark
        assert marked.instances[2].x == plain.instances[1].x
        assert marked.width == plain.width

    def test_kerning_skips_marks(self, dejavu):
        from fontrx.scene.layout import layout_text

        kerned = layout_text(dejavu, "AV", kern=True, marks=True)
        # A + combining ring composes (Å) — use x + combining ring
        # before V... x has no V kern pair; instead pin with A + a
        # NON-composable mark (U+0484) that DejaVu anchors
        with_mark = layout_text(
            dejavu, "A" + chr(0x0484) + "V", kern=True, marks=True
        )
        assert with_mark.instances[2].x == kerned.instances[1].x

    def test_marks_off_by_default(self, dejavu):
        from fontrx.scene.layout import layout_text

        lt = layout_text(dejavu, "x" + chr(0x0301))
        # reference-exact default: the mark advances like any glyph
        assert lt.instances[1].x == float(
            dejavu.advance_widths[dejavu.glyph_index("x")]
        )


class TestMarkToMark:
    """GPOS lookup 6 (mkmk): stacked diacritics attach to the previous
    mark, not the base."""

    def test_stacking(self, dejavu):
        from fontrx.scene.layout import layout_text

        mm = dejavu.mark_to_mark
        assert mm is not None and len(mm.subtables) > 0
        dot = dejavu.glyph_index(chr(0x0307))    # combining dot above
        acute = dejavu.glyph_index(chr(0x0301))  # combining acute
        d = mm.attach(dot, acute)
        assert d is not None and d[1] > 0  # stacks upward

        lt = layout_text(dejavu, "q" + chr(0x0307) + chr(0x0301), marks=True)
        assert len(lt.instances) == 3
        base, first, second = lt.instances
        assert first.y >= base.y
        assert second.y > first.y      # second mark rides above the first
        assert second.x == first.x + d[0]
        # neither mark advanced the pen
        assert lt.width == float(
            dejavu.advance_widths[dejavu.glyph_index("q")]
        )

    def test_base_resets_stack(self, dejavu):
        from fontrx.scene.layout import layout_text

        # mark after a NEW base attaches to that base, not the old stack
        lt = layout_text(
            dejavu, "x" + chr(0x0301) + "q" + chr(0x0301), marks=True
        )
        m1, m2 = lt.instances[1], lt.instances[3]
        assert m2.x > m1.x             # second accent moved to the 'o'
        assert m2.y == lt.instances[2].y + (
            dejavu.mark_positioning.attach(
                dejavu.glyph_index("o"), dejavu.glyph_index(chr(0x0301))
            )[1]
        )
