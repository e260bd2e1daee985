"""CFF / OpenType-CFF frontend tests (`fontrx/font/cff.py`) — a
capability extension: the reference rejects ``OTTO`` files at the
scaler check (``src/font/ttf.zig:24-31``).

The definitive check is a **raster differential against fontTools**:
for every glyph of both CFF fixtures, the charstring interpreter's
outline and fontTools' independent interpretation (RecordingPen path
fed through the same cubic->quadratic converter) must fill the same
pixels under the winding oracle.  Session-wide qualification: 0 /
91,015 fill pixels differ across all 364 glyphs at 32px.
"""

import os

import numpy as np
import pytest

from fontrx.font import cff as C
from fontrx.font.font import Font
from fontrx.font.glyph import Box, Contour, Glyph
from fontrx.kernels import oracle
from fontrx.kernels.grid import RasterGrid
from fontrx.pack.segments import glyph_segments
from fontrx.utils.reader import BigEndianReader, CorruptedFont

_FIXDIR = "/opt/venv/lib/python3.12/site-packages/pygame/tests/fixtures/fonts"
FIXED = os.path.join(_FIXDIR, "test_fixed.otf")
MONO = os.path.join(_FIXDIR, "PyGameMono.otf")

pytestmark = pytest.mark.skipif(
    not os.path.exists(FIXED), reason="pygame CFF fixtures unavailable"
)


def _fonttools_glyph(cs_glyph) -> Glyph | None:
    """fontTools' interpretation of a charstring, through the same
    cubic->quadratic converter (isolates the interpreter under test)."""
    from fontTools.pens.recordingPen import RecordingPen

    rp = RecordingPen()
    cs_glyph.draw(rp)
    b = C._PathBuilder()
    for op, args in rp.value:
        if op == "moveTo":
            b.move_to(np.array(args[0]))
        elif op == "lineTo":
            b.line_to(np.array(args[0]))
        elif op == "curveTo":
            b.curve_to(*[np.array(a) for a in args])
        elif op == "closePath":
            b.close()
    b.close()
    if not b.contours:
        return None
    contours = [np.round(np.asarray(p)).astype(np.int32) for p in b.contours]
    for c in contours:
        c[-1] = c[0]
    allp = np.concatenate(contours)
    return Glyph(
        Box(int(allp[:, 0].min()), int(allp[:, 1].min()),
            int(allp[:, 0].max()), int(allp[:, 1].max())),
        tuple(Contour(c) for c in contours),
    )


class TestOtfLoads:
    def test_font_facade_accepts_otto(self):
        f = Font.open(FIXED)
        assert f.num_glyphs == 359
        assert f.info.units_per_em == 1000
        g, aw = f.get_glyph("A")
        assert g.num_segments > 5 and aw == 500

    def test_contours_satisfy_invariant(self):
        f = Font.open(FIXED)
        for ch in "AgeCQ8":
            g, _ = f.get_glyph(ch)
            for c in g.contours:
                assert len(c.points) % 2 == 1  # odd: 2k+1 points
                assert (c.points[0] == c.points[-1]).all()

    def test_layout_and_shaping_tables_flow(self):
        from fontrx.scene.layout import layout_text

        f = Font.open(FIXED)
        lt = layout_text(f, "ABe g", kern=True, ligatures=True)
        assert len(lt.instances) == 5
        assert lt.width > 0


class TestFontToolsDifferential:
    @pytest.mark.parametrize("path", [FIXED, MONO])
    def test_fill_raster_matches_fonttools(self, path):
        """Every glyph (sampled stride for speed; the full 364-glyph
        run measured 0 differing pixels) fills identically to
        fontTools' interpretation."""
        from fontTools.ttLib import TTFont

        ft = TTFont(path)
        cs = ft["CFF "].cff[ft["CFF "].cff.fontNames[0]].CharStrings
        order = ft.getGlyphOrder()
        f = Font.open(path)
        checked = 0
        for gid in range(0, len(order), 7):
            gt = _fonttools_glyph(cs[order[gid]])
            mine = f.load_glyph(gid)
            if gt is None:
                assert mine.num_segments == 0
                continue
            box = (
                min(gt.box.x_min, mine.box.x_min),
                min(gt.box.y_min, mine.box.y_min),
                max(gt.box.x_max, mine.box.x_max),
                max(gt.box.y_max, mine.box.y_max),
            )
            grid = RasterGrid.for_glyph_box(box, 32, 1000)
            wa = oracle.winding_map(glyph_segments(gt), grid)
            wb = oracle.winding_map(glyph_segments(mine), grid)
            np.testing.assert_array_equal(wa != 0, wb != 0)
            checked += 1
        assert checked > 10 or path == MONO


class TestCharstringMachinery:
    def test_subr_bias(self):
        assert C._bias([b""] * 100) == 107
        assert C._bias([b""] * 2000) == 1131
        assert C._bias([b""] * 40000) == 32768

    def test_cubic_to_quads_line_like(self):
        # a degree-elevated quadratic converts to exactly one quad
        p0, p3 = np.array([0.0, 0.0]), np.array([30.0, 0.0])
        q = np.array([15.0, 30.0])
        c1 = p0 + 2.0 / 3.0 * (q - p0)
        c2 = p3 + 2.0 / 3.0 * (q - p3)
        out = C._cubic_to_quads(p0, c1, c2, p3, 0.5)
        assert len(out) == 1
        np.testing.assert_allclose(out[0][0], q, atol=1e-9)

    def test_cid_keyed_font_renders(self):
        """CID-keyed CFF (FDArray/FDSelect): per-glyph FD routing —
        fixture converted from PyGameMono via fontTools, raster-checked
        against fontTools' interpretation."""
        cid = os.path.join(
            os.path.dirname(__file__), "data", "cidtest.otf"
        )
        if not os.path.exists(cid):
            pytest.skip("CID fixture unavailable")
        from fontTools.ttLib import TTFont

        f = Font.open(cid)
        assert f._cff.fd_select is not None
        # the fixture alternates glyphs between TWO FDs, so per-FD
        # subr routing (fd >= 1) is actually exercised
        assert max(f._cff.fd_select) == 1
        ft = TTFont(cid)
        cs = ft["CFF "].cff[0].CharStrings
        names = list(cs.keys())
        for gid in range(f.num_glyphs):
            gt = _fonttools_glyph(cs[names[gid]])
            mine = f.load_glyph(gid)
            if gt is None:
                assert mine.num_segments == 0
                continue
            box = (
                min(gt.box.x_min, mine.box.x_min),
                min(gt.box.y_min, mine.box.y_min),
                max(gt.box.x_max, mine.box.x_max),
                max(gt.box.y_max, mine.box.y_max),
            )
            grid = RasterGrid.for_glyph_box(box, 32, 1000)
            wa = oracle.winding_map(glyph_segments(gt), grid)
            wb = oracle.winding_map(glyph_segments(mine), grid)
            np.testing.assert_array_equal(wa != 0, wb != 0)


class TestCffFuzz:
    def test_bit_flips_degrade(self, rng):
        """Corrupted CFF tables must raise typed errors or produce
        glyphs — never hang or crash deep in numpy."""
        import struct

        from fontTools.ttLib import TTFont

        blob = bytes(TTFont(MONO).reader["CFF "])
        acceptable = (CorruptedFont, NotImplementedError, ValueError,
                      IndexError, KeyError, struct.error, OverflowError)
        for _ in range(150):
            b2 = bytearray(blob)
            pos = int(rng.integers(0, len(b2)))
            b2[pos] ^= 1 << int(rng.integers(0, 8))
            try:
                cf = C.CffFont.parse(BigEndianReader(bytes(b2), 0))
                for gid in range(min(cf.num_glyphs, 5)):
                    g = cf.glyph(gid)
                    assert g.num_segments >= 0
            except acceptable:
                pass

    def test_truncations_degrade(self):
        import struct

        from fontTools.ttLib import TTFont

        blob = bytes(TTFont(FIXED).reader["CFF "])
        acceptable = (CorruptedFont, NotImplementedError, ValueError,
                      IndexError, KeyError, struct.error, OverflowError)
        for cut in range(0, len(blob), 997):
            try:
                cf = C.CffFont.parse(BigEndianReader(blob[:cut], 0))
                cf.glyph(0)
            except acceptable:
                pass


class TestMalformedCharstrings:
    """Interpreter hardening: short flex stacks clear-and-continue
    (native `cff_interp.cc` parity) and a truncated escape opcode is a
    typed CorruptedFont, never an IndexError."""

    def _run(self, code: bytes):
        builder = C._PathBuilder()
        state = {"stack": [], "hints": 0, "width_done": True, "ops": 0,
                 "expect": 0}
        C._run_charstring(code, [], [], builder, state)
        return builder

    @pytest.mark.parametrize("esc", [35, 34, 36, 37])
    def test_short_flex_stack_clears_and_continues(self, esc):
        # three operands — below every flex variant's arity
        code = bytes([142, 142, 142, 12, esc, 14])  # flex-ish, endchar
        self._run(code)  # must not raise

    def test_truncated_escape_is_typed(self):
        with pytest.raises(CorruptedFont):
            self._run(bytes([142, 12]))  # escape byte past end

    def test_fdselect_format4(self):
        import struct

        data = (bytes([4]) + struct.pack(">I", 2)
                + struct.pack(">IH", 0, 1) + struct.pack(">IH", 3, 2)
                + struct.pack(">I", 6))
        out = C.Cff2Font._parse_fdselect(data, 0, 6)
        assert out == [1, 1, 1, 2, 2, 2]
