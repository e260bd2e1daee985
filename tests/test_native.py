"""Native C++ fast-path tests: byte-parity with the Python
implementations (QOI encoder, glyph packer)."""

import numpy as np
import pytest

from fontrx import native


needs_native = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


@needs_native
class TestNativeQOI:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_byte_identical_random(self, seed):
        from fontrx.io.qoi import _encode_rgb_py

        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (40, 56, 3)).astype(np.uint8)
        assert native.qoi_encode_native(img) == _encode_rgb_py(img)

    def test_byte_identical_structured(self):
        from fontrx.io.qoi import _encode_rgb_py

        rng = np.random.default_rng(2)
        cases = [
            np.zeros((8, 8, 3), np.uint8),
            np.full((130, 1, 3), 7, np.uint8),
            np.cumsum(rng.integers(-2, 3, (64, 64, 3)), axis=1).astype(np.uint8),
            np.tile(rng.integers(0, 256, (1, 4, 3)).astype(np.uint8), (32, 8, 1)),
        ]
        for img in cases:
            assert native.qoi_encode_native(img) == _encode_rgb_py(img)

    def test_dispatcher_uses_native(self):
        from fontrx.io.qoi import decode, encode_rgb

        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
        assert np.array_equal(decode(encode_rgb(img)), img)


@needs_native
class TestNativePacker:
    def test_parity_with_python(self, dejavu):
        from fontrx.pack.segments import glyph_segments

        ids = np.array(
            [dejavu.glyph_index(chr(c)) for c in range(33, 127)], np.int32
        )
        segs, counts, boxes, flags = native.pack_glyphs_native(
            dejavu._reader.data, dejavu._loca,
            dejavu.tables[b"glyf"].offset, ids, 256,
        )
        for i, gid in enumerate(ids):
            if flags[i] != 0:
                continue
            py = glyph_segments(dejavu.load_glyph(int(gid)))
            assert counts[i] == len(py)
            np.testing.assert_array_equal(segs[i, : counts[i]], py)
            g = dejavu.load_glyph(int(gid))
            assert tuple(boxes[i]) == (
                g.box.x_min, g.box.y_min, g.box.x_max, g.box.y_max,
            )

    def test_compound_flagged(self, dejavu):
        # é is a compound glyph in DejaVu
        gid = dejavu.glyph_index("é")
        _, _, _, flags = native.pack_glyphs_native(
            dejavu._reader.data, dejavu._loca,
            dejavu.tables[b"glyf"].offset,
            np.array([gid], np.int32), 64,
        )
        assert flags[0] == 1

    def test_empty_glyph_ok(self, dejavu):
        gid = dejavu.glyph_index(" ")
        segs, counts, _, flags = native.pack_glyphs_native(
            dejavu._reader.data, dejavu._loca,
            dejavu.tables[b"glyf"].offset,
            np.array([gid], np.int32), 64,
        )
        assert flags[0] == 0 and counts[0] == 0
        assert not segs.any()

    def test_pack_charset_native_matches_python(self, dejavu):
        from fontrx.engine.atlas import pack_charset

        text = "Héllo, Wörld!"  # mix of simple + compound
        a = pack_charset(dejavu, text, use_native=True)
        b = pack_charset(dejavu, text, use_native=False)
        assert a.capacity == b.capacity
        np.testing.assert_array_equal(a.seg_counts, b.seg_counts)
        np.testing.assert_array_equal(a.segments, b.segments)
        np.testing.assert_array_equal(a.boxes, b.boxes)
        np.testing.assert_array_equal(a.advance_widths, b.advance_widths)


class TestNativeCffInterp:
    """The C++ Type 2 interpreter (`native/src/cff_interp.cc`) must be
    BIT-IDENTICAL to the Python one: same double math, op for op
    (measured 10x faster on the 359-glyph fixture)."""

    OTF = ("/opt/venv/lib/python3.12/site-packages/pygame/tests/"
           "fixtures/fonts/test_fixed.otf")

    def _tables(self, path, tag):
        from fontTools.ttLib import TTFont

        return bytes(TTFont(path).reader[tag])

    def test_cff_parity_every_glyph(self):
        import os

        import fontrx.native as N
        from fontrx.font import cff as C
        from fontrx.utils.reader import BigEndianReader

        if not N.available() or not os.path.exists(self.OTF):
            pytest.skip("native lib or fixture unavailable")
        blob = self._tables(self.OTF, "CFF ")
        cf = C.CffFont.parse(BigEndianReader(blob, 0))
        nat = [cf.glyph(g) for g in range(cf.num_glyphs)]
        orig = N.available
        N.available = lambda: False
        try:
            cf2 = C.CffFont.parse(BigEndianReader(blob, 0))
            py = [cf2.glyph(g) for g in range(cf2.num_glyphs)]
        finally:
            N.available = orig
        for g, (a, b) in enumerate(zip(nat, py)):
            assert len(a.contours) == len(b.contours), g
            for ca, cb in zip(a.contours, b.contours):
                np.testing.assert_array_equal(ca.points, cb.points)

    def test_cff2_parity_across_locations(self):
        import os

        import fontrx.native as N
        from fontrx.font import cff as C
        from fontrx.utils.reader import BigEndianReader

        vf = os.path.join(
            os.path.dirname(__file__), "data", "vartest_cff2.otf"
        )
        if not N.available() or not os.path.exists(vf):
            pytest.skip("native lib or fixture unavailable")
        blob = self._tables(vf, "CFF2")
        for coords in (None, np.array([0.5]), np.array([1.0])):
            cf = C.Cff2Font.parse(BigEndianReader(blob, 0))
            nat = [cf.glyph(g, coords) for g in range(cf.num_glyphs)]
            orig = N.available
            N.available = lambda: False
            try:
                cf2 = C.Cff2Font.parse(BigEndianReader(blob, 0))
                py = [cf2.glyph(g, coords) for g in range(cf2.num_glyphs)]
            finally:
                N.available = orig
            for a, b in zip(nat, py):
                assert len(a.contours) == len(b.contours)
                for ca, cb in zip(a.contours, b.contours):
                    np.testing.assert_array_equal(ca.points, cb.points)
