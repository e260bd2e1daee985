"""EBDT/EBLC monochrome/grayscale bitmap strikes (capability
extension — the reference has no bitmap-table support at all; fontrx
shares one decoder between CBDT/CBLC v3 and EBDT/EBLC v2,
``fontrx/font/cbdt.py``).

Differential oracle: fontTools' own EBDT decompiler re-reads the
fixture (``tests/data/make_fixtures.py::make_ebdttest`` — depths
1/2/4/8, index formats 1/3/4/5, image formats 1/2/5/6/8/9) and every
pixel must agree after linear expansion to 8-bit alpha.
"""

import numpy as np
import pytest

from fontrx.font.cbdt import _blit_max, _unpack_rows
from fontrx.font.font import Font

EBDTTEST = "tests/data/ebdttest.ttf"


@pytest.fixture(scope="module")
def font():
    return Font.open(EBDTTEST)


@pytest.fixture(scope="module")
def fonttools_strikes():
    from fontTools.ttLib import TTFont

    tt = TTFont(EBDTTEST)
    return tt["EBDT"].strikeData, tt["EBLC"].strikes


def _fonttools_vals(g, h, w, depth):
    """Pixel values via fontTools' row reader (independent decoder)."""

    class _M:
        pass

    m = _M()
    m.height, m.width = h, w
    out = np.zeros((h, w), np.uint16)
    for r in range(h):
        row = g.getRow(r, bitDepth=depth, metrics=m)
        bits = np.unpackbits(
            np.frombuffer(bytes(row), np.uint8))[: w * depth]
        if depth == 1:
            out[r] = bits
        else:
            wts = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint16)
            out[r] = (bits.reshape(w, depth).astype(np.uint16)
                      * wts).sum(1)
    return out


NAME_TO_CH = {"box": "A", "tri": "B", "comp": "C"}


class TestFontToolsDifferential:
    def test_every_simple_glyph_every_strike(self, font,
                                             fonttools_strikes):
        """Depths 1/2/4/8 across byte-aligned, bit-aligned, and
        metrics-in-index formats: pixel-exact vs fontTools."""
        strike_data, strikes = fonttools_strikes
        checked = 0
        for sd, strike in zip(strike_data, strikes):
            bst = strike.bitmapSizeTable
            ppem, depth = bst.ppemX, bst.bitDepth
            scale = 255 // ((1 << depth) - 1)
            for name, g in sd.items():
                if type(g).__name__.endswith(("_8", "_9")):
                    continue  # composites: structural test below
                if type(g).__name__.endswith("_5"):
                    m = strike.indexSubTables[0].metrics
                    h, w = m.height, m.width
                else:
                    h, w = g.metrics.height, g.metrics.width
                expected = (_fonttools_vals(g, h, w, depth)
                            * scale).astype(np.uint8)
                mine = font.embedded_bitmap(
                    font.glyph_index(NAME_TO_CH[name]), ppem)[0]
                np.testing.assert_array_equal(
                    mine, expected, err_msg=f"{ppem} {name}")
                checked += 1
        assert checked == 8  # 2 glyphs x 4 strikes

    def test_composites_compose_their_components(self, font):
        """Formats 8 (small metrics) and 9 (big): the composite is the
        max-blit of its components at their (dx, dy) offsets."""
        for ppem, size in ((16, 18), (32, 14)):
            box = font.embedded_bitmap(font.glyph_index("A"), ppem)[0]
            tri = font.embedded_bitmap(font.glyph_index("B"), ppem)[0]
            comp = font.embedded_bitmap(font.glyph_index("C"), ppem)[0]
            assert comp.shape == (size, size)
            expected = np.zeros((size, size), np.uint8)
            _blit_max(expected, box, 0, 0)
            _blit_max(expected, tri, 2, 2)
            np.testing.assert_array_equal(comp, expected, err_msg=str(ppem))


class TestStrikeSelection:
    def test_exact_only_by_default(self, font):
        gid = font.glyph_index("A")
        assert font.embedded_bitmap(gid, 16) is not None
        assert font.embedded_bitmap(gid, 17) is None
        assert font.embedded_bitmap(gid, 48) is None

    def test_best_strike_fallback(self, font):
        gid = font.glyph_index("A")
        r = font.embedded_bitmap(gid, 17, exact=False)
        assert r is not None and r[4] == 20
        r = font.embedded_bitmap(gid, 48, exact=False)
        assert r is not None and r[4] == 32  # largest available

    def test_sparse_index_misses_are_none(self, font):
        """Index format 4 at ppem 20 and format 5 at 24 carry glyphs
        {box, tri} only; comp and none must miss cleanly."""
        for ppem in (20, 24):
            assert font.embedded_bitmap(
                font.glyph_index("C"), ppem) is None
            assert font.embedded_bitmap(
                font.glyph_index("D"), ppem) is None

    def test_metrics_conventions(self, font):
        """small/big metrics land in the same (bx, bottom, advance)
        convention: bottom = bearingY - height."""
        for ppem, h in ((16, 16), (32, 12)):
            alpha, bx, bottom, adv, sp = font.embedded_bitmap(
                font.glyph_index("A"), ppem)
            assert (bx, bottom, adv, sp) == (1, -2, alpha.shape[1] + 2,
                                             ppem)

    def test_not_a_png_family(self, font):
        """glyph_image (the PNG accessor) must not misread raw
        bitmaps."""
        eb = font.ebdt
        strike = eb.exact_strike(16)
        assert eb.glyph_image(strike, font.glyph_index("A")) is None


class TestUnpackRows:
    def test_byte_aligned_row_padding(self):
        # 3px wide, depth 1: each row padded to one byte
        d = bytes([0b10100000, 0b01000000])
        a = _unpack_rows(d, 0, 2, 2, 3, 1, byte_aligned=True)
        np.testing.assert_array_equal(
            a, [[255, 0, 255], [0, 255, 0]])

    def test_bit_aligned_continuous(self):
        # 3px wide, depth 1, rows continue mid-byte: 101 010 -> 101010..
        d = bytes([0b10101000])
        a = _unpack_rows(d, 0, 1, 2, 3, 1, byte_aligned=False)
        np.testing.assert_array_equal(
            a, [[255, 0, 255], [0, 255, 0]])

    def test_depth_expansion_is_linear(self):
        # depth 2: values 0..3 -> 0, 85, 170, 255
        d = bytes([0b00011011])
        a = _unpack_rows(d, 0, 1, 1, 4, 2, byte_aligned=False)
        np.testing.assert_array_equal(a, [[0, 85, 170, 255]])

    def test_truncation_raises(self):
        with pytest.raises(ValueError):
            _unpack_rows(b"\x00", 0, 1, 4, 4, 8, byte_aligned=True)


class TestCliBitmaps:
    def test_fill_uses_strike_pixels(self, tmp_path):
        """--bitmaps at a strike ppem blits the embedded alpha: the
        16-ppem depth-1 'box' ring must appear verbatim in the page."""
        from fontrx.cli.main import main
        from fontrx.io.qoi import decode

        out = tmp_path / "o.qoi"
        assert main(["-f", EBDTTEST, "-t", "A", "-m", "fill", "-s", "16",
                     "--bitmaps", "-o", str(out)]) == 0
        img = decode(out.read_bytes())[..., 0]
        ys, xs = np.nonzero(img)
        assert len(ys) > 0
        crop = img[ys.min() : ys.min() + 16, xs.min() : xs.min() + 16]
        expected = Font.open(EBDTTEST).embedded_bitmap(
            Font.open(EBDTTEST).glyph_index("A"), 16)[0]
        np.testing.assert_array_equal(crop, expected)

    def test_glyph_without_strike_falls_back_to_outline(self, tmp_path):
        """'D' has no bitmap at any size: the hinted-outline square
        must still render alongside bitmap glyphs."""
        from fontrx.cli.main import main
        from fontrx.io.qoi import decode

        out = tmp_path / "o.qoi"
        assert main(["-f", EBDTTEST, "-t", "AD", "-m", "fill", "-s", "16",
                     "--bitmaps", "-o", str(out)]) == 0
        img = decode(out.read_bytes())[..., 0]
        # two distinct ink clusters: the strike and the outline
        cols = np.nonzero(img.any(axis=0))[0]
        gaps = np.diff(cols) > 1
        assert gaps.any()

    def test_no_strike_at_size_renders_all_outlines(self, tmp_path):
        from fontrx.cli.main import main
        from fontrx.io.qoi import decode

        out = tmp_path / "o.qoi"
        assert main(["-f", EBDTTEST, "-t", "AB", "-m", "fill", "-s", "48",
                     "--bitmaps", "-o", str(out)]) == 0
        img = decode(out.read_bytes())[..., 0]
        assert (img > 0).sum() > 0


class TestRobustness:
    def test_corrupt_ebdt_degrades_to_none(self, font):
        """Truncating EBDT mid-stream must yield None bitmaps (and a
        parse warning at worst), never an exception."""
        raw = open(EBDTTEST, "rb").read()
        for cut in (len(raw) // 2, len(raw) - 200, len(raw) - 50):
            f = Font(raw[:cut]) if cut > 12 else None
            if f is None:
                continue
            try:
                for ch in "ABCD":
                    for ppem in (16, 20, 24, 32):
                        try:
                            gid = f.glyph_index(ch)
                        except Exception:
                            continue
                        f.embedded_bitmap(gid, ppem)
            except Exception as e:
                from fontrx.font.ttf import CorruptedFont

                assert isinstance(e, CorruptedFont), e

    def test_bitflip_fuzz_inside_bitmap_tables(self):
        """Random single-byte corruption INSIDE the EBLC/EBDT table
        bytes: the embedded-bitmap path must degrade (None or a
        warning-logged unusable table), never raise — the decoder
        guards every read."""
        import struct as st

        raw = bytearray(open(EBDTTEST, "rb").read())
        n = st.unpack_from(">H", raw, 4)[0]
        spans = []
        for i in range(n):
            tag, _cs, off, ln = st.unpack_from(">4sIII", raw, 12 + 16 * i)
            if tag in (b"EBLC", b"EBDT"):
                spans.append((off, ln))
        assert len(spans) == 2
        rng = np.random.default_rng(0xEBD7)
        for _ in range(400):
            off, ln = spans[int(rng.integers(0, 2))]
            pos = off + int(rng.integers(0, ln))
            old = raw[pos]
            raw[pos] = int(rng.integers(0, 256))
            try:
                f = Font(bytes(raw))
                for ch in "ABCD":
                    for ppem in (16, 20, 24, 32):
                        f.embedded_bitmap(f.glyph_index(ch), ppem)
            finally:
                raw[pos] = old
