"""WOFF 1.0 container tests (capability extension — the reference
accepts bare 0x00010000 scalers only, ``src/font/ttf.zig:24-31``).

Fixtures are built in-test with fontTools (flavor='woff'), so the
differential oracle is the same font with and without the wrapper:
every table byte, outline, metric, and raster must survive the
container roundtrip exactly.
"""

import io
import struct
import zlib

import numpy as np
import pytest

from fontrx.font.font import Font
from fontrx.font.ttf import CorruptedFont

COLRTEST = "tests/data/colrtest.ttf"


@pytest.fixture(scope="module")
def woff_pair(tmp_path_factory):
    from fontTools.ttLib import TTFont

    tt = TTFont(COLRTEST)
    tt.flavor = "woff"
    buf = io.BytesIO()
    tt.save(buf)
    return COLRTEST, buf.getvalue()


class TestWoffDecode:
    def test_tables_roundtrip(self, woff_pair):
        path, woff_bytes = woff_pair
        plain = Font.open(path)
        wrapped = Font(woff_bytes)
        assert sorted(plain.tables) == sorted(wrapped.tables)
        for tag in plain.tables:
            a = plain._table_bytes(tag)
            b = wrapped._table_bytes(tag)
            if tag == b"head":
                # fontTools recomputes head.checkSumAdjustment (bytes
                # 8-11) and the modified timestamp (28-35) when saving
                a = a[:8] + b"\x00" * 4 + a[12:28] + b"\x00" * 8 + a[36:]
                b = b[:8] + b"\x00" * 4 + b[12:28] + b"\x00" * 8 + b[36:]
            assert a == b, tag

    def test_outlines_and_metrics_roundtrip(self, woff_pair):
        from fontrx.pack.segments import glyph_segments

        path, woff_bytes = woff_pair
        plain = Font.open(path)
        wrapped = Font(woff_bytes)
        assert np.array_equal(
            np.asarray(plain.advance_widths),
            np.asarray(wrapped.advance_widths))
        for ch in "ABC":
            g1, _ = plain.get_glyph(ch)
            g2, _ = wrapped.get_glyph(ch)
            np.testing.assert_array_equal(
                glyph_segments(g1), glyph_segments(g2))

    def test_color_layers_survive_container(self, woff_pair):
        path, woff_bytes = woff_pair
        plain = Font.open(path)
        wrapped = Font(woff_bytes)
        gid = plain.glyph_index("A")
        assert plain.color_layers(gid) == wrapped.color_layers(gid)

    def test_mixed_stored_and_compressed_tables(self, woff_pair):
        """fontTools stores incompressible tables raw — the fixture
        must exercise BOTH branches of the decoder."""
        _, woff_bytes = woff_pair
        n = struct.unpack_from(">H", woff_bytes, 12)[0]
        comp = stored = 0
        for i in range(n):
            _, _, cl, ol, _ = struct.unpack_from(
                ">4sIIII", woff_bytes, 44 + 20 * i)
            if cl == ol:
                stored += 1
            else:
                comp += 1
        assert comp > 0 and stored > 0

    def test_dejavu_render_through_woff(self, tmp_path):
        from fontTools.ttLib import TTFont

        from fontrx.cli.main import main
        from fontrx.io.qoi import decode

        src = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"
        woff_path = tmp_path / "d.woff"
        tt = TTFont(src)
        tt.flavor = "woff"
        tt.save(str(woff_path))
        out_w = tmp_path / "w.qoi"
        out_t = tmp_path / "t.qoi"
        assert main(["-f", str(woff_path), "-t", "Wf", "-m", "fill",
                     "-s", "48", "-o", str(out_w)]) == 0
        assert main(["-f", src, "-t", "Wf", "-m", "fill",
                     "-s", "48", "-o", str(out_t)]) == 0
        np.testing.assert_array_equal(
            decode(out_w.read_bytes()), decode(out_t.read_bytes()))


class TestWoffRobustness:
    def _header(self, woff: bytes, **patch) -> bytearray:
        b = bytearray(woff)
        return b

    def test_bad_length_field(self, woff_pair):
        _, woff = woff_pair
        b = bytearray(woff)
        struct.pack_into(">I", b, 8, len(woff) + 4)
        with pytest.raises(CorruptedFont):
            Font(bytes(b))

    def test_nonzero_reserved(self, woff_pair):
        _, woff = woff_pair
        b = bytearray(woff)
        struct.pack_into(">H", b, 14, 1)
        with pytest.raises(CorruptedFont):
            Font(bytes(b))

    def test_comp_longer_than_orig(self, woff_pair):
        _, woff = woff_pair
        b = bytearray(woff)
        # first directory entry: set origLength < compLength
        cl = struct.unpack_from(">I", b, 44 + 8)[0]
        struct.pack_into(">I", b, 44 + 12, max(cl - 1, 0))
        with pytest.raises(CorruptedFont):
            Font(bytes(b))

    def test_zlib_garbage(self, woff_pair):
        _, woff = woff_pair
        b = bytearray(woff)
        # corrupt the payload of the first COMPRESSED table
        n = struct.unpack_from(">H", b, 12)[0]
        for i in range(n):
            tag, off, cl, ol, _ = struct.unpack_from(
                ">4sIIII", b, 44 + 20 * i)
            if cl < ol:
                b[off : off + 2] = b"\xff\xff"
                break
        with pytest.raises(CorruptedFont):
            Font(bytes(b))

    def test_truncated_directory(self, woff_pair):
        _, woff = woff_pair
        with pytest.raises(CorruptedFont):
            Font(woff[:50])

    def test_woff2_clear_error(self):
        blob = b"wOF2" + b"\x00" * 60
        with pytest.raises(CorruptedFont, match="WOFF2"):
            Font(blob)

    def test_fuzz_truncations_never_crash(self, woff_pair):
        """Every truncation raises a parse-failure type (the facade
        fuzz contract: CorruptedFont or struct.error — truncations
        below 4 bytes miss the WOFF signature and fall to the sfnt
        parser); raw zlib.error must never escape the decoder."""
        _, woff = woff_pair
        for cut in range(0, len(woff), max(len(woff) // 97, 1)):
            try:
                Font(woff[:cut])
            except (CorruptedFont, struct.error):
                pass
            except zlib.error:
                pytest.fail("raw zlib.error escaped")
