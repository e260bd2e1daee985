"""WOFF2 container tests (capability extension — the reference accepts
bare 0x00010000 scalers only, ``src/font/ttf.zig:24-31``).

Differential oracle: fontTools' WOFF2 writer (fed by the ctypes Brotli
shim from ``fontrx/native/brotli.py``) builds the fixtures, and the
same font with and without the wrapper must parse to identical tables,
outlines, metrics, and rasters.  The glyf/loca transform means the
reconstructed ``glyf`` is NOT byte-identical to the source (flag
re-encoding is a free choice) — so outline equality is checked at the
segment level, where the spec demands exactness.

The collection path is exercised with a hand-built WOFF2-TTC encoder
(fontTools cannot write WOFF2 collections), including shared-table
entries.
"""

import io
import struct

import numpy as np
import pytest

from fontrx.font.font import Font
from fontrx.font.ttf import CorruptedFont
from fontrx.font.woff2 import (
    _KNOWN_TAGS,
    _read_255_uint16,
    _read_uint_base128,
    decode_woff2,
    is_woff2,
)
from fontrx.native import brotli
from fontrx.pack.segments import glyph_segments

COLRTEST = "tests/data/colrtest.ttf"
CJKTEST = "tests/data/cjktest.ttf"
ARABICTEST = "tests/data/arabictest.ttf"
VARTEST = "tests/data/vartest.ttf"
DEJAVU = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"

pytestmark = pytest.mark.skipif(
    not brotli.available(), reason="system libbrotlidec missing")


def _to_woff2(path: str, transformed=None) -> bytes:
    assert brotli.install_shim()
    from fontTools.ttLib import TTFont

    tt = TTFont(path)
    tt.flavor = "woff2"
    if transformed is not None:
        from fontTools.ttLib.woff2 import WOFF2FlavorData

        tt.flavorData = WOFF2FlavorData(transformedTables=transformed)
    buf = io.BytesIO()
    tt.save(buf)
    return buf.getvalue()


def _assert_same_outlines(plain: Font, wrapped: Font, gids=None):
    assert np.array_equal(
        np.asarray(plain.advance_widths),
        np.asarray(wrapped.advance_widths))
    n = len(plain.advance_widths)
    if gids is None:
        gids = range(n)
    for gid in gids:
        g1 = plain.load_glyph(gid)
        g2 = wrapped.load_glyph(gid)
        if g1 is None or g2 is None:
            assert (g1 is None) == (g2 is None), gid
            continue
        np.testing.assert_array_equal(
            glyph_segments(g1), glyph_segments(g2), err_msg=f"gid {gid}")


class TestVarints:
    def test_base128_values(self):
        assert _read_uint_base128(b"\x3f", 0) == (0x3F, 1)
        assert _read_uint_base128(b"\x81\x00", 0) == (0x80, 2)
        assert _read_uint_base128(b"\x8f\xff\xff\xff\x7f", 0) == (
            0xFFFFFFFF, 5)

    def test_base128_rejects_leading_zero(self):
        with pytest.raises(CorruptedFont):
            _read_uint_base128(b"\x80\x01", 0)

    def test_base128_rejects_overflow(self):
        with pytest.raises(CorruptedFont):
            _read_uint_base128(b"\x90\x80\x80\x80\x00", 0)

    def test_base128_rejects_truncation(self):
        with pytest.raises(CorruptedFont):
            _read_uint_base128(b"\x81", 1)

    def test_255uint16_branches(self):
        assert _read_255_uint16(b"\x00", 0) == (0, 1)
        assert _read_255_uint16(b"\xfc", 0) == (252, 1)
        assert _read_255_uint16(b"\xff\x00", 0) == (253, 2)
        assert _read_255_uint16(b"\xff\x2a", 0) == (295, 2)
        assert _read_255_uint16(b"\xfe\x00", 0) == (506, 2)
        assert _read_255_uint16(b"\xfd\x12\x34", 0) == (0x1234, 3)

    def test_255uint16_truncation(self):
        for blob in (b"", b"\xfd\x12", b"\xff", b"\xfe"):
            with pytest.raises(CorruptedFont):
                _read_255_uint16(blob, 0)


class TestWoff2Decode:
    def test_tables_roundtrip(self):
        plain = Font.open(COLRTEST)
        wrapped = Font(_to_woff2(COLRTEST))
        assert sorted(plain.tables) == sorted(wrapped.tables)
        for tag in plain.tables:
            if tag in (b"glyf", b"loca", b"head"):
                continue  # re-encoded / checksum-bearing
            assert plain._table_bytes(tag) == wrapped._table_bytes(tag), tag

    def test_all_glyph_outlines_roundtrip(self):
        _assert_same_outlines(Font.open(COLRTEST), Font(_to_woff2(COLRTEST)))
        _assert_same_outlines(
            Font.open(ARABICTEST), Font(_to_woff2(ARABICTEST)))

    def test_dense_cjk_corpus_roundtrips(self):
        """1025 glyphs of 200-500-segment outlines through the triplet
        decoder — the volume case."""
        _assert_same_outlines(Font.open(CJKTEST), Font(_to_woff2(CJKTEST)))

    def test_dejavu_composites_roundtrip(self):
        """Real-font sample incl. composite glyphs (accented latin)."""
        plain = Font.open(DEJAVU)
        wrapped = Font(_to_woff2(DEJAVU))
        gids = sorted({plain.glyph_index(c) for c in
                       "AÄÅÖÜéàçñ gqf fifl"} |
                      set(range(0, len(plain.advance_widths), 97)))
        _assert_same_outlines(plain, wrapped, gids)

    def test_hmtx_transform_reconstructs_exactly(self):
        """Version-1 hmtx transform: the omitted lsb arrays must come
        back as the glyphs' xMin values, byte-for-byte."""
        plain = Font.open(COLRTEST)
        w = _to_woff2(COLRTEST, transformed={"glyf", "loca", "hmtx"})
        # the directory must actually flag hmtx as transformed
        assert self_check_hmtx_flag(w)
        wrapped = Font(w)
        assert plain._table_bytes(b"hmtx") == wrapped._table_bytes(b"hmtx")
        _assert_same_outlines(plain, wrapped)

    def test_variable_font_through_woff2(self):
        plain = Font.open(VARTEST)
        wrapped = Font(_to_woff2(VARTEST))
        assert plain._table_bytes(b"gvar") == wrapped._table_bytes(b"gvar")
        for loc in ({}, {"wght": 700.0}, {"wght": 432.5}):
            plain.set_variation(loc)
            wrapped.set_variation(loc)
            _assert_same_outlines(plain, wrapped)

    def test_color_layers_survive_container(self):
        plain = Font.open(COLRTEST)
        wrapped = Font(_to_woff2(COLRTEST))
        gid = plain.glyph_index("A")
        assert plain.color_layers(gid) == wrapped.color_layers(gid)

    def test_dejavu_render_through_woff2(self, tmp_path):
        from fontrx.cli.main import main
        from fontrx.io.qoi import decode

        woff2_path = tmp_path / "d.woff2"
        woff2_path.write_bytes(_to_woff2(DEJAVU))
        out_w = tmp_path / "w.qoi"
        out_t = tmp_path / "t.qoi"
        assert main(["-f", str(woff2_path), "-t", "WÄf", "-m", "fill",
                     "-s", "48", "-o", str(out_w)]) == 0
        assert main(["-f", DEJAVU, "-t", "WÄf", "-m", "fill",
                     "-s", "48", "-o", str(out_t)]) == 0
        np.testing.assert_array_equal(
            decode(out_w.read_bytes()), decode(out_t.read_bytes()))


def self_check_hmtx_flag(w: bytes) -> bool:
    """Walk the WOFF2 directory; True iff hmtx carries transform 1."""
    num_tables = struct.unpack_from(">H", w, 12)[0]
    pos = 48
    for _ in range(num_tables):
        flags = w[pos]
        pos += 1
        idx = flags & 0x3F
        if idx == 0x3F:
            tag = w[pos : pos + 4]
            pos += 4
        else:
            tag = _KNOWN_TAGS[idx]
        version = (flags >> 6) & 0x03
        _, pos = _read_uint_base128(w, pos)
        transformed = (version != 3) if tag in (b"glyf", b"loca") \
            else (version != 0)
        if transformed:
            _, pos = _read_uint_base128(w, pos)
        if tag == b"hmtx":
            return version == 1
    return False


# ---------------------------------------------------------------------------
# hand-built WOFF2 collection encoder (fontTools cannot write these)

def _encode_base128(value: int) -> bytes:
    out = bytearray([value & 0x7F])
    value >>= 7
    while value:
        out.insert(0, 0x80 | (value & 0x7F))
        value >>= 7
    return bytes(out)


def _encode_255(value: int) -> bytes:
    if value < 253:
        return bytes([value])
    return b"\xfd" + struct.pack(">H", value)


def build_woff2_collection(fonts: "list[tuple[int, list[tuple[bytes, bytes]]]]",
                           share: bool = True) -> bytes:
    """Encode member fonts (flavor, [(tag, payload)]) as a WOFF2 TTC.

    All tables are written untransformed (version 3 for glyf/loca, 0
    otherwise); identical (tag, payload) pairs are shared when
    ``share``.  This is a test fixture builder, not a shipping encoder.
    """
    entries: list[tuple[bytes, bytes]] = []
    index_of: dict[tuple[bytes, bytes], int] = {}
    font_indices = []
    for _, tables in fonts:
        idxs = []
        for tag, payload in tables:
            key = (tag, payload)
            if share and key in index_of:
                idxs.append(index_of[key])
                continue
            index_of[key] = len(entries)
            idxs.append(len(entries))
            entries.append(key)
        font_indices.append(idxs)

    directory = bytearray()
    stream = bytearray()
    for tag, payload in entries:
        version = 3 if tag in (b"glyf", b"loca") else 0
        if tag in _KNOWN_TAGS:
            flags = _KNOWN_TAGS.index(tag) | (version << 6)
            directory.append(flags)
        else:
            directory.append(0x3F | (version << 6))
            directory += tag
        directory += _encode_base128(len(payload))
        stream += payload

    coll = bytearray(struct.pack(">I", 0x00010000))
    coll += _encode_255(len(fonts))
    for (flavor, _), idxs in zip(fonts, font_indices):
        coll += _encode_255(len(idxs))
        coll += struct.pack(">I", flavor)
        for i in idxs:
            coll += _encode_255(i)

    compressed = brotli.compress(bytes(stream))
    header_len = 48
    body = bytes(directory) + bytes(coll) + compressed
    total = header_len + len(body)
    header = struct.pack(
        ">4sIIHHIIHHIIIII", b"wOF2", 0x74746366, total, len(entries), 0,
        0, len(compressed), 1, 0, 0, 0, 0, 0, 0)
    return header + body


def _font_tables(path: str) -> "list[tuple[bytes, bytes]]":
    f = Font.open(path)
    return [(tag, f._table_bytes(tag)) for tag in sorted(f.tables)]


class TestWoff2Collection:
    def test_two_member_collection(self):
        w = build_woff2_collection([
            (0x00010000, _font_tables(COLRTEST)),
            (0x00010000, _font_tables(ARABICTEST)),
        ])
        assert is_woff2(w)
        _assert_same_outlines(Font.open(COLRTEST), Font(w, index=0))
        _assert_same_outlines(Font.open(ARABICTEST), Font(w, index=1))

    def test_shared_tables_decode_once(self):
        """Both members are the same font — every table is shared, the
        directory holds one copy, and both indices open identically."""
        tables = _font_tables(COLRTEST)
        w = build_woff2_collection(
            [(0x00010000, tables), (0x00010000, tables)])
        n = struct.unpack_from(">H", w, 12)[0]
        assert n == len(tables)  # shared, not duplicated
        _assert_same_outlines(Font.open(COLRTEST), Font(w, index=0))
        _assert_same_outlines(Font.open(COLRTEST), Font(w, index=1))

    def test_out_of_range_member_index(self):
        w = build_woff2_collection([(0x00010000, _font_tables(COLRTEST))])
        with pytest.raises(CorruptedFont):
            Font(w, index=5)


class TestWoff2Robustness:
    @pytest.fixture(scope="class")
    def woff2(self):
        return _to_woff2(COLRTEST)

    def test_bad_length_field(self, woff2):
        b = bytearray(woff2)
        struct.pack_into(">I", b, 8, len(woff2) + 4)
        with pytest.raises(CorruptedFont):
            Font(bytes(b))

    def test_nonzero_reserved(self, woff2):
        b = bytearray(woff2)
        struct.pack_into(">H", b, 14, 1)
        with pytest.raises(CorruptedFont):
            Font(bytes(b))

    def test_corrupt_brotli_stream(self, woff2):
        b = bytearray(woff2)
        b[-8:] = b"\xff" * 8
        with pytest.raises(CorruptedFont):
            Font(bytes(b))

    def test_reserved_glyf_transform(self):
        tables = _font_tables(COLRTEST)
        w = bytearray(build_woff2_collection([(0x00010000, tables)]))
        # first directory byte whose tag is glyf: flip version 3 -> 1
        pos = 48
        for tag, payload in tables:
            flags = w[pos]
            if (flags & 0x3F) != 0x3F and \
                    _KNOWN_TAGS[flags & 0x3F] == b"glyf":
                w[pos] = (flags & 0x3F) | (1 << 6)
                break
            pos += (5 if (flags & 0x3F) == 0x3F else 1)
            pos += len(_encode_base128(len(payload)))
        with pytest.raises(CorruptedFont):
            decode_woff2(bytes(w))

    def test_truncation_fuzz_never_crashes(self, woff2):
        """Facade fuzz contract: truncations raise CorruptedFont or
        struct.error only (cuts below 4 bytes miss the signature and
        fall through to the sfnt parser)."""
        for cut in range(0, len(woff2), max(len(woff2) // 97, 1)):
            try:
                Font(woff2[:cut])
            except (CorruptedFont, struct.error):
                pass

    def test_bitflip_fuzz_never_crashes(self, woff2):
        """Single-byte corruption anywhere in the container either
        still parses or raises a parse-failure type."""
        rng = np.random.default_rng(0x20F2)
        blob = bytearray(woff2)
        for _ in range(400):
            pos = int(rng.integers(0, len(blob)))
            old = blob[pos]
            blob[pos] = int(rng.integers(0, 256))
            try:
                Font(bytes(blob))
            except (CorruptedFont, struct.error, ValueError):
                pass
            finally:
                blob[pos] = old
