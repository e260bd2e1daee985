"""Charmap tests: cmap format 4/12 lookup, flatten-to-ranges equivalence,
selection logic (SURVEY §4 item 1)."""

import numpy as np
import pytest

from fontrx.font import ttf
from fontrx.font.charmap import CharGlyphMapping
from fontrx.utils.reader import BigEndianReader
from tests import ttf_builder as tb


def parse4(segments):
    blob = tb.build_cmap_format4(segments)
    r = BigEndianReader(blob)
    fmt = r.u16()
    assert fmt == 4
    return ttf.CmapFormat4.parse(r)


class TestFormat4:
    def test_delta_segment(self):
        sub = parse4([(65, 90, -64, None)])  # 'A'..'Z' -> 1..26
        assert sub.glyph_index(65) == 1
        assert sub.glyph_index(90) == 26
        assert sub.glyph_index(64) == 0
        assert sub.glyph_index(91) == 0

    def test_glyph_index_array_segment(self):
        ids = [7, 3, 9]
        sub = parse4([(100, 102, 0, ids)])
        assert [sub.glyph_index(c) for c in (100, 101, 102)] == ids
        assert sub.glyph_index(99) == 0

    def test_mixed_segments(self):
        sub = parse4([(65, 70, 10, None), (100, 101, 0, [42, 43])])
        assert sub.glyph_index(65) == 75
        assert sub.glyph_index(100) == 42
        assert sub.glyph_index(80) == 0

    def test_flatten_matches_direct_lookup(self):
        sub = parse4([(65, 90, -64, None), (100, 102, 0, [7, 3, 9]),
                      (0x4E00, 0x4E10, 5, None)])
        mapping = CharGlyphMapping(sub.collect_range_mappings())
        chars = np.arange(0, 0x5000)
        batch = mapping.glyph_indices(chars)
        for c in list(range(60, 130)) + list(range(0x4DF0, 0x4E20)):
            assert batch[c] == sub.glyph_index(c), c

    def test_wraparound_delta_split(self):
        # delta chosen so glyph ids wrap past 0xFFFF mid-segment: the
        # flatten splits at the wrap and maps the first half to glyph 0
        # (reference ``ttf.zig:470-487``)
        sub = parse4([(10, 20, 0xFFFA, None)])
        mapping = CharGlyphMapping(sub.collect_range_mappings())
        for c in range(10, 21):
            direct = sub.glyph_index(c)
            flat = mapping.glyph_index(c)
            if direct >= 0xFFF0:  # pre-wrap ids land in the glyph-0 range
                assert flat == 0
            else:
                assert flat == direct


class TestFormat12:
    def build(self, groups):
        blob = tb.build_cmap_format12(groups)
        r = BigEndianReader(blob)
        assert r.u16() == 12
        return ttf.CmapFormat12.parse(r)

    def test_lookup(self):
        sub = self.build([(65, 90, 1), (0x20000, 0x20010, 100)])
        assert sub.glyph_index(65) == 1
        assert sub.glyph_index(90) == 26
        assert sub.glyph_index(0x20000) == 100
        assert sub.glyph_index(0x20011) == 0
        assert sub.glyph_index(64) == 0

    def test_flatten_matches(self):
        sub = self.build([(65, 90, 1), (200, 300, 50)])
        mapping = CharGlyphMapping(sub.collect_range_mappings())
        for c in range(0, 400):
            assert mapping.glyph_index(c) == sub.glyph_index(c), c


class TestSelection:
    def r(self, pid, psid):
        return ttf.CmapEncodingSubtable(pid, psid, 0)

    def test_prefers_full_repertoire(self):
        subs = [self.r(3, 1), self.r(3, 10)]
        assert ttf.select_best_cmap_subtable(subs) == subs[1]

    def test_rejects_deprecated_iso(self):
        subs = [self.r(0, 2), self.r(3, 1)]
        assert ttf.select_best_cmap_subtable(subs) == subs[1]

    def test_none_when_no_unicode(self):
        assert ttf.select_best_cmap_subtable([self.r(1, 0)]) is None

    def test_unknown_format_raises(self):
        import struct

        from fontrx.utils.reader import CorruptedFont

        blob = struct.pack(">HHH", 99, 0, 0)  # not a cmap format
        with pytest.raises(CorruptedFont):
            ttf.parse_cmap_subtable(BigEndianReader(blob))


class TestReverse:
    def test_char_for_glyph_roundtrip(self, dejavu):
        for ch in "AZmq09!é":
            idx = dejavu.glyph_index(ch)
            assert idx != 0
            back = dejavu.charmap.char_for_glyph(idx)
            assert back == ord(ch)


class TestBatchLookup:
    def test_matches_single(self, dejavu):
        chars = np.array([ord(c) for c in "Hello, World! fontrx 123"] + [0x10FFFF])
        batch = dejavu.charmap.glyph_indices(chars)
        singles = [dejavu.glyph_index(int(c)) for c in chars]
        np.testing.assert_array_equal(batch, singles)


class TestLegacyCmap2_8_10:
    """Round 3 completes the charmap format set: 2 (high-byte CJK
    legacy), 8 (mixed 16/32 groups) and 10 (trimmed u32 array) — the
    formats the reference @compileErrors (`ttf.zig:349-360`) and
    rounds 1-2 declared unsupported."""

    def _fmt2_blob(self):
        import struct

        # high byte 0x81 -> subHeader 1 mapping lows 0x40..0x42;
        # one-byte codes via subHeader 0 mapping bytes 0x20..0x21
        keys = [0] * 256
        keys[0x81] = 8  # subHeader index 1
        sub_base = 6 + 512
        # subHeader 0: first=0x20, count=2, delta=0, rangeOffset points
        # past BOTH subheaders into the glyph array
        glyph_arr_pos = sub_base + 16
        sh0_range = glyph_arr_pos - (sub_base + 6)
        sh1_range = (glyph_arr_pos + 4) - (sub_base + 8 + 6)
        blob = struct.pack(">HHH", 2, 0, 0)
        blob += struct.pack(">256H", *keys)
        blob += struct.pack(">HHhH", 0x20, 2, 0, sh0_range)
        blob += struct.pack(">HHhH", 0x40, 3, 5, sh1_range)
        blob += struct.pack(">2H", 100, 101)       # bytes 0x20, 0x21
        blob += struct.pack(">3H", 10, 0, 12)      # lows 0x40..0x42
        # fix length field
        blob = blob[:2] + struct.pack(">H", len(blob)) + blob[4:]
        return blob

    def test_format2(self):
        sub = ttf.parse_cmap_subtable(BigEndianReader(self._fmt2_blob()))
        assert isinstance(sub, ttf.CmapFormat2)
        assert sub.glyph_index(0x20) == 100
        assert sub.glyph_index(0x21) == 101
        assert sub.glyph_index(0x8140) == 15       # 10 + delta 5
        assert sub.glyph_index(0x8141) == 0        # zero stays unmapped
        assert sub.glyph_index(0x8142) == 17
        assert sub.glyph_index(0x8143) == 0
        assert sub.glyph_index(0x40) == 0          # two-byte-only high
        rows = sub.collect_range_mappings()
        assert rows.shape[1] == 3 and len(rows) >= 2

    def test_format8(self):
        import struct

        blob = struct.pack(">HH", 8, 0)
        blob += struct.pack(">II", 8216 + 16, 0)
        blob += bytes(8192)
        blob += struct.pack(">I", 2)
        blob += struct.pack(">III", 0x41, 0x43, 7)
        blob += struct.pack(">III", 0x10400, 0x10401, 50)
        sub = ttf.parse_cmap_subtable(BigEndianReader(blob))
        assert isinstance(sub, ttf.CmapFormat8)
        assert sub.glyph_index(0x41) == 7
        assert sub.glyph_index(0x43) == 9
        assert sub.glyph_index(0x44) == 0
        assert sub.glyph_index(0x10401) == 51
        rows = sub.collect_range_mappings()
        assert len(rows) == 2

    def test_format10(self):
        import struct

        blob = struct.pack(">HH", 10, 0)
        blob += struct.pack(">II", 20 + 8, 0)
        blob += struct.pack(">II", 0x10300, 4)
        blob += struct.pack(">4H", 5, 6, 0, 8)
        sub = ttf.parse_cmap_subtable(BigEndianReader(blob))
        assert isinstance(sub, ttf.CmapFormat10)
        assert sub.glyph_index(0x10300) == 5
        assert sub.glyph_index(0x10302) == 0
        assert sub.glyph_index(0x10303) == 8
        assert sub.glyph_index(0x102FF) == 0
        rows = sub.collect_range_mappings()
        assert len(rows) == 2
