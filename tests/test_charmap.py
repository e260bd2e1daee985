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

    def test_unsupported_format_raises(self):
        import struct

        blob = struct.pack(">HHH", 8, 0, 0)  # format 8: still unsupported
        with pytest.raises(NotImplementedError):
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
