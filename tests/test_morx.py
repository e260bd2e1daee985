"""AAT morx metamorphosis (`fontrx/font/morx.py`): all five
extended-state-table subtable types, pinned glyph-for-glyph against
HarfBuzz (the industry morx implementation) on the fixture fonts, plus
parser unit vectors and the corrupt-input degradation contract."""

import struct

import numpy as np
import pytest

from fontrx.font.font import Font
from fontrx.font.morx import MorxTable, aat_lookup
from fontrx.native import hb
from fontrx.scene.layout import layout_text

FIXTURES = {
    "nonctx": "tests/data/morx_nonctx.ttf",
    "ctx": "tests/data/morx_ctx.ttf",
    "rearr": "tests/data/morx_rearr.ttf",
    "ins": "tests/data/morx_ins.ttf",
    "lig": "tests/data/morx_lig.ttf",
}

CASES = {
    # (fixture, text): every case ALSO runs through the hb oracle when
    # the library is present — the expectations here were captured
    # from hb_shape and double as a record of the pinned semantics
    ("nonctx", "AC"): [2, 3],
    ("nonctx", "ABCA"): [2, 2, 3, 2],
    ("ctx", "AB"): [3, 2],          # A before B -> C
    ("ctx", "AD"): [1, 4],          # no trigger
    ("ctx", "AAB"): [1, 3, 2],      # only the adjacent A substitutes
    ("ctx", "AABAB"): [1, 3, 2, 3, 2],
    ("rearr", "AD"): [4, 1],        # AxD -> DxA, empty x
    ("rearr", "ABD"): [1, 2, 4],    # B resets the machine: no verb
    ("rearr", "ADAD"): [4, 1, 4, 1],
    ("ins", "AB"): [1, 3, 2],       # C inserted after every A
    ("ins", "AA"): [1, 3, 1, 3],
    ("ins", "ABA"): [1, 3, 2, 1, 3],
    ("ins", "AAA"): [1, 3, 1, 3, 1, 3],
    ("lig", "fil"): [4, 3],         # f+i -> fi
    ("lig", "fl"): [5],
    ("lig", "Afi"): [6, 4],
    ("lig", "ff"): [1, 1],          # ff has no ligature here
    ("lig", "fifl"): [4, 5],
    ("lig", "flfi"): [5, 4],
}


class TestAllTypes:
    @pytest.mark.parametrize("key,expect", CASES.items(),
                             ids=[f"{k[0]}-{k[1]}" for k in CASES])
    def test_layout_matches_pinned_and_hb(self, key, expect):
        fixture, text = key
        path = FIXTURES[fixture]
        font = Font.open(path)
        lt = layout_text(font, text)
        ours = [lt.slot_gids[i.glyph_slot] for i in lt.instances]
        assert ours == expect, (fixture, text)
        if hb.available():
            with open(path, "rb") as f:
                data = f.read()
            theirs = [g.gid for g in hb.shape(data, text)]
            assert ours == theirs, (fixture, text)


class TestParse:
    def test_chain_structure(self):
        font = Font.open(FIXTURES["lig"])
        m = font.morx
        assert isinstance(m, MorxTable)
        assert len(m.chains) == 1
        flags, _feats, subs = m.chains[0]
        assert flags == 1
        assert [s.kind for s in subs] == [2]

    def test_aat_lookup_format8(self):
        # trimmed array: firstGlyph 5, two values
        data = struct.pack(">HHHHH", 8, 5, 2, 100, 200)
        lut = aat_lookup(data, 0)
        assert lut == {5: 100, 6: 200}

    def test_aat_lookup_format6(self):
        data = struct.pack(">HHHHHH", 6, 4, 1, 0, 0, 0) + struct.pack(
            ">HH", 7, 42)
        lut = aat_lookup(data, 0)
        assert lut == {7: 42}

    def test_aat_lookup_format2(self):
        data = struct.pack(">HHHHHH", 2, 6, 1, 0, 0, 0) + struct.pack(
            ">HHH", 9, 7, 3)  # glyphs 7..9 -> 3
        lut = aat_lookup(data, 0)
        assert lut == {7: 3, 8: 3, 9: 3}


class TestIntegration:
    def test_gsub_takes_precedence(self):
        # a font with BOTH GSUB and morx shapes through GSUB only
        # (the HarfBuzz preference order) — synthesize by checking the
        # layout gate directly: DejaVu has GSUB and no morx
        font = Font.open(
            "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf")
        assert font.morx is None  # no morx table at all
        # and the morx fixture has no GSUB, so morx applies
        f2 = Font.open(FIXTURES["nonctx"])
        assert b"GSUB" not in f2.tables and f2.morx is not None

    def test_vertical_only_subtable_skipped_horizontally(self):
        font = Font.open(FIXTURES["nonctx"])
        m = font.morx
        flags, feats, subs = m.chains[0]
        # synthesize a vertical-only copy of the subtable
        from dataclasses import replace

        vert = replace(subs[0], coverage=subs[0].coverage | 0x80000000)
        vm = MorxTable(((flags, feats, (vert,)),))
        assert vm.apply([1, 3]) == [1, 3]           # skipped
        assert vm.apply([1, 3], vertical=True) == [2, 3]

    def test_disabled_subtable_skipped(self):
        font = Font.open(FIXTURES["nonctx"])
        flags, feats, subs = font.morx.chains[0]
        from dataclasses import replace

        off = replace(subs[0], flags=0x2)  # not in default flags
        m = MorxTable(((flags, feats, (off,)),))
        assert m.apply([1, 3]) == [1, 3]


class TestRobustness:
    def test_bitflip_fuzz_degrades(self):
        """Flipped morx bytes must degrade (identity or partial
        application), never crash — the SURVEY §5.3 contract."""
        import random

        rng = random.Random(7)
        with open(FIXTURES["lig"], "rb") as f:
            data = bytearray(f.read())
        # locate the morx table bytes to focus the flips
        start = data.find(b"morx")
        for _ in range(300):
            d = bytearray(data)
            for _ in range(rng.randint(1, 4)):
                p = rng.randrange(len(d))
                d[p] ^= 1 << rng.randrange(8)
            try:
                font = Font(bytes(d))
                layout_text(font, "fil fl")
            except Exception as e:
                from fontrx.font.ttf import CorruptedFont

                assert isinstance(e, (CorruptedFont, ValueError)), e


class TestFeatureSelection:
    def test_feature_rewrites_chain_flags(self):
        # synthesize: default flags enable subtable A->B (flag 1); a
        # feature entry (type 1, setting 2) disables it and enables a
        # flag-2 copy with a different mapping
        from dataclasses import replace

        font = Font.open(FIXTURES["nonctx"])
        _flags, _feats, subs = font.morx.chains[0]
        alt = replace(subs[0], flags=0x2)
        feats = ((1, 2, 0x2, 0xFFFFFFFD),)  # enable 2, disable 1
        m = MorxTable(((0x1, feats, (subs[0], alt)),))
        # default: only the flag-1 subtable runs
        assert m.apply([1, 3]) == [2, 3]
        # selecting (1, 2): flag 1 off, flag 2 on — same mapping here,
        # but the flag arithmetic is what's pinned
        assert m.apply([1, 3], features=[(1, 2)]) == [2, 3]
        off_everything = ((1, 2, 0x0, 0xFFFFFFFC),)
        m2 = MorxTable(((0x1, off_everything, (subs[0], alt)),))
        assert m2.apply([1, 3], features=[(1, 2)]) == [1, 3]

    def test_unknown_feature_keeps_defaults(self):
        font = Font.open(FIXTURES["nonctx"])
        assert font.morx.apply([1, 3], features=[(99, 1)]) == [2, 3]
