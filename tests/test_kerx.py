"""AAT kerx extended kerning (`fontrx/font/kerx.py`): pair/class/index
forms + accumulation + vertical-coverage gating, with pen positions
pinned against hb_shape on every fixture."""

import numpy as np
import pytest

from fontrx.font.font import Font
from fontrx.font.kerx import KerxTable
from fontrx.native import hb
from fontrx.scene.layout import layout_text

FIXTURES = {
    "pairs": "tests/data/kerx_pairs.ttf",
    "class": "tests/data/kerx_class.ttf",
    "index": "tests/data/kerx_index.ttf",
    "accum": "tests/data/kerx_accum.ttf",
}

# second-glyph pen position for a two-glyph string (advance 600 each)
CASES = {
    ("pairs", "AV"): 450,   # -150
    ("pairs", "VA"): 520,   # -80
    ("pairs", "AW"): 600,   # unkerned
    ("class", "AV"): 450,   # matrix [1][1]
    ("class", "Ao"): 625,   # matrix [1][2] = +25
    ("class", "VV"): 540,   # matrix [2][1]
    ("class", "WV"): 540,   # W shares V's row class
    ("class", "AW"): 600,   # W is column class 0
    ("index", "AV"): 450,
    ("index", "VA"): 600,
    ("accum", "AV"): 450,   # -50 (pairs) + -100 (class) accumulate
}


class TestForms:
    @pytest.mark.parametrize("key,expect", CASES.items(),
                             ids=[f"{k[0]}-{k[1]}" for k in CASES])
    def test_pen_positions_pinned_and_hb(self, key, expect):
        fixture, text = key
        path = FIXTURES[fixture]
        font = Font.open(path)
        lt = layout_text(font, text, kern=True)
        ours = [round(i.x) for i in lt.instances]
        assert ours[1] == expect, (fixture, text)
        if hb.available():
            with open(path, "rb") as f:
                data = f.read()
            pen = 0
            hp = []
            for g in hb.shape(data, text):
                hp.append(pen + g.x_offset)
                pen += g.x_advance
            assert ours == hp, (fixture, text)

    def test_parse_structure(self):
        font = Font.open(FIXTURES["accum"])
        k = font.kerning
        assert isinstance(k, KerxTable)
        assert len(k.forms) == 2

    def test_vertical_subtable_ignored(self):
        font = Font.open("tests/data/kerx_vertical.ttf")
        # the only subtable is vertical-coverage: no horizontal kern
        assert font.kerning is None

    def test_legacy_kern_takes_precedence(self):
        # DejaVu has 'kern' (GPOS) but no kerx; fonts with both use
        # the legacy table first (kerx is the fallback)
        font = Font.open(FIXTURES["pairs"])
        assert b"kern" not in font.tables
        assert isinstance(font.kerning, KerxTable)

    def test_vectorized_lookup(self):
        font = Font.open(FIXTURES["pairs"])
        out = font.kerning.lookup(
            np.array([1, 2, 1]), np.array([2, 1, 3]))
        np.testing.assert_array_equal(out, [-150, -80, 0])


class TestRobustness:
    def test_bitflip_fuzz_degrades(self):
        import random

        rng = random.Random(11)
        with open(FIXTURES["class"], "rb") as f:
            data = bytearray(f.read())
        for _ in range(200):
            d = bytearray(data)
            for _ in range(rng.randint(1, 4)):
                p = rng.randrange(len(d))
                d[p] ^= 1 << rng.randrange(8)
            try:
                font = Font(bytes(d))
                layout_text(font, "AV o", kern=True)
            except Exception as e:
                from fontrx.font.ttf import CorruptedFont

                assert isinstance(e, (CorruptedFont, ValueError)), e


class TestStateMachine:
    """Format 1 contextual kerning: push/pop value application with
    odd-bit list termination, pen deltas inserted BEFORE the pushed
    glyph — all pinned against hb_shape."""

    PATH = "tests/data/kerx_state.ttf"

    @pytest.mark.parametrize("text,expect", [
        ("AV", [-150, 450]),
        ("AW", [0, 600]),
        ("AAV", [0, 450, 1050]),   # only the adjacent A is pushed-live
        ("AVAV", [-150, 450, 900, 1500]),
    ])
    def test_pen_positions(self, text, expect):
        font = Font.open(self.PATH)
        lt = layout_text(font, text, kern=True)
        ours = [round(i.x) for i in lt.instances]
        assert ours == expect
        if hb.available():
            with open(self.PATH, "rb") as f:
                data = f.read()
            pen = 0
            hp = []
            for g in hb.shape(data, text):
                hp.append(pen + g.x_offset)
                pen += g.x_advance
            assert ours == hp

    def test_contextual_deltas_api(self):
        font = Font.open(self.PATH)
        d = font.kerning.contextual_deltas([1, 2])  # A V
        np.testing.assert_array_equal(d, [-150, 0])
        d = font.kerning.contextual_deltas([1, 3])  # A W
        np.testing.assert_array_equal(d, [0, 0])


class TestAnchorAttachment:
    """Format 4 + ankr: anchor alignment as a pure position offset
    (pen advances normally), hb-pinned."""

    PATH = "tests/data/kerx_anchor.ttf"

    @pytest.mark.parametrize("text,expect", [
        ("AV", [(0, 0), (400, 600)]),
        ("VA", [(0, 0), (600, 0)]),
        ("AVA", [(0, 0), (400, 600), (1200, 0)]),
    ])
    def test_positions(self, text, expect):
        font = Font.open(self.PATH)
        lt = layout_text(font, text, kern=True)
        ours = [(round(i.x), round(i.y)) for i in lt.instances]
        assert ours == expect
        if hb.available():
            with open(self.PATH, "rb") as f:
                data = f.read()
            pen = 0
            hp = []
            for g in hb.shape(data, text):
                hp.append((pen + g.x_offset, g.y_offset))
                pen += g.x_advance
            assert ours == hp

    def test_ankr_parse(self):
        from fontrx.font.kerx import parse_ankr

        font = Font.open(self.PATH)
        with open(self.PATH, "rb") as f:
            data = f.read()
        r = font._at(b"ankr")
        anchors = parse_ankr(r.data, r.pos)
        assert anchors[1] == [(500, 700)]
        assert anchors[2] == [(100, 100)]


class TestMixedPairAndAnchor:
    """Pair kerning + anchor attachment in one kerx table: the anchor
    machine must see KERNED pens (the review-found bug; hb-pinned)."""

    PATH = "tests/data/kerx_mixed.ttf"

    @pytest.mark.parametrize("text,expect", [
        ("AV", [(0, 0), (400, 600)]),      # pen 500 (kerned) - 100
        ("AVAV", [(0, 0), (400, 600), (1100, 0), (1500, 600)]),
    ])
    def test_attachment_sees_kerned_pens(self, text, expect):
        font = Font.open(self.PATH)
        lt = layout_text(font, text, kern=True)
        ours = [(round(i.x), round(i.y)) for i in lt.instances]
        assert ours == expect
        if hb.available():
            with open(self.PATH, "rb") as f:
                data = f.read()
            pen = 0
            hp = []
            for g in hb.shape(data, text):
                hp.append((pen + g.x_offset, g.y_offset))
                pen += g.x_advance
            assert ours == hp
