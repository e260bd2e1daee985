"""HarfBuzz differential oracle: fontrx's GSUB/GPOS shaping vs
``hb_shape`` through the system ``libharfbuzz`` (ctypes binding,
`fontrx/native/hb.py`).

HarfBuzz is the industry-reference shaper; on every covered case the
two engines must produce the SAME glyph stream and the SAME pen
positions in font units — glyph ids, cumulative x, and attachment
offsets, exactly.  Covered: Latin kerning (GPOS PairPos via the
`kern` feature), ligatures (GSUB `liga`), combining-mark attachment
(GPOS MarkToBase + MarkToMark), NFC normalization behavior, RTL
reversal, and the Arabic positional pipeline on the feaLib-compiled
fixture.

Known divergence (documented, not asserted): pointed Hebrew with
MULTIPLE marks on one base — HarfBuzz's Hebrew complex shaper applies
its own mark handling (composition fallbacks/reordering) where fontrx
anchors each mark through the font's GPOS lookups directly.
"""

import numpy as np
import pytest

from fontrx.font.font import Font
from fontrx.native import hb

DEJAVU = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"
ARABIC = "tests/data/arabictest.ttf"

pytestmark = pytest.mark.skipif(
    not hb.available(), reason="system libharfbuzz not present")


@pytest.fixture(scope="module")
def dj():
    return Font.open(DEJAVU)


@pytest.fixture(scope="module")
def dj_bytes():
    with open(DEJAVU, "rb") as f:
        return f.read()


def _ours(font, text, **kw):
    from fontrx.scene.layout import layout_text

    lt = layout_text(font, text, positioning=(), **kw)
    gids = [lt.slot_gids[i.glyph_slot] for i in lt.instances]
    pos = [(round(i.x), round(i.y)) for i in lt.instances]
    return gids, pos


def _theirs(font_bytes, text, direction=None, features=""):
    out = hb.shape(font_bytes, text, direction=direction,
                   features=features)
    gids = [g.gid for g in out]
    pos = []
    pen = 0
    for g in out:
        pos.append((pen + g.x_offset, g.y_offset))
        pen += g.x_advance
    return gids, pos


class TestLatin:
    @pytest.mark.parametrize("text", [
        "AVATAR fi", "Typewriter flight", "WAVE To yo",
        "difficult waffle", "LTA VA Yo",
    ])
    def test_kern_liga_pen_exact(self, dj, dj_bytes, text):
        og, op = _ours(dj, text, kern=True, ligatures=True)
        hg, hp = _theirs(dj_bytes, text)
        assert og == hg
        assert op == hp

    def test_marks_attach_identically(self, dj, dj_bytes):
        # x-circumflex has no precomposed form: genuine GPOS
        # MarkToBase through both engines
        og, op = _ours(dj, "x̂ marks", kern=True, marks=True)
        hg, hp = _theirs(dj_bytes, "x̂ marks")
        assert og == hg
        assert op == hp

    def test_nfc_composition_matches(self, dj, dj_bytes):
        # decomposed input composes to the precomposed glyph in both
        text = "voilà"
        og, op = _ours(dj, text, kern=True, marks=True)
        hg, hp = _theirs(dj_bytes, text)
        assert og == hg
        assert op == hp

    def test_stacked_marks_mkmk(self, dj, dj_bytes):
        # base + two stacking marks: MarkToBase then MarkToMark
        text = "ä́"
        og, op = _ours(dj, text, kern=True, marks=True)
        hg, hp = _theirs(dj_bytes, text)
        assert og == hg
        assert op == hp


class TestRtl:
    def test_hebrew_position_set(self, dj, dj_bytes):
        # unpointed Hebrew: pure RTL reversal; positions must agree as
        # a (gid, x) set (hb emits visual order, fontrx logical)
        text = "שלום עולם"
        og, op = _ours(dj, text, rtl=True, kern=True)
        hg, hp = _theirs(dj_bytes, text, direction=hb.DIR_RTL)
        assert sorted(zip(og, op)) == sorted(zip(hg, hp))


class TestArabicFixture:
    @pytest.fixture(scope="class")
    def ar(self):
        return Font.open(ARABIC)

    @pytest.fixture(scope="class")
    def ar_bytes(self):
        with open(ARABIC, "rb") as f:
            return f.read()

    @pytest.mark.parametrize("text", ["لا", "ببب", "بب لا"])
    def test_positional_forms_and_rlig(self, ar, ar_bytes, text):
        og, op = _ours(ar, text, rtl=True, ligatures=True)
        hg, hp = _theirs(ar_bytes, text, direction=hb.DIR_RTL)
        assert sorted(zip(og, op)) == sorted(zip(hg, hp))


class TestBinding:
    def test_version_reports(self):
        assert hb.version()

    def test_features_parse(self, dj_bytes):
        # disabling liga through the feature string splits the fi
        # ligature back into f + i
        with_liga = hb.shape(dj_bytes, "fi")
        without = hb.shape(dj_bytes, "fi", features="-liga")
        assert len(without) == 2
        assert len(with_liga) == 1


class TestRandomizedCorpus:
    """Seeded random Latin strings (with spacing/punctuation and
    composable accents) through kern+liga on two real fonts: glyph
    streams and pen positions must match HarfBuzz exactly.  An
    exploration run over 300 strings found 0 divergences; this pins a
    60-string subset per font for CI."""

    @pytest.mark.parametrize("path", [
        DEJAVU, "/usr/share/fonts/truetype/dejavu/DejaVuSerif.ttf",
    ])
    def test_random_strings_pen_exact(self, path):
        import random

        from fontrx.scene.layout import layout_text

        rng = random.Random(42)
        alpha = ("abcdefghijklmnopqrstuvwxyz"
                 "ABCDEFGHIJKLMNOPQRSTUVWXYZ ,.'!?-àéüöñ")
        font = Font.open(path)
        with open(path, "rb") as fh:
            data = fh.read()
        for _ in range(60):
            text = "".join(rng.choice(alpha)
                           for _ in range(rng.randint(1, 24)))
            og, op = _ours(font, text, kern=True, ligatures=True)
            hg, hp = _theirs(data, text)
            assert og == hg, text
            assert op == hp, text


class TestScriptSelection:
    """Per-script GSUB lookup selection end-to-end vs hb: the same
    'locl' tag registered under latn and grek selects different
    lookups per itemized run."""

    def _font(self):
        from tests import ttf_builder as tb

        # 'a' -> gid 1 (latn), alpha -> gid 2 (grek);
        # locl/latn: 1->3, locl/grek: 2->4
        cmap = tb.build_cmap([(3, 1, tb.build_cmap_format4(
            [(0x61, 0x61, 1 - 0x61, None),
             (0x3B1, 0x3B1, 2 - 0x3B1, None)]))])
        tri = tb.build_simple_glyph(
            [[(0, 0, True), (50, 100, False), (100, 0, True)]],
            box=(0, 0, 100, 100))
        gsub = tb.build_gsub(
            [(b"locl", [0]), (b"locl", [1])],
            [(1, 0, [tb.gsub_single({1: 3})]),
             (1, 0, [tb.gsub_single({2: 4})])],
            # NB sorted by tag: hb binary-searches ScriptRecords
            scripts=[
                (b"grek", {None: (None, [1])}),
                (b"latn", {None: (None, [0])}),
            ],
        )
        data = tb.build_font([b"", tri, tri, tri, tri], cmap,
                             extra_tables={b"GSUB": gsub})
        return data

    def test_per_script_locl_matches_hb(self):
        from fontrx.scene.layout import layout_text

        data = self._font()
        font = Font(data)
        # fontrx itemizes multi-script text internally (the
        # Pango-layer job); hb_shape shapes ONE run per buffer, so the
        # differential compares per script run
        lt = layout_text(font, "aα", features=(b"locl",))
        ours = [lt.slot_gids[i.glyph_slot] for i in lt.instances]
        assert ours == [3, 4]  # per-script selection
        if hb.available():
            latn = [g.gid for g in hb.shape(data, "a")]
            grek = [g.gid for g in hb.shape(data, "α")]
            assert ours == latn + grek


class TestCcmpContextual:
    """DejaVu's ccmp feature (contextual dotless-i/j substitution
    before above-marks) + mark attachment, pen-exact vs hb.  NFC keeps
    the precomposed forms where they exist; the j-tilde case has no
    precomposed form, so the full chain (ccmp contextual sub ->
    dotless j -> mark anchor) runs in both engines."""

    @pytest.mark.parametrize("text", ["í", "îx", "j̃", "nïo"])
    def test_pen_exact(self, dj, dj_bytes, text):
        og, op = _ours(dj, text, features=(b"ccmp",), marks=True,
                       kern=True)
        hg, hp = _theirs(dj_bytes, text)
        assert og == hg
        assert op == hp
