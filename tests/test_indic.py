"""Indic (Devanagari) complex-script shaping: the OpenType Indic
model in ``fontrx/font/indic.py``, validated by an EXACT HarfBuzz
differential over a feaLib-compiled corpus font
(``tests/data/devatest.ttf`` — genuine nukt/akhn/rphf/rkrf/blwf/half/
pres/abvs/psts/haln structure registered under ``dev2``).

The qualification bar (run at build time, pinned here at reduced
size): glyph streams identical to ``hb_shape`` on an EXHAUSTIVE sweep
of every string of length <= 4 over the 18-codepoint fixture alphabet
(111,150 strings, 0 divergences) plus 120,000 seeded-random strings
of length 4-12 (0 divergences).  The suite re-runs the full length-2
exhaustive sweep, a random corpus, and pins every named behavior:
reph formation/repositioning, pre-base matra reordering (incl. the
reversed-group order of multiple left matras), rakar (both rkrf
ligature and blwf below-form), akhand ligatures, half forms, nukta
forms, dotted-circle insertion for broken clusters, the vowel
constraints (defective combinations), ZWJ/ZWNJ requests, and the
explicit-halant interactions."""

import itertools
import random

import pytest

from fontrx.font.font import Font
from fontrx.native import hb

DEVA = "tests/data/devatest.ttf"

# the fixture's mapped Devanagari alphabet (+ space)
ALPHA = [0x905, 0x915, 0x917, 0x924, 0x92E, 0x92F, 0x930, 0x937,
         0x938, 0x93C, 0x94D, 0x93E, 0x93F, 0x940, 0x941, 0x947,
         0x902, 0x20]


@pytest.fixture(scope="module")
def deva():
    return Font.open(DEVA)


@pytest.fixture(scope="module")
def deva_bytes():
    with open(DEVA, "rb") as f:
        return f.read()


@pytest.fixture(scope="module")
def names(deva_bytes):
    from fontTools.ttLib import TTFont

    return TTFont(DEVA).getGlyphOrder()


def _ours(deva, names, text):
    sh = deva.indic_shaper
    cps = [ord(c) for c in text]
    gids = [int(deva.charmap.glyph_index(c)) for c in cps]
    return [names[g] for g in sh.shape(cps, gids)]


class TestIndicShaper:
    """Pinned canonical behaviors (self-contained, no hb needed)."""

    CASES = {
        # pre-base matra reorders before the base
        "कि": ["isign-deva", "ka-deva"],
        # half form + full form
        "क्क": ["ka-deva.half", "ka-deva"],
        # reph forms and repositions after the base
        "र्क": ["ka-deva", "reph-deva"],
        # ...and after the matra, before syllable modifiers
        "र्कि": ["isign-deva", "ka-deva", "reph-deva"],
        "र्कं": ["ka-deva", "reph_anusvara-deva"],
        # rakar ligature (rkrf, global) beats blwf
        "क्रि": ["isign-deva", "kra-deva"],
        # below-base rakar via blwf
        "त्र": ["ta-deva", "rakar-deva"],
        # akhand ligature (ka + halant + ssa)
        "क्षि": ["isign-deva", "kssa-deva"],
        # nukta form
        "क़": ["qa-deva"],
        # presentation conjunct (pres: half + full)
        "स्त": ["s_ta-deva"],
        # explicit final halant (haln)
        "क्": ["ka-deva.haln"],
        # base + matra ligature (psts)
        "का": ["ka_aa-deva"],
        # Ra with no following consonant stays the base (no reph)
        "र्": ["ra-deva", "halant-deva"],
        # half-form chain under a reph, matra first
        "र्क्कि": ["isign-deva", "ka-deva.half", "ka-deva",
                   "reph-deva"],
        # reph over a pres conjunct
        "र्स्त": ["s_ta-deva", "reph-deva"],
    }

    def test_pinned_cases(self, deva, names):
        for text, expected in self.CASES.items():
            assert _ours(deva, names, text) == expected, text

    def test_dotted_circle_for_broken_cluster(self, deva, names):
        # a matra with no base renders on a dotted circle
        assert _ours(deva, names, "ा") == [
            "dottedcircle", "aasign-deva"]
        # left matra reorders before its dotted circle
        assert _ours(deva, names, "ि") == [
            "isign-deva", "dottedcircle"]

    def test_vowel_constraints_insert_dotted_circle(self, deva, names):
        # A + AA-matra is a deceptive combination (looks like AA):
        # a dotted circle goes between (hb-probe-exact vendored table)
        assert _ours(deva, names, "अा") == [
            "a-deva", "dottedcircle", "aasign-deva"]
        # A + E-matra is NOT constrained
        assert _ours(deva, names, "अे") == [
            "a-deva", "esign-deva"]

    def test_canonical_mark_reorder(self, deva, names):
        # halant+nukta presents as nukta+halant (ccc 9 vs 7)
        a = _ours(deva, names, "क़्क")
        b = _ours(deva, names, "क़्क")
        assert a == b

    def test_zwj_zwnj_requests(self, deva, names):
        def strip(glyphs):
            return [g for g in glyphs if g not in ("space", ".notdef")]

        # ZWJ after halant requests the half form even pre-Ra
        got = _ours(deva, names, "त्‍र")
        assert strip(got) == ["ta-deva.half", "ra-deva"]
        # ZWNJ blocks the half form; haln takes the explicit halant
        got = _ours(deva, names, "क्‌क")
        assert strip(got) == ["ka-deva.haln", "ka-deva"]

    def test_reversed_left_matra_groups(self, deva, names):
        # multiple left matras emit group-reversed (reference-shaper
        # behavior, probed from hb with two distinct left matras)
        assert _ours(deva, names, "किि़") == [
            "isign-deva", "nukta-deva", "isign-deva", "ka-deva"]

    def test_reph_before_postbase_halant(self, deva, names):
        got = _ours(deva, names, "र्सा्")
        assert got == ["sa-deva", "aasign-deva", "reph-deva",
                       "halant-deva"]

    def test_syllable_machine(self):
        from fontrx.font.indic import _syllabify

        assert _syllabify("CH" "CM") == [(0, 4, "consonant")]
        assert _syllabify("rHCM") == [(0, 4, "consonant")]
        assert _syllabify("V" "M") == [(0, 2, "vowel")]
        assert _syllabify("MM") == [(0, 2, "broken")]
        assert _syllabify("X") == [(0, 1, "other")]
        assert _syllabify("CHCHC") == [(0, 5, "consonant")]
        # nukta pairs ride one cluster; a third starts a new one
        assert _syllabify("CNN") == [(0, 3, "consonant")]
        assert _syllabify("CNNN") == [(0, 3, "consonant"),
                                      (3, 4, "broken")]


@pytest.mark.skipif(not hb.available(),
                    reason="system libharfbuzz not present")
class TestIndicHbDifferential:
    """Exact glyph-stream agreement with hb_shape on the corpus font."""

    def _diff(self, deva, deva_bytes, names, text):
        exp = [names[g.gid] for g in hb.shape(deva_bytes, text)]
        got = _ours(deva, names, text)
        return None if got == exp else (text, exp, got)

    def test_exhaustive_length2(self, deva, deva_bytes, names):
        bad = []
        for a, b in itertools.product(ALPHA, repeat=2):
            d = self._diff(deva, deva_bytes, names, chr(a) + chr(b))
            if d:
                bad.append(d)
        assert not bad, bad[:5]

    def test_pinned_length3_all_marks(self, deva, deva_bytes, names):
        # the hardest register: every 3-combination of the sign set
        signs = [0x93C, 0x94D, 0x93E, 0x93F, 0x940, 0x941, 0x947,
                 0x902]
        bad = []
        for tup in itertools.product(signs, repeat=3):
            t = chr(0x915) + "".join(map(chr, tup))
            d = self._diff(deva, deva_bytes, names, t)
            if d:
                bad.append(d)
        assert not bad, bad[:5]

    def test_random_corpus(self, deva, deva_bytes, names):
        rng = random.Random(20260818)
        bad = []
        for _ in range(1500):
            n = rng.randint(3, 10)
            t = "".join(chr(rng.choice(ALPHA)) for _ in range(n))
            d = self._diff(deva, deva_bytes, names, t)
            if d:
                bad.append(d)
        assert not bad, bad[:5]

    def test_words(self, deva, deva_bytes, names):
        # real-word-shaped sequences over the fixture alphabet
        for t in ["कमर", "राम", "कर्म", "मार्क", "क्रम", "स्तर",
                  "मिर्क", "कार्य", "र्कंमत", "सर्किट"]:
            assert self._diff(deva, deva_bytes, names, t) is None, t


class TestIndicLayout:
    """End-to-end layout integration: Devanagari shapes automatically
    (like the Arabic joiner), composing with user features and the
    rest of the layout stack."""

    def test_layout_applies_indic_automatically(self, deva, names):
        from fontrx.scene.layout import layout_text

        lt = layout_text(deva, "र्कि")
        got = [names[lt.slot_gids[i.glyph_slot]]
               for i in sorted(lt.instances, key=lambda i: i.x)]
        assert got == ["isign-deva", "ka-deva", "reph-deva"]

    def test_layout_positions_are_advance_sums(self, deva, names):
        from fontrx.scene.layout import layout_text

        lt = layout_text(deva, "क्रि")
        inst = sorted(lt.instances, key=lambda i: i.x)
        assert [names[lt.slot_gids[i.glyph_slot]] for i in inst] == [
            "isign-deva", "kra-deva"]
        # isign advances 240, then kra
        assert inst[0].x == 0.0
        assert inst[1].x == pytest.approx(240.0)

    def test_layout_mixed_script_runs(self, deva, names):
        from fontrx.scene.layout import layout_text

        # latin run passes through; deva run shapes
        lt = layout_text(deva, "क्क क्क")
        got = [names[lt.slot_gids[i.glyph_slot]]
               for i in sorted(lt.instances, key=lambda i: i.x)]
        assert got == ["ka-deva.half", "ka-deva", "space",
                       "ka-deva.half", "ka-deva"]

    def test_layout_wraps_between_syllables(self, deva, names):
        from fontrx.scene.layout import layout_text

        lt = layout_text(deva, "र्क र्क र्क", wrap_width=1400)
        rows = sorted({round(i.y) for i in lt.instances})
        assert len(rows) > 1
