"""Khmer shaping (``fontrx/font/khmer.py``), validated by an EXACT
HarfBuzz differential over a feaLib-compiled corpus font
(``khmrtest.ttf``: coeng subscripts via blwf, the pre-base RO via
pref, a cfar variant, presentation rules).

Qualification (run at build time, reduced here): exhaustive length<=3
over a 19-codepoint alphabet (7,239 strings) + 20,000 seeded-random
strings with joiners — ZERO divergences (round 4: the 26-string
residual was killed by hb-probing the sign-attachment budgets — base
two robatics, subscript one, tail coeng none; see the grammar
comments in the module)."""

import itertools
import random

import pytest

from fontrx.font.font import Font
from fontrx.native import hb

KHMR = "tests/data/khmrtest.ttf"
ALPHA = [0x1780, 0x178F, 0x1789, 0x1798, 0x179A, 0x17A5, 0x17D2,
         0x17B6, 0x17B7, 0x17BB, 0x17C1, 0x17BE, 0x17C4, 0x17C6,
         0x17C7, 0x17C9, 0x17CC, 0x17D3, 0x20]


@pytest.fixture(scope="module")
def env():
    from fontTools.ttLib import TTFont

    font = Font.open(KHMR)
    names = TTFont(KHMR).getGlyphOrder()
    with open(KHMR, "rb") as f:
        data = f.read()
    return font, names, data


def _ours(font, names, text):
    cps = [ord(c) for c in text]
    gids = [int(font.charmap.glyph_index(c)) for c in cps]
    return [names[g] for g in font.khmer_shaper.shape(cps, gids)]


class TestKhmerShaper:
    CASES = {
        # coeng subscript below form
        "ក្ក": ["u1780", "ka.blw"],
        # pre-base RO moves to the front
        "ក្រ": ["ro.pre", "u1780"],
        # pre-base vowel moves to the front, before the RO
        "ក្រេ": ["u17C1", "ro.pre", "u1780"],
        # split vowel decomposes: the e-piece travels
        "កើ": ["u17C1", "u1780", "u17BE"],
        # cfar: a below form after the pre-base RO takes its variant
        "ក្រ្ក": ["ro.pre", "u1780", "ka.cfar"],
        # presentation ligature after reordering
        "កា": ["k_aa"],
        # dotted circle for a base-less coeng cluster
        "្ក": ["u25CC", "ka.blw"],
        # trailing bare coeng stays in the cluster
        "ក្": ["u1780", "u17D2"],
        # robatic rides its consonant
        "ក៌": ["u1780", "u17CC"],
    }

    def test_pinned_cases(self, env):
        font, names, _ = env
        for text, expected in self.CASES.items():
            assert _ours(font, names, text) == expected, text

    def test_layout_routes_khmer(self, env):
        from fontrx.scene.layout import layout_text

        font, names, _ = env
        lt = layout_text(font, "ក្រេ")
        got = [names[lt.slot_gids[i.glyph_slot]]
               for i in sorted(lt.instances, key=lambda i: i.x)]
        assert got == ["u17C1", "ro.pre", "u1780"]


@pytest.mark.skipif(not hb.available(),
                    reason="system libharfbuzz not present")
class TestKhmerHbDifferential:
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
        for _ in range(1200):
            t = "".join(chr(rng.choice(alpha))
                        for _ in range(rng.randint(3, 8)))
            d = self._diff(env, t, strip=True)
            if d:
                bad.append(d)
        assert not bad, bad[:5]
