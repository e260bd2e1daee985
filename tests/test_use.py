"""The Universal Shaping Engine (``fontrx/font/use.py``), validated
by EXACT HarfBuzz differentials over the Sinhala corpus font
(``sinhtest.ttf``) and a Javanese one (``javatest.ttf``) — scripts
hb routes to USE, with clustering that differs from the classic
Indic model.

Qualification (run at build time, reduced here): Javanese is exact
over the len<=3 with-joiners exhaustive (5,219 strings, 0
divergences; 3/12,000 random in a documented double-modifier
regrouping class).  For Sinhala, JOINER-FREE text is fully exact — length<=3 exhaustive over the fixture alphabet (3,615
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

    @pytest.mark.parametrize("path,text,expected", [
        # pangkon conjunct + tarung through the layout pipeline
        ("tests/data/javatest.ttf", "ꦏ꧀ꦠꦴ",
         ["uA98F", "ta.blw", "uA9B4"]),
        # taling fronts at layout level
        ("tests/data/javatest.ttf", "ꦏꦺ",
         ["uA9BA", "uA98F"]),
        # adeg-adeg conjunct + tedung
        ("tests/data/balitest.ttf", "ᬓ᭄ᬢᬵ",
         ["u1B13", "ta.blw", "u1B35"]),
        # Cham psts ligature under the cham run
        ("tests/data/chamtest.ttf", "ꨆꨳꨩ",
         ["k_a", "uAA29"]),
    ])
    def test_layout_routes_use_scripts(self, path, text, expected):
        """Every USE-routed script shapes at the LAYOUT level too
        (round-3 verify finding: the shaper was exact when called
        directly, but layout_text only itemized sinh/tibt runs to
        it)."""
        from fontTools.ttLib import TTFont

        from fontrx.scene.layout import layout_text

        font = Font.open(path)
        names = TTFont(path).getGlyphOrder()
        lt = layout_text(font, text)
        got = [names[lt.slot_gids[i.glyph_slot]]
               for i in sorted(lt.instances, key=lambda i: i.x)]
        assert got == expected


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


@pytest.mark.skipif(not hb.available(),
                    reason="system libharfbuzz not present")
class TestUseJavanese:
    """Javanese: pangkon conjuncts (blwf below forms), taling
    (pre-base vowel) reordering past LIGATED halants, the pengkal
    post-medial, digit bases."""

    JAVA = "tests/data/javatest.ttf"

    @pytest.fixture(scope="class")
    def jenv(self):
        from fontTools.ttLib import TTFont

        font = Font.open(self.JAVA)
        names = TTFont(self.JAVA).getGlyphOrder()
        with open(self.JAVA, "rb") as f:
            data = f.read()
        return font, names, data

    def test_pinned_cases(self, jenv):
        font, names, _ = jenv
        sh = font.use_shaper

        def ours(cps):
            gids = [int(font.charmap.glyph_index(c)) for c in cps]
            return [names[g]
                    for g in sh.shape(cps, gids, script=b"java")]

        # pangkon conjunct below form
        assert ours([0xA98F, 0xA9C0, 0xA98F]) == ["uA98F", "ka.blw"]
        # taling reorders before the base
        assert ours([0xA98F, 0xA9BA]) == ["uA9BA", "uA98F"]
        # ...and past a LIGATED pangkon to the cluster start
        assert ours([0xA9C0, 0xA98F, 0xA9BA]) == [
            "uA9BA", "u25CC", "ka.blw"]
        # digits act as bases for vowel signs (no dotted circle)
        assert ours([0xA9D0, 0xA9B4]) == ["uA9D0", "uA9B4"]

    def test_exhaustive_length2(self, jenv):
        import itertools

        font, names, data = jenv
        sh = font.use_shaper
        alpha = [0xA98F, 0xA9A0, 0xA9A4, 0xA9A6, 0xA9C0, 0xA9BA,
                 0xA9B6, 0xA9B8, 0xA9B4, 0xA981, 0xA982, 0xA983,
                 0xA9BE, 0xA9BF, 0xA9B3, 0xA9D0, 0x20, 0x200C,
                 0x200D]
        bad = []
        for a, b in itertools.product(alpha, repeat=2):
            t = chr(a) + chr(b)
            exp = ["space" if names[g.gid] in ("u200C", "u200D",
                                               "u0020")
                   else names[g.gid] for g in hb.shape(data, t)]
            cps = [ord(c) for c in t]
            gids = [int(font.charmap.glyph_index(c)) for c in cps]
            got = ["space" if names[g] in ("u200C", "u200D", "u0020")
                   else names[g]
                   for g in sh.shape(cps, gids, script=b"java")]
            if exp != got:
                bad.append((t, exp, got))
        assert not bad, bad[:5]


@pytest.mark.skipif(not hb.available(),
                    reason="system libharfbuzz not present")
class TestUseBaliCham:
    """Balinese and Cham (USE-routed): adeg-adeg conjuncts and the
    canonical COMPOSE pass (Balinese AKARA+TEDUNG), Cham medials and
    letter-finals-as-bases.  Exhaustive length-2 with joiners is
    exact for both; longer multi-joiner sequences carry the
    documented residual."""

    SPECS = {
        "bali": ("tests/data/balitest.ttf", b"bali",
                 [0x1B13, 0x1B22, 0x1B2E, 0x1B44, 0x1B3E, 0x1B36,
                  0x1B38, 0x1B35, 0x1B01, 0x1B03, 0x1B04, 0x1B00,
                  0x1B05, 0x1B50, 0x20, 0x200C, 0x200D]),
        "cham": ("tests/data/chamtest.ttf", b"cham",
                 [0xAA06, 0xAA08, 0xAA23, 0xAA33, 0xAA34, 0xAA2F,
                  0xAA2A, 0xAA32, 0xAA40, 0xAA41, 0xAA43, 0xAA4D,
                  0xAA29, 0xAA00, 0xAA50, 0x20, 0x200C, 0x200D]),
    }

    @pytest.mark.parametrize("script", sorted(SPECS))
    def test_exhaustive_length2(self, script):
        import itertools

        from fontTools.ttLib import TTFont

        path, tag, alpha = self.SPECS[script]
        font = Font.open(path)
        names = TTFont(path).getGlyphOrder()
        with open(path, "rb") as f:
            data = f.read()
        sh = font.use_shaper
        hid = ("u200C", "u200D", "u0020")
        bad = []
        for a, b in itertools.product(alpha, repeat=2):
            t = chr(a) + chr(b)
            exp = ["sp" if names[g.gid] in hid else names[g.gid]
                   for g in hb.shape(data, t)]
            cps = [ord(c) for c in t]
            gids = [int(font.charmap.glyph_index(c)) for c in cps]
            got = ["sp" if names[g] in hid else names[g]
                   for g in sh.shape(cps, gids, script=tag)]
            if exp != got:
                bad.append((t, exp, got))
        assert not bad, bad[:5]

    def test_pinned_cases(self):
        from fontTools.ttLib import TTFont

        path, tag, _ = self.SPECS["bali"]
        font = Font.open(path)
        names = TTFont(path).getGlyphOrder()
        sh = font.use_shaper

        def ours(cps):
            gids = [int(font.charmap.glyph_index(c)) for c in cps]
            return [names[g] for g in sh.shape(cps, gids, script=tag)]

        # adeg-adeg conjunct below form
        assert ours([0x1B13, 0x1B44, 0x1B13]) == ["u1B13", "ka.blw"]
        # taling fronts
        assert ours([0x1B13, 0x1B3E]) == ["u1B3E", "u1B13"]
        # canonical composition when the font maps the composite
        assert ours([0x1B05, 0x1B35]) == ["u1B06"]
        # ...but split matras never recompose off a mark
        assert ours([0x1B13, 0x1B3E, 0x1B35]) == [
            "u1B3E", "k_a"]


@pytest.mark.skipif(not hb.available(),
                    reason="system libharfbuzz not present")
class TestUseTibetan:
    """Tibetan (USE-routed, no halant — stacks are direct subjoined
    letters).  The script that pinned hb's MODIFIED combining-class
    reorder (sign u sorts before sign i, tsa -phru before the
    vowels) and a set of probed category overrides: a-chung as
    consonant modifier, halanta riding the above-vowel slot, head
    marks / shads / paired punctuation hosting marks as bases.

    Qualification at build time: ZERO divergences over the FULL
    187-cp block alphabet, length<=2 with joiners (35,156 strings),
    the 20-cp core length<=3 exhaustive + 8,000 random (16,420), and
    6,000 full-alphabet random strings.  Reduced here."""

    TIBT = "tests/data/tibttest.ttf"

    @pytest.fixture(scope="class")
    def tenv(self):
        from fontTools.ttLib import TTFont

        font = Font.open(self.TIBT)
        names = TTFont(self.TIBT).getGlyphOrder()
        with open(self.TIBT, "rb") as f:
            data = f.read()
        return font, names, data

    def test_pinned_cases(self, tenv):
        font, names, _ = tenv
        sh = font.use_shaper

        def ours(cps):
            gids = [int(font.charmap.glyph_index(c)) for c in cps]
            return [names[g]
                    for g in sh.shape(cps, gids, script=b"tibt")]

        # modified ccc: sign u (132->131) sorts before sign i
        # (130->132)
        assert ours([0x0F40, 0x0F72, 0x0F74]) == [
            "u0F40", "u0F74", "u0F72"]
        # tsa -phru (216->127) fronts the mark run
        assert ours([0x0F40, 0x0F72, 0x0F39]) == [
            "u0F40", "u0F39", "u0F72"]
        # a-chung is a consonant modifier: rides before subjoined
        assert ours([0x0F40, 0x0F71, 0x0F90]) == [
            "u0F40", "u0F71", "u0F90"]
        # halanta rides the above-vowel slot: +i joins, +u dc-splits
        assert ours([0x0F40, 0x0F84, 0x0F72]) == [
            "u0F40", "u0F84", "u0F72"]
        assert ours([0x0F40, 0x0F84, 0x0F74]) == [
            "u0F40", "u0F84", "u25CC", "u0F74"]
        # blws ligature through the subjoined stack
        assert ours([0x0F40, 0x0FB2]) == ["k_r"]
        # head marks host vowels (no dotted circle)
        assert ours([0x0F01, 0x0F72]) == ["u0F01", "u0F72"]
        # sign mar tshes reorders before its base
        assert ours([0x0F01, 0x0F3F]) == ["u0F3F", "u0F01"]

    def test_exhaustive_length2(self, tenv):
        font, names, data = tenv
        sh = font.use_shaper
        alpha = [0x0F40, 0x0F66, 0x0F90, 0x0FB2, 0x0F71, 0x0F72,
                 0x0F74, 0x0F7A, 0x0F7E, 0x0F39, 0x0F84, 0x0F77,
                 0x0F18, 0x0F3F, 0x0F7F, 0x0F01, 0x0F20, 0x0F0B,
                 0x20, 0x200C, 0x200D]
        hid = ("u200C", "u200D", "u0020")
        bad = []
        for a, b in itertools.product(alpha, repeat=2):
            t = chr(a) + chr(b)
            exp = ["sp" if names[g.gid] in hid else names[g.gid]
                   for g in hb.shape(data, t)]
            cps = [ord(c) for c in t]
            gids = [int(font.charmap.glyph_index(c)) for c in cps]
            got = ["sp" if names[g] in hid else names[g]
                   for g in sh.shape(cps, gids, script=b"tibt")]
            if exp != got:
                bad.append((t, exp, got))
        assert not bad, bad[:5]

    def test_random_joiner_free(self, tenv):
        font, names, data = tenv
        sh = font.use_shaper
        from fontTools.ttLib import TTFont

        cmap = TTFont(self.TIBT).getBestCmap()
        alpha = sorted(cp for cp in cmap
                       if 0x0F00 <= cp <= 0x0FFF) + [0x20]
        rng = random.Random(20260819)
        bad = []
        for _ in range(800):
            t = "".join(chr(rng.choice(alpha))
                        for _ in range(rng.randint(3, 6)))
            exp = [names[g.gid] for g in hb.shape(data, t)]
            cps = [ord(c) for c in t]
            gids = [int(font.charmap.glyph_index(c)) for c in cps]
            got = [names[g]
                   for g in sh.shape(cps, gids, script=b"tibt")]
            if exp != got:
                bad.append((t, exp, got))
        assert not bad, bad[:5]


@pytest.mark.skipif(not hb.available(),
                    reason="system libharfbuzz not present")
class TestUseTaiTham:
    """Tai Tham (USE-routed): the sakot's DUAL role — an invisible
    stacker forming conjuncts (at most one stack per cluster, before
    or after the vowel group) AND a bare cluster terminator that
    trails vowels/tones (modified ccc 254 sorts it last); the mai
    sams mix freely with the vowel modifiers in one [QM]* slot; low
    pa is an above-medial; multiple pre-base vowels REVERSE when
    fronting.

    Qualification at build time: ZERO divergences over the FULL
    105-cp block alphabet length<=2 with joiners (11,772 strings)
    and a 22-cp core length<=3 exhaustive + 8,000 random (19,154).
    Reduced here."""

    LANA = "tests/data/lanatest.ttf"

    @pytest.fixture(scope="class")
    def lenv(self):
        from fontTools.ttLib import TTFont

        font = Font.open(self.LANA)
        names = TTFont(self.LANA).getGlyphOrder()
        with open(self.LANA, "rb") as f:
            data = f.read()
        return font, names, data

    def test_pinned_cases(self, lenv):
        font, names, _ = lenv
        sh = font.use_shaper

        def ours(cps):
            gids = [int(font.charmap.glyph_index(c)) for c in cps]
            return [names[g]
                    for g in sh.shape(cps, gids, script=b"lana")]

        # sakot conjunct (blwf below form), pre-vowel stack
        assert ours([0x1A20, 0x1A60, 0x1A32, 0x1A63]) == [
            "u1A20", "ta.blw", "u1A63"]
        # ...and post-vowel terminal stack (with the psts ligature)
        assert ours([0x1A20, 0x1A63, 0x1A60, 0x1A32]) == [
            "k_aa", "ta.blw"]
        # a vowel after a terminal stack starts a new (dc) cluster
        assert ours([0x1A20, 0x1A63, 0x1A60, 0x1A32, 0x1A63]) == [
            "k_aa", "ta.blw", "u25CC", "u1A63"]
        # a second sakot stack never joins: trailing sakot, new base
        assert ours([0x1A20, 0x1A60, 0x1A32, 0x1A60, 0x1A3F]) == [
            "u1A20", "ta.blw", "u1A60", "u1A3F"]
        # tone + sakot: modified ccc 254 sorts the sakot last in
        # BOTH input orders, and the trailing sakot joins
        assert ours([0x1A20, 0x1A60, 0x1A75]) == [
            "u1A20", "u1A75", "u1A60"]
        assert ours([0x1A20, 0x1A75, 0x1A60]) == [
            "u1A20", "u1A75", "u1A60"]
        # mai sam mixes with vowel modifiers in either order
        assert ours([0x1A20, 0x1A7B, 0x1A74]) == [
            "u1A20", "u1A7B", "u1A74"]
        assert ours([0x1A20, 0x1A74, 0x1A7B]) == [
            "u1A20", "u1A74", "u1A7B"]
        # multiple pre-base vowels REVERSE when fronting
        assert ours([0x1A20, 0x1A6E, 0x1A6F]) == [
            "u1A6F", "u1A6E", "u1A20"]

    def test_exhaustive_length2(self, lenv):
        font, names, data = lenv
        sh = font.use_shaper
        alpha = [0x1A20, 0x1A32, 0x1A55, 0x1A56, 0x1A5A, 0x1A60,
                 0x1A63, 0x1A65, 0x1A69, 0x1A6E, 0x1A6F, 0x1A74,
                 0x1A75, 0x1A7A, 0x1A7B, 0x1A7F, 0x1A58, 0x1A80,
                 0x20, 0x200C, 0x200D]
        hid = ("u200C", "u200D", "u0020")
        bad = []
        for a, b in itertools.product(alpha, repeat=2):
            t = chr(a) + chr(b)
            exp = ["sp" if names[g.gid] in hid else names[g.gid]
                   for g in hb.shape(data, t)]
            cps = [ord(c) for c in t]
            gids = [int(font.charmap.glyph_index(c)) for c in cps]
            got = ["sp" if names[g] in hid else names[g]
                   for g in sh.shape(cps, gids, script=b"lana")]
            if exp != got:
                bad.append((t, exp, got))
        assert not bad, bad[:5]

    def test_random_joiner_free(self, lenv):
        font, names, data = lenv
        sh = font.use_shaper
        from fontTools.ttLib import TTFont

        cmap = TTFont(self.LANA).getBestCmap()
        alpha = sorted(cp for cp in cmap
                       if 0x1A20 <= cp <= 0x1AAF) + [0x20]
        rng = random.Random(20260819)
        bad = []
        for _ in range(800):
            t = "".join(chr(rng.choice(alpha))
                        for _ in range(rng.randint(3, 6)))
            exp = [names[g.gid] for g in hb.shape(data, t)]
            cps = [ord(c) for c in t]
            gids = [int(font.charmap.glyph_index(c)) for c in cps]
            got = [names[g]
                   for g in sh.shape(cps, gids, script=b"lana")]
            if exp != got:
                bad.append((t, exp, got))
        assert not bad, bad[:5]


@pytest.mark.skipif(not hb.available(),
                    reason="system libharfbuzz not present")
class TestUseSundanese:
    """Sundanese (USE-routed): the invisible virama is a TERMINAL
    stacker (conjoins a following consonant, but a bare one accepts
    no trailing marks — unlike the Javanese pangkon); the final
    signs order panyecek < pangwisad < panglayar; pre-base vowels
    front only up to the nearest preceding stacker; the avagraha is
    a full base.

    Qualification at build time: ZERO divergences over the full
    72-cp block+supplement alphabet length<=2 with joiners (5,700
    strings) and a 21-cp core length<=3 exhaustive + 8,000 random
    (17,723).  Reduced here."""

    SUND = "tests/data/sundtest.ttf"

    @pytest.fixture(scope="class")
    def senv(self):
        from fontTools.ttLib import TTFont

        font = Font.open(self.SUND)
        names = TTFont(self.SUND).getGlyphOrder()
        with open(self.SUND, "rb") as f:
            data = f.read()
        return font, names, data

    def test_pinned_cases(self, senv):
        font, names, _ = senv
        sh = font.use_shaper

        def ours(cps):
            gids = [int(font.charmap.glyph_index(c)) for c in cps]
            return [names[g]
                    for g in sh.shape(cps, gids, script=b"sund")]

        # pasangan conjunct via the invisible virama
        assert ours([0x1B8A, 0x1BAB, 0x1B98]) == [
            "u1B8A", "ta.blw"]
        # a bare virama accepts NO trailing marks
        assert ours([0x1B8A, 0x1BAB, 0x1B80]) == [
            "u1B8A", "u1BAB", "u25CC", "u1B80"]
        # final signs: panyecek+panglayar joins, panglayar+panyecek
        # splits
        assert ours([0x1B8A, 0x1B80, 0x1B81]) == [
            "u1B8A", "u1B80", "u1B81"]
        assert ours([0x1B8A, 0x1B81, 0x1B80]) == [
            "u1B8A", "u1B81", "u25CC", "u1B80"]
        # pre-base vowel fronts only up to the stacker
        assert ours([0x1BAB, 0x1BB0, 0x1BA6]) == [
            "u25CC", "u1BAB", "u1BA6", "u1BB0"]
        # the avagraha hosts marks as a base
        assert ours([0x1BBA, 0x1B80]) == ["u1BBA", "u1B80"]

    def test_exhaustive_length2(self, senv):
        font, names, data = senv
        sh = font.use_shaper
        alpha = [0x1B80, 0x1B81, 0x1B82, 0x1B8A, 0x1B98, 0x1BA8,
                 0x1BA1, 0x1BA2, 0x1BA3, 0x1BA4, 0x1BA5, 0x1BA6,
                 0x1BA9, 0x1BAA, 0x1BAB, 0x1BAC, 0x1BAD, 0x1BB0,
                 0x1BBA, 0x1CC0, 0x20, 0x200C, 0x200D]
        hid = ("u200C", "u200D", "u0020")
        bad = []
        for a, b in itertools.product(alpha, repeat=2):
            t = chr(a) + chr(b)
            exp = ["sp" if names[g.gid] in hid else names[g.gid]
                   for g in hb.shape(data, t)]
            cps = [ord(c) for c in t]
            gids = [int(font.charmap.glyph_index(c)) for c in cps]
            got = ["sp" if names[g] in hid else names[g]
                   for g in sh.shape(cps, gids, script=b"sund")]
            if exp != got:
                bad.append((t, exp, got))
        assert not bad, bad[:5]

    def test_random_joiner_free(self, senv):
        font, names, data = senv
        sh = font.use_shaper
        from fontTools.ttLib import TTFont

        cmap = TTFont(self.SUND).getBestCmap()
        alpha = sorted(cp for cp in cmap
                       if 0x1B80 <= cp <= 0x1BBF
                       or 0x1CC0 <= cp <= 0x1CCF) + [0x20]
        rng = random.Random(20260819)
        bad = []
        for _ in range(800):
            t = "".join(chr(rng.choice(alpha))
                        for _ in range(rng.randint(3, 6)))
            exp = [names[g.gid] for g in hb.shape(data, t)]
            cps = [ord(c) for c in t]
            gids = [int(font.charmap.glyph_index(c)) for c in cps]
            got = [names[g]
                   for g in sh.shape(cps, gids, script=b"sund")]
            if exp != got:
                bad.append((t, exp, got))
        assert not bad, bad[:5]
