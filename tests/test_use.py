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
alphabet, 306 strings, 0 divergences).  The formerly-documented
multi-adjacent-joiner residual class was KILLED in round 4 (commit
7091e4b; see TestUseJoinerTransparency below): all twelve USE
scripts are now exact over core len<=3 exhaustive sweeps WITH
joiners."""

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


ZWNJ_CH, ZWJ_CH = "‌", "‍"


def _joiner_tokens(names, data, text, our_names, *,
                   space="u0020", zwnj="u200C", zwj="u200D"):
    """(hb tokens, our tokens) with hidden-glyph identity preserved
    wherever hb's output preserves it.

    hb renders default-ignorable joiners as a blanked space glyph.
    When that glyph keeps the joiner's own cluster (ZWNJ between
    clusters does), map it back to the joiner's glyph name so WHICH
    hidden glyph sits at a position participates in the differential.
    When hb merged the joiner's cluster into a neighbour (a ZWJ
    riding inside a formed cluster), the identity is unrecoverable
    from hb's output stream — both sides collapse to ``"hidden"`` at
    that position only.  Scope limit, documented: hb itself does not
    expose which ignorable a merged-cluster space glyph replaced."""
    from collections import Counter

    byte_of = {}
    off = 0
    for ch in text:
        byte_of[off] = ch
        off += len(ch.encode("utf-8"))
    total = off
    shaped = hb.shape(data, text)
    clusters = sorted({g.cluster for g in shaped})
    nxt = {c: (clusters[i + 1] if i + 1 < len(clusters) else total)
           for i, c in enumerate(clusters)}
    space_count = Counter(
        g.cluster for g in shaped if names[g.gid] == space)
    exp = []
    for g in shaped:
        name = names[g.gid]
        if name == space:
            c = g.cluster
            span = [byte_of[b] for b in byte_of
                    if c <= b < nxt.get(c, total)]
            span_j = [ch for ch in span if ch in (ZWNJ_CH, ZWJ_CH)]
            span_sp = [ch for ch in span if ch == " "]
            if (space_count[c] == 1 and len(span_j) == 1
                    and not span_sp):
                name = zwnj if span_j[0] == ZWNJ_CH else zwj
            elif span_j:
                name = "hidden"
        exp.append(name)
    got = list(our_names)
    if len(got) == len(exp):
        for i, e in enumerate(exp):
            if e == "hidden" and got[i] in (zwnj, zwj, space):
                got[i] = "hidden"
    return exp, got


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
        exp, got = _joiner_tokens(
            names, data, text, _ours(env, text),
            space="space", zwnj="zwnj", zwj="zwj")
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
    exact for both; the longer multi-joiner residual was killed in
    round 4 (see TestUseJoinerTransparency)."""

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
        bad = []
        for a, b in itertools.product(alpha, repeat=2):
            t = chr(a) + chr(b)
            cps = [ord(c) for c in t]
            gids = [int(font.charmap.glyph_index(c)) for c in cps]
            exp, got = _joiner_tokens(
                names, data, t,
                [names[g] for g in sh.shape(cps, gids, script=tag)])
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
        bad = []
        for a, b in itertools.product(alpha, repeat=2):
            t = chr(a) + chr(b)
            cps = [ord(c) for c in t]
            gids = [int(font.charmap.glyph_index(c)) for c in cps]
            exp, got = _joiner_tokens(
                names, data, t,
                [names[g]
                 for g in sh.shape(cps, gids, script=b"tibt")])
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
        bad = []
        for a, b in itertools.product(alpha, repeat=2):
            t = chr(a) + chr(b)
            cps = [ord(c) for c in t]
            gids = [int(font.charmap.glyph_index(c)) for c in cps]
            exp, got = _joiner_tokens(
                names, data, t,
                [names[g]
                 for g in sh.shape(cps, gids, script=b"lana")])
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
        bad = []
        for a, b in itertools.product(alpha, repeat=2):
            t = chr(a) + chr(b)
            cps = [ord(c) for c in t]
            gids = [int(font.charmap.glyph_index(c)) for c in cps]
            exp, got = _joiner_tokens(
                names, data, t,
                [names[g]
                 for g in sh.shape(cps, gids, script=b"sund")])
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


@pytest.mark.skipif(not hb.available(),
                    reason="system libharfbuzz not present")
class TestUseLongTail:
    """The five long-tail USE scripts — Batak, Lepcha, Buginese,
    Saurashtra, Limbu — each hb-differential-pinned on a feaLib
    corpus font.

    Qualification at build time (reduced here): every script is
    FULLY EXACT over the full-block len<=2 exhaustive WITH joiners
    (batk 3,481 / lepc 5,929 / bugi 1,089 / saur 7,225 / limb 5,041
    strings), a core len<=3 exhaustive WITH joiners, 20,000
    random-with-joiners strings, and 4,000 random joiner-free
    strings — ZERO divergences everywhere.

    The probed category overrides these pinned (``use.py``
    ``_OVERRIDES``): Batak killers are repeatable vowel-group-leading
    halants and its vowel signs ride the VM slots; Lepcha vowel OO is
    a pre-base vowel; Buginese vowel U shares the above-vowel slot;
    Limbu kemphreng is a VMAbv; script punctuation (Batak symbols,
    Lepcha ta-rol, Buginese pallawa, Saurashtra dandas, Limbu
    loo/exclamation/question) hosts marks."""

    FONTS = {
        "batk": "tests/data/batktest.ttf",
        "lepc": "tests/data/lepctest.ttf",
        "bugi": "tests/data/bugitest.ttf",
        "saur": "tests/data/saurtest.ttf",
        "limb": "tests/data/limbtest.ttf",
    }

    def _env(self, tag):
        from fontTools.ttLib import TTFont

        path = self.FONTS[tag]
        font = Font.open(path)
        names = TTFont(path).getGlyphOrder()
        with open(path, "rb") as f:
            data = f.read()
        return font, names, data

    def _ours(self, env, tag, cps):
        font, names, _ = env
        gids = [int(font.charmap.glyph_index(c)) for c in cps]
        return [names[g] for g in font.use_shaper.shape(
            cps, gids, script=tag.encode())]

    @pytest.mark.parametrize("tag,cps,expected", [
        # Batak: pangolat haln ligature; killer+vowel joins (vowel
        # signs ride the VM slots: above before post); vowel+killer
        # dc-splits; nukta ccc-reorders before the killer; psts
        ("batk", [0x1BC0, 0x1BF2], ["ka.haln"]),
        ("batk", [0x1BC0, 0x1BF2, 0x1BE9, 0x1BE7],
         ["ka.haln", "u1BE9", "u1BE7"]),
        ("batk", [0x1BC0, 0x1BE7, 0x1BF2],
         ["k_aa", "u25CC", "u1BF2"]),
        ("batk", [0x1BC0, 0x1BF2, 0x1BE6],
         ["u1BC0", "u1BE6", "u1BF2"]),
        ("batk", [0x1BC0, 0x1BE7], ["k_aa"]),
        # Lepcha: vowel OO fronts; multiple pre-base vowels (incl.
        # the VMPre consonant signs) reverse; subjoined ya ligature;
        # punctuation hosts final marks
        ("lepc", [0x1C00, 0x1C29], ["u1C29", "u1C00"]),
        ("lepc", [0x1C17, 0x1C29, 0x1C27, 0x1C35],
         ["u1C35", "u1C27", "u1C29", "u1C17"]),
        ("lepc", [0x1C00, 0x1C24], ["k_ya"]),
        ("lepc", [0x1C00, 0x1C24, 0x1C27], ["u1C27", "k_ya"]),
        ("lepc", [0x1C3E, 0x1C2D], ["u1C3E", "u1C2D"]),
        # Buginese: vowels i/u/ae share one slot (u+i joins in
        # either order), e fronts — even over the pallawa
        ("bugi", [0x1A00, 0x1A18, 0x1A17],
         ["u1A00", "u1A18", "u1A17"]),
        ("bugi", [0x1A00, 0x1A1A], ["k_o"]),
        ("bugi", [0x1A1E, 0x1A19], ["u1A19", "u1A1E"]),
        ("bugi", [0x1A00, 0x1A19, 0x1A19],
         ["u1A19", "u1A19", "u1A00"]),
        # Saurashtra: true-halant conjunct below form; danda hosts
        # the candrabindu; psts ligature
        ("saur", [0xA892, 0xA8C4, 0xA8A4], ["uA892", "ta.blw"]),
        ("saur", [0xA892, 0xA8B5], ["k_aa"]),
        ("saur", [0xA8CE, 0xA8C5], ["uA8CE", "uA8C5"]),
        # Limbu: directly-encoded subjoined ya ligates; kemphreng is
        # a VM (follows VPst, precedes the small-letter finals);
        # mukphreng orders before the small letters
        ("limb", [0x1901, 0x1929], ["k_ya"]),
        ("limb", [0x1901, 0x1923], ["k_aa"]),
        ("limb", [0x1901, 0x1922, 0x193A],
         ["u1901", "u1922", "u193A"]),
        ("limb", [0x1901, 0x193A, 0x1930],
         ["u1901", "u193A", "u1930"]),
        ("limb", [0x1901, 0x1939, 0x1930],
         ["u1901", "u1939", "u1930"]),
        ("limb", [0x1940, 0x1920], ["u1940", "u1920"]),
    ])
    def test_pinned_cases(self, tag, cps, expected):
        env = self._env(tag)
        got = [g for g in self._ours(env, tag, cps)
               if g not in ("u200C", "u200D")]
        assert got == expected, (tag, cps, got)

    @pytest.mark.parametrize("tag", list(FONTS))
    def test_exhaustive_length2_with_joiners(self, tag):
        from fontTools.ttLib import TTFont

        env = self._env(tag)
        font, names, data = env
        cmap = TTFont(self.FONTS[tag]).getBestCmap()
        alpha = sorted(cp for cp in cmap
                       if cp not in (0x25CC, 0x20, 0x200C, 0x200D))
        full = alpha + [0x20, 0x200C, 0x200D]
        sh = font.use_shaper
        bad = []
        for a, b in itertools.product(full, repeat=2):
            t = chr(a) + chr(b)
            cps = [ord(c) for c in t]
            gids = [int(font.charmap.glyph_index(c)) for c in cps]
            exp, got = _joiner_tokens(
                names, data, t,
                [names[g]
                 for g in sh.shape(cps, gids, script=tag.encode())])
            if exp != got:
                bad.append((t, exp, got))
        assert not bad, bad[:5]

    @pytest.mark.parametrize("tag", list(FONTS))
    def test_random_len34_with_joiners(self, tag):
        """Seeded random length 3-4 differential sample WITH joiners
        — keeps the build-time long-string qualification (len<=3
        exhaustive, 20k random strings: 0 divergences) enforced by
        the committed suite (advisor round 3), covering the Batak
        killer chains and VM-slot overrides the len<=2 sweep cannot
        reach."""
        from fontTools.ttLib import TTFont

        env = self._env(tag)
        font, names, data = env
        cmap = TTFont(self.FONTS[tag]).getBestCmap()
        alpha = sorted(cp for cp in cmap
                       if cp not in (0x25CC, 0x20, 0x200C, 0x200D))
        full = alpha + [0x20, 0x200C, 0x200D]
        sh = font.use_shaper
        rng = random.Random(20260819 + sum(map(ord, tag)))
        bad = []
        for _ in range(400):
            t = "".join(chr(rng.choice(full))
                        for _ in range(rng.randint(3, 4)))
            cps = [ord(c) for c in t]
            gids = [int(font.charmap.glyph_index(c)) for c in cps]
            exp, got = _joiner_tokens(
                names, data, t,
                [names[g] for g in sh.shape(cps, gids,
                                            script=tag.encode())])
            if exp != got:
                bad.append((t, exp, got))
        assert not bad, (len(bad), bad[:5])

    @pytest.mark.parametrize("tag,text,expected", [
        ("batk", "ᯀ᯲", ["ka.haln"]),
        ("lepc", "ᰀᰩ", ["u1C29", "u1C00"]),
        ("bugi", "ᨀᨚ", ["k_o"]),
        ("saur", "ꢒ꣄ꢤ", ["uA892", "ta.blw"]),
        ("limb", "ᤁᤩ", ["k_ya"]),
    ])
    def test_layout_routes(self, tag, text, expected):
        from fontTools.ttLib import TTFont

        from fontrx.scene.layout import layout_text

        path = self.FONTS[tag]
        font = Font.open(path)
        names = TTFont(path).getGlyphOrder()
        lt = layout_text(font, text)
        got = [names[lt.slot_gids[i.glyph_slot]]
               for i in sorted(lt.instances, key=lambda i: i.x)]
        assert got == expected


@pytest.mark.skipif(not hb.available(),
                    reason="system libharfbuzz not present")
class TestUseFullBlock:
    """FULL-BLOCK random differentials — every codepoint the fixture
    cmap carries, not the curated qualification alphabets (round 4:
    this surfaced and killed the Javanese pada generic bases, the
    Balinese two-part-vowel normalization asymmetry, the Cham medial
    chain order and the unassigned-codepoint classes; build-time
    qualification 12,000 strings per script at ZERO divergences.
    Round 5 extends the sweep to the five long-tail scripts — Batak,
    Lepcha, Buginese, Saurashtra, Limbu — 2,000 full-block random
    strings each at build time, ZERO divergences)."""

    SPECS = {
        "java": ("tests/data/javatest.ttf", (0xA980, 0xA9DF)),
        "bali": ("tests/data/balitest.ttf", (0x1B00, 0x1B7F)),
        "cham": ("tests/data/chamtest.ttf", (0xAA00, 0xAA5F)),
        "sinh": ("tests/data/sinhtest.ttf", (0x0D80, 0x0DFF)),
        "tibt": ("tests/data/tibttest.ttf", (0x0F00, 0x0FFF)),
        "lana": ("tests/data/lanatest.ttf", (0x1A20, 0x1AAF)),
        "sund": ("tests/data/sundtest.ttf", (0x1B80, 0x1BBF)),
        "batk": ("tests/data/batktest.ttf", (0x1BC0, 0x1BFF)),
        "lepc": ("tests/data/lepctest.ttf", (0x1C00, 0x1C4F)),
        "bugi": ("tests/data/bugitest.ttf", (0x1A00, 0x1A1F)),
        "saur": ("tests/data/saurtest.ttf", (0xA880, 0xA8DF)),
        "limb": ("tests/data/limbtest.ttf", (0x1900, 0x194F)),
    }

    @pytest.mark.parametrize("tag", sorted(SPECS))
    def test_random_full_block(self, tag):
        from fontTools.ttLib import TTFont

        path, (lo, hi) = self.SPECS[tag]
        font = Font.open(path)
        names = TTFont(path).getGlyphOrder()
        with open(path, "rb") as f:
            data = f.read()
        cmap = TTFont(path).getBestCmap()
        alpha = (sorted(cp for cp in cmap if lo <= cp <= hi)
                 + [0x20, 0x200C, 0x200D])
        sh = font.use_shaper
        hid = ("u200C", "u200D", "u0020", "zwj", "zwnj", "space")
        rng = random.Random(20260818)
        bad = []
        for _ in range(600):
            t = "".join(chr(rng.choice(alpha))
                        for _ in range(rng.randint(3, 8)))
            exp = ["sp" if names[g.gid] in hid else names[g.gid]
                   for g in hb.shape(data, t)]
            cps = [ord(c) for c in t]
            gids = [int(font.charmap.glyph_index(c)) for c in cps]
            got = ["sp" if names[g] in hid else names[g]
                   for g in sh.shape(cps, gids, script=tag.encode())]
            if exp != got:
                bad.append((t, exp, got))
        assert not bad, (len(bad), bad[:3])


@pytest.mark.skipif(not hb.available(),
                    reason="system libharfbuzz not present")
class TestUseJoinerTransparency:
    """The joiner-transparency rules, hb-pinned across scripts: a
    joiner run carrying at most one ZWNJ is transparent between a
    cluster and its continuing marks (the joiner stays in place and
    still blocks GSUB); dangling/doubled ZWNJ runs take dotted
    circles per the anchored/initial rules.  These rules closed the
    previously-documented multi-joiner residuals: the seven earlier
    USE corpus scripts are now ALSO exact over core len<=3
    exhaustive sweeps WITH joiners (sinh/tibt/lana 2,954 strings
    each, bali 1,463, sund 1,884, java 2,379, cham 1,463 — ZERO
    divergences, build-time qualification)."""

    def _shape(self, path, tag, cps):
        from fontTools.ttLib import TTFont

        font = Font.open(path)
        names = TTFont(path).getGlyphOrder()
        gids = [int(font.charmap.glyph_index(c)) for c in cps]
        return [names[g] for g in font.use_shaper.shape(
            cps, gids, script=tag)]

    def test_single_joiner_absorbs_marks(self):
        # nukta rides through a ZWNJ (no dotted circle), and the
        # joiner stays put in the stream
        assert self._shape("tests/data/batktest.ttf", b"batk",
                           [0x1BC0, 0x200C, 0x1BE6]) == [
            "u1BC0", "u200C", "u1BE6"]
        # SUB continues through a ZWNJ
        assert self._shape("tests/data/limbtest.ttf", b"limb",
                           [0x1901, 0x200C, 0x1929]) == [
            "u1901", "u200C", "u1929"]
        # ...but the ligature stays blocked by the joiner glyph
        assert "k_ya" not in self._shape(
            "tests/data/limbtest.ttf", b"limb",
            [0x1901, 0x200C, 0x1929])

    def test_joiner_runs(self):
        # two ZWNJs do NOT absorb: the vowel breaks with its own dc,
        # and the initial-run rule dc's the first ZWNJ
        assert self._shape("tests/data/batktest.ttf", b"batk",
                           [0x1BC0, 0x200C, 0x200C, 0x1BE7]) == [
            "u1BC0", "u200C", "u200C", "u25CC", "u1BE7"]
        # ZWJ+ZWNJ+ZWJ (one ZWNJ) absorbs
        assert self._shape("tests/data/batktest.ttf", b"batk",
                           [0x1BC0, 0x200D, 0x200C, 0x200D,
                            0x1BE7]) == [
            "u1BC0", "u200D", "u200C", "u200D", "u1BE7"]
        # a dangling second ZWNJ anchored to a cluster takes a dc
        assert self._shape("tests/data/batktest.ttf", b"batk",
                           [0x1BC0, 0x200C, 0x200C]) == [
            "u1BC0", "u200C", "u25CC", "u200C"]
        # ...but a bare joiner pair has none
        assert self._shape("tests/data/batktest.ttf", b"batk",
                           [0x200C, 0x200C]) == ["u200C", "u200C"]

    def test_broken_cluster_joiners(self):
        # a broken (mark-first) cluster also absorbs through one
        # joiner
        assert self._shape("tests/data/saurtest.ttf", b"saur",
                           [0xA8B4, 0x200C, 0xA8B5]) == [
            "u25CC", "uA8B4", "u200C", "uA8B5"]
        # pre-base vowels front past the dc but never past a
        # cluster's leading joiner
        assert self._shape("tests/data/lepctest.ttf", b"lepc",
                           [0x200C, 0x1C27]) == [
            "u200C", "u1C27", "u25CC"]
        # string-initial ZWNJ before a conjunct: the dc rides the
        # cluster and the conjunct still forms
        assert self._shape("tests/data/balitest.ttf", b"bali",
                           [0x200C, 0x1B44, 0x1B13]) == [
            "u200C", "u25CC", "ka.blw"]
