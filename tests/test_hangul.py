"""Hangul shaping (``fontrx/font/hangul.py``): jamo composition /
decomposition by font coverage, tone-mark reordering, jmo features —
validated by an exact HarfBuzz differential over in-memory fonts
with three coverage profiles (precomposed+jamo, jamo-only,
tone-marked)."""

import io
import itertools
import tempfile

import pytest

from fontrx.font.font import Font
from fontrx.native import hb


def _build(precomposed=True, tone=False):
    from fontTools.fontBuilder import FontBuilder
    from fontTools.pens.ttGlyphPen import TTGlyphPen

    cps = (list(range(0x1100, 0x1113)) + list(range(0x1161, 0x1176))
           + list(range(0x11A8, 0x11C3)) + [0x25CC, 0x20])
    if precomposed:
        cps += [0xAC00, 0xAC01, 0xB098, 0xD55C, 0xAE00]
    if tone:
        cps += [0x302E, 0x302F]
    fb = FontBuilder(1000, isTTF=True)
    names = [".notdef"] + [f"u{cp:04X}" for cp in cps]
    fb.setupGlyphOrder(names)
    fb.setupCharacterMap({cp: f"u{cp:04X}" for cp in cps})
    pen = TTGlyphPen(glyphSet={})
    pen.moveTo((0, 0))
    pen.lineTo((10, 0))
    pen.lineTo((10, 10))
    pen.closePath()
    fb.setupGlyf({n: pen.glyph() for n in names})
    fb.setupHorizontalMetrics({n: (500, 0) for n in names})
    fb.setupHorizontalHeader(ascent=800, descent=-200)
    fb.setupNameTable({"familyName": "H", "styleName": "R"})
    fb.setupOS2()
    fb.setupPost()
    buf = io.BytesIO()
    fb.save(buf)
    with tempfile.NamedTemporaryFile(suffix=".ttf",
                                     delete=False) as tf:
        tf.write(buf.getvalue())
        path = tf.name
    return Font.open(path), names, buf.getvalue()


@pytest.fixture(scope="module")
def full():
    return _build(precomposed=True, tone=True)


@pytest.fixture(scope="module")
def jamo_only():
    return _build(precomposed=False)


def _ours(env, text):
    font, names, _ = env
    cps = [ord(c) for c in text]
    gids = [int(font.charmap.glyph_index(c)) for c in cps]
    return [names[g] for g in font.hangul_shaper.shape(cps, gids)]


class TestHangulShaper:
    def test_composition(self, full):
        # L+V composes to the mapped syllable
        assert _ours(full, "가") == ["uAC00"]
        # L+V+T likewise
        assert _ours(full, "각") == ["uAC01"]
        # a T extends an already-precomposed LV syllable
        assert _ours(full, "각") == ["uAC01"]
        # unmapped target stays decomposed
        assert _ours(full, "낙") == [
            "u1102", "u1161", "u11A8"]

    def test_decomposition(self, full):
        # an unmapped precomposed syllable decomposes to mapped jamo
        assert _ours(full, "납") == ["u1102", "u1161", "u11B8"]

    def test_tone_marks(self, full):
        # the tone mark moves to the front of its syllable
        assert _ours(full, "가〮") == ["u302E", "uAC00"]
        assert _ours(full, "가〮") == [
            "u302E", "uAC00"]
        # a lone tone mark gets a dotted-circle carrier after it
        assert _ours(full, "〮") == ["u302E", "u25CC"]

    def test_jamo_only_font(self, jamo_only):
        # no precomposed coverage: jamo stay; precomposed decompose
        assert _ours(jamo_only, "가") == ["u1100", "u1161"]
        assert _ours(jamo_only, "가") == ["u1100", "u1161"]


@pytest.mark.skipif(not hb.available(),
                    reason="system libharfbuzz not present")
class TestHangulHbDifferential:
    def _diff(self, env, text):
        font, names, data = env
        exp = [names[g.gid] for g in hb.shape(data, text)]
        got = _ours(env, text)
        return None if got == exp else (text, exp, got)

    def test_jamo_matrix(self, full, jamo_only):
        ls = [0x1100, 0x1102, 0x1112]
        vs = [0x1161, 0x1173, 0x1175]
        ts = [0, 0x11A8, 0x11AB, 0x11C2]
        bad = []
        for env in (full, jamo_only):
            for l, v, t in itertools.product(ls, vs, ts):
                text = chr(l) + chr(v) + (chr(t) if t else "")
                d = self._diff(env, text)
                if d:
                    bad.append(d)
                s = 0xAC00 + ((l - 0x1100) * 21 + (v - 0x1161)) * 28 \
                    + (t - 0x11A7 if t else 0)
                d = self._diff(env, chr(s))
                if d:
                    bad.append(d)
        assert not bad, bad[:5]

    def test_tone_and_random(self, full):
        import random

        rng = random.Random(20260818)
        alpha = ([0x1100, 0x1102, 0x1161, 0x1175, 0x11A8, 0xAC00,
                  0xB098, 0x302E, 0x302F, 0x20])
        bad = []
        for _ in range(2000):
            t = "".join(chr(rng.choice(alpha))
                        for _ in range(rng.randint(1, 6)))
            d = self._diff(full, t)
            if d:
                bad.append(d)
        assert not bad, bad[:5]
