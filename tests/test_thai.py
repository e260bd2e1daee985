"""Thai/Lao shaping (``fontrx/font/thai.py``): SARA AM decomposition
+ legacy PUA mark shaping, validated by an EXACT HarfBuzz
differential over an old-style corpus font (``thaitest.ttf``: full
Thai block + Lao subset + Windows-PUA preshaped variants, no GSUB —
the configuration that activates the PUA path)."""

import itertools
import random

import pytest

from fontrx.font.font import Font
from fontrx.font.thai import preprocess_sara_am
from fontrx.native import hb

THAI = "tests/data/thaitest.ttf"


@pytest.fixture(scope="module")
def font():
    return Font.open(THAI)


@pytest.fixture(scope="module")
def env(font):
    from fontTools.ttLib import TTFont

    names = TTFont(THAI).getGlyphOrder()
    with open(THAI, "rb") as f:
        data = f.read()
    return font, names, data


def _ours(font, names, text, script=b"thai"):
    sh = font.thai_shaper
    cps = sh.shape([ord(c) for c in text], script=script)
    return [names[int(font.charmap.glyph_index(c))] for c in cps]


class TestThaiShaper:
    def test_sara_am_decomposes(self):
        assert preprocess_sara_am([0x0E01, 0x0E33]) == [
            0x0E01, 0x0E4D, 0x0E32]
        # nikhahit floats back over tone marks
        assert preprocess_sara_am([0x0E01, 0x0E48, 0x0E33]) == [
            0x0E01, 0x0E4D, 0x0E48, 0x0E32]
        # Lao: niggahita + aa, over Lao tones
        assert preprocess_sara_am([0x0E81, 0x0EC8, 0x0EB3]) == [
            0x0E81, 0x0ECD, 0x0EC8, 0x0EB2]

    def test_pua_cases(self, env):
        font, names, _ = env
        cases = {
            # above vowel left-shifts after an ascender
            "ปิ": ["u0E1B", "uF701"],
            # ...but not after a plain consonant
            "กิ": ["u0E01", "u0E34"],
            # tone straight after an ascender: down-left form
            "ป่": ["u0E1B", "uF705"],
            # tone straight after a plain consonant: dropped form
            "ก่": ["u0E01", "uF70A"],
            # tone above an above-vowel on an ascender: top-left form
            "ปิ่": ["u0E1B", "uF701", "uF713"],
            # ...unchanged on a plain consonant
            "กิ่": ["u0E01", "u0E34", "u0E48"],
            # removable-descender consonant before a below vowel
            "ญุ": ["uF70F", "u0E38"],
            # joined-descender consonant lowers the below vowel
            "ฎุ": ["u0E0E", "uF718"],
            # SARA AM after an ascender: shifted nikhahit + aa
            "ปำ": ["u0E1B", "uF711", "u0E32"],
        }
        for text, expected in cases.items():
            assert _ours(font, names, text) == expected, text

    def test_pua_off_with_thai_gsub(self):
        import io

        from fontTools.feaLib.builder import (
            addOpenTypeFeaturesFromString,
        )
        from fontTools.fontBuilder import FontBuilder
        from fontTools.pens.ttGlyphPen import TTGlyphPen

        cps = list(range(0x0E01, 0x0E5C)) + [0xF701, 0xF705]
        fb = FontBuilder(1000, isTTF=True)
        names = [".notdef"] + [f"u{cp:04X}" for cp in cps]
        fb.setupGlyphOrder(names)
        fb.setupCharacterMap({cp: f"u{cp:04X}" for cp in cps})
        pen = TTGlyphPen(glyphSet={})
        pen.moveTo((0, 0))
        pen.lineTo((10, 0))
        pen.lineTo((10, 10))
        pen.closePath()
        g = pen.glyph()
        fb.setupGlyf({n: g for n in names})
        fb.setupHorizontalMetrics({n: (500, 0) for n in names})
        fb.setupHorizontalHeader(ascent=800, descent=-200)
        fb.setupNameTable({"familyName": "T", "styleName": "R"})
        fb.setupOS2()
        fb.setupPost()
        addOpenTypeFeaturesFromString(
            fb.font,
            "languagesystem DFLT dflt;\n"
            "languagesystem thai dflt;\n"
            "feature liga { sub u0E01 u0E02 by u0E03; } liga;")
        import tempfile

        buf = io.BytesIO()
        fb.save(buf)
        with tempfile.NamedTemporaryFile(suffix=".ttf") as tf:
            tf.write(buf.getvalue())
            tf.flush()
            font = Font.open(tf.name)
        sh = font.thai_shaper
        assert not sh.pua_active
        # AM still decomposes; marks stay plain
        assert sh.shape([0x0E1B, 0x0E34], script=b"thai") == [
            0x0E1B, 0x0E34]
        assert sh.shape([0x0E01, 0x0E33], script=b"thai") == [
            0x0E01, 0x0E4D, 0x0E32]

    def test_layout_routes_thai(self, env):
        from fontrx.scene.layout import layout_text

        font, names, _ = env
        lt = layout_text(font, "ป่ำ")
        got = [names[lt.slot_gids[i.glyph_slot]]
               for i in sorted(lt.instances, key=lambda i: i.x)]
        assert got == ["u0E1B", "uF711", "uF713", "u0E32"]


@pytest.mark.skipif(not hb.available(),
                    reason="system libharfbuzz not present")
class TestThaiHbDifferential:
    """Exact glyph-stream agreement with hb_shape on the corpus
    font: exhaustive pairs over the consonant-class representatives x
    every mark, plus a seeded random corpus over the full alphabet."""

    def _diff(self, env, text):
        font, names, data = env
        exp = [names[g.gid] for g in hb.shape(data, text)]
        got = _ours(font, names, text)
        return None if got == exp else (text, exp, got)

    def test_class_mark_matrix(self, env):
        reps = [0x0E01, 0x0E1B, 0x0E1D, 0x0E0D, 0x0E10, 0x0E0E,
                0x0E19, 0x0E23]
        marks = ([0x0E31, 0x0E33, 0x0E34, 0x0E36, 0x0E38, 0x0E39,
                  0x0E3A, 0x0E47, 0x0E48, 0x0E4A, 0x0E4C, 0x0E4D])
        bad = []
        for c in reps:
            for m1, m2 in itertools.product(marks, repeat=2):
                d = self._diff(env, chr(c) + chr(m1) + chr(m2))
                if d:
                    bad.append(d)
        assert not bad, bad[:5]

    def test_random_corpus(self, env):
        font, names, data = env
        from fontTools.ttLib import TTFont

        alpha = sorted(cp for cp in TTFont(THAI).getBestCmap()
                       if 0x0E00 <= cp <= 0x0E5B) + [0x20]
        rng = random.Random(20260818)
        bad = []
        for _ in range(1500):
            t = "".join(chr(rng.choice(alpha))
                        for _ in range(rng.randint(2, 8)))
            d = self._diff(env, t)
            if d:
                bad.append(d)
        assert not bad, bad[:5]
