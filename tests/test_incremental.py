"""Incremental paragraph-cached layout: exact-merge differential.

The oracle is :func:`layout_text` on the full text; the contract is
field-for-field equality (slot order, packed batch arrays, instance
positions at full float precision, width/height) — the same
bit-identity bar every other fontrx subsystem meets.  Covers the
option matrix (legacy kern/marks, full GPOS, wrap+justify, rtl/bidi,
kashida, spacing), edit scripts (typing, backspace over paragraph
boundaries, newline insertion), cache reuse, variable-font
invalidation, and the declared fallback paths.
"""

import numpy as np
import pytest

from fontrx.font.font import Font
from fontrx.scene.incremental import IncrementalLayoutEngine
from fontrx.scene.layout import layout_text

from .conftest import DEJAVU

ARABIC = "tests/data/arabictest.ttf"
VAR = "tests/data/vartest.ttf"


def assert_layout_equal(a, b):
    assert a.slot_gids == b.slot_gids
    assert a.slot_chars == b.slot_chars
    np.testing.assert_array_equal(a.batch.segments, b.batch.segments)
    np.testing.assert_array_equal(a.batch.seg_counts, b.batch.seg_counts)
    np.testing.assert_array_equal(a.batch.boxes, b.batch.boxes)
    np.testing.assert_array_equal(
        a.batch.advance_widths, b.batch.advance_widths)
    assert a.batch.capacity == b.batch.capacity
    assert len(a.instances) == len(b.instances)
    for ia, ib in zip(a.instances, b.instances):
        assert ia.glyph_slot == ib.glyph_slot
        assert ia.x == ib.x and ia.y == ib.y
    assert a.width == b.width
    assert a.height == b.height


TEXT = (
    "The quick brown fox jumps over the lazy dog.\n"
    "Waltz, bad nymph, for quick jigs vex — fluffy 0123456789!\n"
    "\n"
    "office flag traffic afflict\n"
    "final paragraph, Voilà: café naïve"
)


@pytest.fixture(scope="module")
def dj():
    return Font.open(DEJAVU)


class TestExactMerge:
    @pytest.mark.parametrize("opts", [
        {},
        {"kern": True, "ligatures": True, "marks": True},
        {"kern": True, "ligatures": True, "marks": True,
         "positioning": (b"kern", b"mark", b"mkmk")},
        {"wrap_width": 18000.0, "align": "justify", "kern": True},
        {"wrap_width": 12000.0, "align": "center"},
        {"letter_spacing": 25.0, "word_spacing": 60.0},
        {"oblique": 0.21},
        {"alternate": 1, "features": (b"liga",)},
    ], ids=["plain", "legacy", "gpos", "justify", "center",
            "spacing", "oblique", "features"])
    def test_option_matrix(self, dj, opts):
        eng = IncrementalLayoutEngine(dj, **opts)
        assert_layout_equal(eng.layout(TEXT), layout_text(dj, TEXT, **opts))

    def test_edit_script(self, dj):
        """Typing, backspace, newline edits — every intermediate state
        merges exactly, with the cache warm from prior states."""
        eng = IncrementalLayoutEngine(
            dj, kern=True, ligatures=True, marks=True,
            positioning=(b"kern", b"mark", b"mkmk"))
        text = TEXT
        states = [text]
        for ch in "typed!":  # append typing
            text += ch
            states.append(text)
        states.append(text[:-3])          # backspace x3
        states.append(text[:-3] + "\n")   # newline insert
        states.append(text[:-3] + "\nnew para")
        states.append("")                 # clear all
        states.append("rebuilt from empty")
        for t in states:
            assert_layout_equal(
                eng.layout(t),
                layout_text(dj, t, kern=True, ligatures=True, marks=True,
                            positioning=(b"kern", b"mark", b"mkmk")))

    def test_edge_texts(self, dj):
        eng = IncrementalLayoutEngine(dj)
        for t in ["", "\n", "\n\n\n", "a", "a\n", "\na",
                  "é́ x́\nÿ"]:
            assert_layout_equal(eng.layout(t), layout_text(dj, t))

    def test_rtl_bidi(self, dj):
        txt = "שלום world\nabc עברית 123\nplain line"
        for opts in [{"rtl": True}, {"bidi": True},
                     {"bidi": True, "rtl": True},
                     {"bidi": True, "wrap_width": 9000.0}]:
            eng = IncrementalLayoutEngine(dj, **opts)
            assert_layout_equal(eng.layout(txt),
                                layout_text(dj, txt, **opts))

    def test_complex_script_paragraphs(self):
        """Mixed Devanagari/Thai paragraphs: the complex shapers run
        per line inside layout_text, so the paragraph merge must stay
        exact across reordering/mark-stacking scripts too."""
        font = Font.open("tests/data/devatest.ttf")
        txt = "क्षत्रिय कृपा\nनमस्ते धन्यवाद\nक्क क्त्र"
        eng = IncrementalLayoutEngine(font, positioning=(b"abvm", b"blwm"))
        assert_layout_equal(
            eng.layout(txt),
            layout_text(font, txt, positioning=(b"abvm", b"blwm")))
        thai = Font.open("tests/data/thaitest.ttf")
        ttxt = "สวัสดีครับ\nน้ำใจ ที่นี่\nกำไร"
        eng2 = IncrementalLayoutEngine(thai, marks=True)
        assert_layout_equal(eng2.layout(ttxt),
                            layout_text(thai, ttxt, marks=True))

    def test_arabic_kashida(self):
        font = Font.open(ARABIC)
        txt = "بسم محمد\n" \
              "كتب الولد"
        opts = dict(wrap_width=6000.0, align="justify", kashida=True,
                    positioning=(b"kern",))
        eng = IncrementalLayoutEngine(font, **opts)
        assert_layout_equal(eng.layout(txt), layout_text(font, txt, **opts))


class TestCacheBehavior:
    def test_paragraph_cache_hit(self, dj):
        eng = IncrementalLayoutEngine(dj, kern=True)
        eng.layout(TEXT)
        n0 = len(eng._cache)
        eng.layout(TEXT + "!")  # only the last paragraph changes
        assert len(eng._cache) == n0 + 1
        # unchanged paragraphs were NOT re-laid: their entries are the
        # same objects
        eng.layout(TEXT + "!?")
        assert len(eng._cache) == n0 + 2

    def test_lru_bound(self, dj):
        eng = IncrementalLayoutEngine(dj, cache_size=4)
        for i in range(10):
            eng.layout(f"para {i}")
        assert len(eng._cache) <= 4
        # correctness survives eviction
        assert_layout_equal(eng.layout("para 0"), layout_text(dj, "para 0"))

    def test_variation_invalidation(self):
        font = Font.open(VAR)
        ax = font.fvar.axes[0]
        eng = IncrementalLayoutEngine(font)
        txt = "AB\nBA"
        font.set_variation({ax.tag: ax.default_value})
        assert_layout_equal(eng.layout(txt), layout_text(font, txt))
        font.set_variation({ax.tag: ax.max_value})
        assert_layout_equal(eng.layout(txt), layout_text(font, txt))
        font.set_variation({ax.tag: ax.min_value})
        assert_layout_equal(eng.layout(txt), layout_text(font, txt))


class TestBackspaceClusters:
    """The O(paragraph) backspace must match deleting the last n
    UAX#29 extended grapheme clusters of the WHOLE text (the previous
    implementation's semantics)."""

    @pytest.mark.parametrize("text", [
        "hello world",
        "para one\npara two",
        "ends with lf\n",
        "crlf pair\r\n",
        "a\r\nb",
        "ȩ́ stack",          # base + two marks = one cluster
        "fam: \U0001F468‍\U0001F469‍\U0001F467",  # ZWJ family
        "flags \U0001F1EB\U0001F1F7\U0001F1E9\U0001F1EA",
        "\n\n\n",
        "한글 끝",
    ])
    @pytest.mark.parametrize("n", [1, 2, 3, 50])
    def test_matches_whole_text_clusters(self, dj, text, n):
        from fontrx.engine.raster import RasterEngine
        from fontrx.font.uax29 import grapheme_clusters
        from fontrx.scene.interactive import InteractiveSession

        sess = InteractiveSession(dj, text, 64, 64, RasterEngine())
        sess.backspace(n)
        clusters = grapheme_clusters(text)
        expect = "".join(clusters[:-n]) if n < len(clusters) else ""
        assert sess.text == expect


class TestFallback:
    def test_vertical_falls_back(self, dj):
        eng = IncrementalLayoutEngine(dj, vertical=True)
        assert not eng._mergeable
        a = eng.layout("ab\ncd")
        b = layout_text(dj, "ab\ncd", vertical=True)
        assert_layout_equal(a, b)

    def test_decorations_fall_back(self, dj):
        eng = IncrementalLayoutEngine(dj, underline=True)
        assert not eng._mergeable
        assert_layout_equal(eng.layout("ab\ncd"),
                            layout_text(dj, "ab\ncd", underline=True))

    def test_fractional_line_height_falls_back(self, dj):
        eng = IncrementalLayoutEngine(dj, line_height=2400.5)
        assert_layout_equal(eng.layout("ab\ncd"),
                            layout_text(dj, "ab\ncd", line_height=2400.5))
        assert len(eng._cache) == 0  # never cached

    def test_explicit_integer_line_height_merges(self, dj):
        eng = IncrementalLayoutEngine(dj, line_height=3000)
        assert_layout_equal(eng.layout("ab\ncd\nef"),
                            layout_text(dj, "ab\ncd\nef", line_height=3000))
        assert len(eng._cache) == 3
