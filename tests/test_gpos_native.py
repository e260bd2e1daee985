"""Native GPOS walk (``fontrx/native/gpos_walk.py`` +
``gpos_walk.cc``) vs the Python positioning engine: BYTE-IDENTICAL
position streams on every path the native walk claims (single/pair/
mark-to-base/mark-to-ligature/mark-to-mark, GDEF flag skipping), and
a clean Python fallback when the walk declines.

The hb differentials (test_hb_differential.py) qualify the combined
engine against HarfBuzz; this file pins native == Python directly so
a native bug cannot hide behind a compensating Python change."""

import random

import numpy as np
import pytest

from fontrx.font.font import Font
from fontrx.native import gpos_walk

DEJAVU = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"

FIXTURES = [
    DEJAVU,
    "tests/data/arabictest.ttf",
    "tests/data/devatest.ttf",
    "tests/data/khmrtest.ttf",
]


def _both_paths(font, text, **kw):
    from fontrx.scene.layout import layout_text

    kw.setdefault("positioning", (b"kern", b"mark", b"mkmk"))
    lt_native = layout_text(font, text, **kw)
    real = gpos_walk.apply_lookup
    gpos_walk.apply_lookup = lambda *a, **k: False
    try:
        # fresh Font: the shaper caches nothing position-dependent,
        # but a clean instance removes any doubt
        font2 = Font.open(font._path) if hasattr(font, "_path") else font
        lt_py = layout_text(font2, text, **kw)
    finally:
        gpos_walk.apply_lookup = real
    key = lambda lt: [(i.glyph_slot, i.x, i.y) for i in lt.instances]
    return key(lt_native), key(lt_py)


@pytest.fixture(scope="module")
def dj():
    return Font.open(DEJAVU)


class TestNativeWalkIdentity:
    @pytest.mark.parametrize("text", [
        "AVATAR fi Typewriter flight",
        "x̂ marks voilà ä́",     # mark + mkmk + NFC
        "difficult waffle WAVE To yo LTA VA Yo",
    ])
    def test_latin_pinned(self, dj, text):
        a, b = _both_paths(dj, text)
        assert a == b

    def test_random_latin(self, dj):
        rng = random.Random(20260820)
        alpha = ("abcdefghijklmnopqrstuvwxyz"
                 "ABCDEFGHIJKLMNOPQRSTUVWXYZ .,!?'́̂̈")
        for _ in range(40):
            text = "".join(rng.choice(alpha)
                           for _ in range(rng.randint(2, 60)))
            a, b = _both_paths(dj, text)
            assert a == b, text

    @pytest.mark.parametrize("path,texts", [
        ("tests/data/arabictest.ttf", ["السلام",
                                       "سلام"]),
        ("tests/data/devatest.ttf", ["निम्न"]),
        ("tests/data/khmrtest.ttf", ["ខ្មែរ"]),
    ])
    def test_fixture_fonts(self, path, texts):
        font = Font.open(path)
        for text in texts:
            a, b = _both_paths(font, text)
            assert a == b, (path, text)

    def test_flatten_roundtrip_stable(self, dj):
        """Flattening is deterministic and cached per lookup index."""
        pos = dj.positioner((b"kern", b"mark", b"mkmk"))
        if pos is None:
            pytest.skip("no positioner")
        blobs = {}
        for li in pos.order:
            lk = pos._lookup(li)
            if lk is None:
                continue
            blob = gpos_walk.flatten_lookup(lk)
            blobs[li] = blob
            again = gpos_walk.flatten_lookup(lk)
            if blob is None:
                assert again is None
            else:
                assert np.array_equal(blob, again)
        # DejaVu's kern/mark/mkmk lookups are all static types: the
        # walk must actually cover them (a silent full fallback would
        # vacuously pass the identity tests)
        assert any(b is not None for b in blobs.values())

    def test_python_fallback_when_unavailable(self, dj, monkeypatch):
        from fontrx import native

        monkeypatch.setattr(native, "_lib", None)
        monkeypatch.setattr(native, "_tried", True)
        a, b = _both_paths(dj, "AVATAR fi x̂")
        assert a == b


class TestGsubNativeIdentity:
    """Native GSUB walk (gsub_walk.cc) vs the Python substitution
    engine: identical glyph streams, ligature components, and final
    positions over randomized text and the complex-script fixtures."""

    def _both(self, font, text, **kw):
        from fontrx.native import gsub_walk
        from fontrx.scene.layout import layout_text

        kw.setdefault("ligatures", True)
        lt1 = layout_text(font, text, **kw)
        real = gsub_walk.apply_lookup
        gsub_walk.apply_lookup = lambda *a, **k: False
        try:
            lt2 = layout_text(font, text, **kw)
        finally:
            gsub_walk.apply_lookup = real
        key = lambda lt: ([lt.slot_gids[i.glyph_slot]
                           for i in lt.instances],
                          [(i.x, i.y) for i in lt.instances])
        return key(lt1), key(lt2)

    def test_random_latin_liga(self, dj):
        rng = random.Random(20260820)
        alpha = "afflight difficulty waffle offices THE fi fl ffi .,"
        for _ in range(30):
            text = "".join(rng.choice(alpha)
                           for _ in range(rng.randint(2, 80)))
            a, b = self._both(dj, text)
            assert a == b, text

    def test_liga_components_thread_to_gpos(self, dj):
        # a mark INSIDE a ligature: comp side channel must match so
        # GPOS mark-to-ligature attaches identically
        a, b = self._both(dj, "f́fi fí x̂fl",
                          positioning=(b"kern", b"mark", b"mkmk"))
        assert a == b

    @pytest.mark.parametrize("path,text", [
        ("tests/data/arabictest.ttf", "السلام"),
        ("tests/data/devatest.ttf", "निम्न"),
        ("tests/data/khmrtest.ttf", "ខ្មែរ"),
    ])
    def test_complex_fixtures(self, path, text):
        font = Font.open(path)
        a, b = self._both(font, text)
        assert a == b
