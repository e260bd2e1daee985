"""Dirty-strip incremental re-raster: band == full-render rows, and
the interactive edit loop's spliced page == a fresh full render.

Winding is row-local, so a band render (``render_direct(band=(y0,
bh))``) must equal rows ``[y0, y0+bh)`` of the full render BIT-FOR-BIT
— the full render itself computes in row bands, the band option only
re-anchors the split.  The session-level cache then splices edited
bands into the previous page; every frame must equal what a
from-scratch session would render.
"""

import numpy as np
import pytest

from fontrx.engine.raster import RasterEngine
from fontrx.font.font import Font
from fontrx.scene.interactive import InteractiveSession

from .conftest import DEJAVU


@pytest.fixture(scope="module")
def dj():
    return Font.open(DEJAVU)


TEXT = "\n".join(
    f"Paragraph {i}: quick brown foxes office {i}!" for i in range(14)
)


class TestBandRender:
    @pytest.mark.parametrize("y0", [0, 64, 128, 200, 264])
    def test_band_equals_full_rows(self, dj, y0):
        from fontrx.scene.page import PageRenderer
        from fontrx.scene.layout import layout_text

        lay = layout_text(dj, TEXT, kern=True)
        r = PageRenderer(dj, lay, 480, 520, RasterEngine())
        from fontrx.scene.transform import ViewTransform

        view = ViewTransform.init(dj.info.units_per_em, 480, 520)
        full = np.asarray(r.render_direct(view))
        band = np.asarray(r.render_direct(view, band=(y0, 256)))
        np.testing.assert_array_equal(band, full[y0 : y0 + 256])

    def test_band_wide_page(self, dj):
        """pw >= 1024 routes the deferred-carry page kernel — band
        anchoring must hold there too."""
        from fontrx.scene.page import PageRenderer
        from fontrx.scene.layout import layout_text
        from fontrx.scene.transform import ViewTransform

        lay = layout_text(dj, TEXT, kern=True)
        r = PageRenderer(dj, lay, 1100, 400, RasterEngine())
        view = ViewTransform.init(dj.info.units_per_em, 1100, 400)
        full = np.asarray(r.render_direct(view))
        band = np.asarray(r.render_direct(view, band=(96, 256)))
        np.testing.assert_array_equal(band, full[96 : 96 + 256])


class TestEditSplice:
    def _fresh_page(self, dj, text, w, h, view):
        s2 = InteractiveSession(dj, text, w, h, RasterEngine(),
                                kern=True, ligatures=True)
        s2.view = view
        return np.asarray(s2.frame())

    def test_edit_loop_matches_fresh_renders(self, dj):
        sess = InteractiveSession(dj, TEXT, 480, 520, RasterEngine(),
                                  kern=True, ligatures=True)
        sess.frame()  # full render, cache primed
        edits = [
            lambda: sess.char_input("x"),
            lambda: sess.char_input("yz!"),
            lambda: sess.backspace(2),
            lambda: sess.char_input("\nnew paragraph"),  # line count grows
            lambda: sess.backspace(30),                  # spans paragraphs
        ]
        for do in edits:
            do()
            page = np.asarray(sess.frame())
            fresh = self._fresh_page(dj, sess.text, 480, 520, sess.view)
            np.testing.assert_array_equal(page, fresh)

    def test_zoom_invalidates_then_edit_bands_again(self, dj):
        sess = InteractiveSession(dj, TEXT, 480, 520, RasterEngine(),
                                  kern=True, ligatures=True)
        sess.frame()
        sess.scroll(1.0, (0.2, 0.3))
        page = np.asarray(sess.frame())  # full render at new zoom
        fresh = self._fresh_page(dj, sess.text, 480, 520, sess.view)
        np.testing.assert_array_equal(page, fresh)
        sess.char_input("Q")
        page = np.asarray(sess.frame())  # banded at the new view
        fresh = self._fresh_page(dj, sess.text, 480, 520, sess.view)
        np.testing.assert_array_equal(page, fresh)

    def test_unchanged_frame_reuses_cache(self, dj):
        sess = InteractiveSession(dj, TEXT, 480, 520, RasterEngine())
        p1 = sess.frame()
        p2 = sess.frame()  # no events, no edits
        assert sess._pending_dirty == ()
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))

    def test_wide_page_session_edits(self, dj):
        """1100-px pages route the deferred-carry page kernel; the
        session splice must hold there too."""
        sess = InteractiveSession(dj, TEXT, 1100, 400, RasterEngine(),
                                  kern=True)
        sess.frame()
        for edit in (lambda: sess.char_input("wide"),
                     lambda: sess.backspace(1)):
            edit()
            page = np.asarray(sess.frame())
            s2 = InteractiveSession(dj, sess.text, 1100, 400,
                                    RasterEngine(), kern=True)
            s2.view = sess.view
            np.testing.assert_array_equal(page, np.asarray(s2.frame()))

    def test_short_page_falls_back_to_full(self, dj):
        """Pages shorter than the band height always full-render —
        and stay correct."""
        sess = InteractiveSession(dj, "one\ntwo\nthree", 320, 200,
                                  RasterEngine())
        sess.frame()
        sess.char_input("!")
        page = np.asarray(sess.frame())
        s2 = InteractiveSession(dj, sess.text, 320, 200, RasterEngine())
        s2.view = sess.view
        np.testing.assert_array_equal(page, np.asarray(s2.frame()))

    def test_edit_overhang_covered_by_margins(self, dj):
        """Glyphs with tall ascenders/descenders near the band edge:
        the union margin must keep neighbors' ink intact."""
        sess = InteractiveSession(dj, TEXT, 480, 520, RasterEngine())
        sess.frame()
        sess.char_input(" QjÂÇ")  # descender + accents
        page = np.asarray(sess.frame())
        fresh = self._fresh_page_plain(dj, sess.text, sess.view)
        np.testing.assert_array_equal(page, fresh)

    def _fresh_page_plain(self, dj, text, view):
        s2 = InteractiveSession(dj, text, 480, 520, RasterEngine())
        s2.view = view
        return np.asarray(s2.frame())
