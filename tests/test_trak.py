"""AAT trak size-dependent tracking (`fontrx/font/trak.py`):
interpolation/extrapolation pinned against hb_shape (which applies
trak when a point size is set on the hb font)."""

import ctypes

import pytest

from fontrx.font.font import Font
from fontrx.native import hb
from fontrx.scene.layout import layout_text

PATH = "tests/data/traktest.ttf"


class TestCurve:
    def test_parse(self):
        font = Font.open(PATH)
        t = font.trak
        assert t is not None
        assert t.sizes == (12.0, 24.0)
        assert t.values == (-50, -100)

    @pytest.mark.parametrize("ptem,expect", [
        (12.0, -50.0),
        (24.0, -100.0),
        (18.0, -75.0),    # interpolated
        (48.0, -200.0),   # EXTRAPOLATED beyond the last size (hb)
        (6.0, -25.0),     # extrapolated below the first
    ])
    def test_value(self, ptem, expect):
        font = Font.open(PATH)
        assert font.trak.value(ptem) == expect

    def test_layout_tracks_advances(self):
        font = Font.open(PATH)
        base = layout_text(font, "AV")
        t = layout_text(font, "AV", tracking_ptem=12.0)
        # second glyph's cell narrowed by 50
        assert t.instances[1].x - base.instances[1].x == -50
        assert t.width == base.width - 100  # both cells track

    def test_absent_table_is_noop(self):
        dj = Font.open("/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf")
        a = layout_text(dj, "AV")
        b = layout_text(dj, "AV", tracking_ptem=12.0)
        assert [(i.x, i.y) for i in a.instances] == \
               [(i.x, i.y) for i in b.instances]


@pytest.mark.skipif(not hb.available(), reason="no libharfbuzz")
class TestHbDifferential:
    def _hb_positions(self, data, text, ptem):
        from fontrx.native.hb import _GlyphPos, _lib

        h = _lib()
        h.hb_font_set_ptem.argtypes = [ctypes.c_void_p, ctypes.c_float]
        h.hb_face_get_upem.restype = ctypes.c_uint
        h.hb_face_get_upem.argtypes = [ctypes.c_void_p]
        blob = h.hb_blob_create(data, len(data), 1, None, None)
        face = h.hb_face_create(blob, 0)
        font = h.hb_font_create(face)
        upem = h.hb_face_get_upem(face)
        h.hb_font_set_scale(font, upem, upem)
        h.hb_font_set_ptem(font, ptem)
        buf = h.hb_buffer_create()
        try:
            h.hb_buffer_add_utf8(buf, text.encode(), -1, 0, -1)
            h.hb_buffer_guess_segment_properties(buf)
            h.hb_shape(font, buf, None, 0)
            n = ctypes.c_uint()
            poss = h.hb_buffer_get_glyph_positions(buf, ctypes.byref(n))
            out = []
            pen = 0
            for i in range(n.value):
                out.append(pen + poss[i].x_offset)
                pen += poss[i].x_advance
            return out
        finally:
            h.hb_buffer_destroy(buf)
            h.hb_font_destroy(font)
            h.hb_face_destroy(face)
            h.hb_blob_destroy(blob)

    @pytest.mark.parametrize("ptem", [12.0, 18.0, 24.0, 48.0])
    def test_pen_positions_match_up_to_line_origin(self, ptem):
        font = Font.open(PATH)
        with open(PATH, "rb") as f:
            data = f.read()
        lt = layout_text(font, "AVA", tracking_ptem=ptem)
        ours = [round(i.x) for i in lt.instances]
        theirs = self._hb_positions(data, "AVA", ptem)
        # hb shifts every glyph by trunc(v/2) — a constant line-origin
        # offset fontrx omits (documented in layout_text)
        v = font.trak.value(ptem)
        shift = int(v / 2)
        assert ours == [p - shift for p in theirs]
