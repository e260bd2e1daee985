"""ctypes bindings for the system HarfBuzz library — a SHAPING
DIFFERENTIAL ORACLE for the test suite.

fontrx's GSUB/GPOS engines are validated by synthetic fixtures and
fontTools raster differentials; HarfBuzz is the industry-reference
shaper, and the system image carries ``libharfbuzz.so.0`` even though
no ``uharfbuzz`` wheel ships.  Binding ``hb_shape`` directly gives the
tests an independent end-to-end oracle: the same font + text + feature
set must produce the same glyph stream and the same cumulative
pen positions (font units) through both engines.

Test-only (nothing in the render path imports this); degrades to
``available() == False`` when the library is absent, and the
differential tests skip.
"""

from __future__ import annotations

import ctypes
import ctypes.util
from dataclasses import dataclass

from fontrx.utils.log import get_logger

log = get_logger("HarfBuzz")

_hb = None


def _lib():
    global _hb
    if _hb is None:
        name = ctypes.util.find_library("harfbuzz")
        try:
            _hb = ctypes.CDLL(name or "libharfbuzz.so.0")
        except OSError as e:
            log.info("libharfbuzz unavailable: %s", e)
            _hb = False
        if _hb:
            _hb.hb_blob_create.restype = ctypes.c_void_p
            _hb.hb_blob_create.argtypes = [
                ctypes.c_char_p, ctypes.c_uint, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_void_p]
            _hb.hb_face_create.restype = ctypes.c_void_p
            _hb.hb_face_create.argtypes = [ctypes.c_void_p,
                                           ctypes.c_uint]
            _hb.hb_font_create.restype = ctypes.c_void_p
            _hb.hb_font_create.argtypes = [ctypes.c_void_p]
            _hb.hb_font_set_scale.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
            _hb.hb_buffer_create.restype = ctypes.c_void_p
            _hb.hb_buffer_add_utf8.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
                ctypes.c_uint, ctypes.c_int]
            _hb.hb_buffer_guess_segment_properties.argtypes = [
                ctypes.c_void_p]
            _hb.hb_buffer_set_direction.argtypes = [
                ctypes.c_void_p, ctypes.c_int]
            _hb.hb_shape.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_uint]
            _hb.hb_buffer_get_length.restype = ctypes.c_uint
            _hb.hb_buffer_get_length.argtypes = [ctypes.c_void_p]
            _hb.hb_buffer_get_glyph_infos.restype = ctypes.POINTER(
                _GlyphInfo)
            _hb.hb_buffer_get_glyph_infos.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint)]
            _hb.hb_buffer_get_glyph_positions.restype = ctypes.POINTER(
                _GlyphPos)
            _hb.hb_buffer_get_glyph_positions.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint)]
            _hb.hb_buffer_destroy.argtypes = [ctypes.c_void_p]
            _hb.hb_font_destroy.argtypes = [ctypes.c_void_p]
            _hb.hb_face_destroy.argtypes = [ctypes.c_void_p]
            _hb.hb_blob_destroy.argtypes = [ctypes.c_void_p]
            _hb.hb_feature_from_string.restype = ctypes.c_int
            _hb.hb_feature_from_string.argtypes = [
                ctypes.c_char_p, ctypes.c_int,
                ctypes.POINTER(_Feature)]
            _hb.hb_version_string.restype = ctypes.c_char_p
    return _hb


class _GlyphInfo(ctypes.Structure):
    _fields_ = [("codepoint", ctypes.c_uint32),
                ("mask", ctypes.c_uint32),
                ("cluster", ctypes.c_uint32),
                ("var1", ctypes.c_uint32),
                ("var2", ctypes.c_uint32)]


class _GlyphPos(ctypes.Structure):
    _fields_ = [("x_advance", ctypes.c_int32),
                ("y_advance", ctypes.c_int32),
                ("x_offset", ctypes.c_int32),
                ("y_offset", ctypes.c_int32),
                ("var", ctypes.c_uint32)]


class _Feature(ctypes.Structure):
    _fields_ = [("tag", ctypes.c_uint32),
                ("value", ctypes.c_uint32),
                ("start", ctypes.c_uint),
                ("end", ctypes.c_uint)]


def available() -> bool:
    return bool(_lib())


def version() -> str:
    hb = _lib()
    return hb.hb_version_string().decode() if hb else ""


@dataclass(frozen=True)
class ShapedGlyph:
    gid: int
    cluster: int
    x_advance: int
    y_advance: int
    x_offset: int
    y_offset: int


# hb_direction_t
DIR_LTR, DIR_RTL, DIR_TTB, DIR_BTT = 4, 5, 6, 7

_MEMORY_MODE_DUPLICATE = 1


def shape(font_bytes: bytes, text: str, *, features: str = "",
          direction: int | None = None,
          upem: int | None = None) -> list[ShapedGlyph]:
    """Shape ``text`` with HarfBuzz: glyph stream + positions in FONT
    UNITS (the font scale is set to the face's upem, matching
    fontrx's layout coordinate space).

    ``features``: comma-separated hb feature strings (``"kern=0"``,
    ``"-liga"``, ``"dlig"``, ...) layered over hb's defaults.
    """
    hb = _lib()
    if not hb:
        raise RuntimeError("libharfbuzz unavailable")
    blob = hb.hb_blob_create(font_bytes, len(font_bytes),
                             _MEMORY_MODE_DUPLICATE, None, None)
    face = hb.hb_face_create(blob, 0)
    font = hb.hb_font_create(face)
    if upem is None:
        hb.hb_face_get_upem.restype = ctypes.c_uint
        hb.hb_face_get_upem.argtypes = [ctypes.c_void_p]
        upem = int(hb.hb_face_get_upem(face))
    hb.hb_font_set_scale(font, upem, upem)
    buf = hb.hb_buffer_create()
    try:
        hb.hb_buffer_add_utf8(buf, text.encode("utf-8"), -1, 0, -1)
        hb.hb_buffer_guess_segment_properties(buf)
        if direction is not None:
            hb.hb_buffer_set_direction(buf, direction)
        feats = []
        for fs in (features or "").split(","):
            fs = fs.strip()
            if not fs:
                continue
            f = _Feature()
            if hb.hb_feature_from_string(fs.encode(), -1,
                                         ctypes.byref(f)):
                feats.append(f)
        arr = (_Feature * len(feats))(*feats) if feats else None
        hb.hb_shape(font, buf, arr, len(feats))
        n = ctypes.c_uint()
        infos = hb.hb_buffer_get_glyph_infos(buf, ctypes.byref(n))
        m = ctypes.c_uint()
        poss = hb.hb_buffer_get_glyph_positions(buf, ctypes.byref(m))
        out = []
        for i in range(n.value):
            out.append(ShapedGlyph(
                gid=int(infos[i].codepoint),
                cluster=int(infos[i].cluster),
                x_advance=int(poss[i].x_advance),
                y_advance=int(poss[i].y_advance),
                x_offset=int(poss[i].x_offset),
                y_offset=int(poss[i].y_offset),
            ))
        return out
    finally:
        hb.hb_buffer_destroy(buf)
        hb.hb_font_destroy(font)
        hb.hb_face_destroy(face)
        hb.hb_blob_destroy(blob)
