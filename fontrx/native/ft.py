"""ctypes bindings for the system FreeType library — a HINTING
DIFFERENTIAL ORACLE for the test suite.

fontrx's TrueType bytecode interpreter (``fontrx/font/hinting.py``)
grid-fits outlines the reference cannot even load (the reference
panics on instructed glyphs, ``/root/reference/src/font/Glyph.zig:85``).
FreeType is the industry-reference interpreter, and the system image
carries ``libfreetype.so.6`` even though no ``freetype-py`` wheel
ships.  Binding ``FT_Load_Glyph`` directly gives the tests an
independent bit-level oracle: the same font + ppem + glyph must
produce the same grid-fitted 26.6 outline and the same hinted advance
through both engines (FreeType run with ``interpreter-version = 35``,
the full bidirectional interpreter that matches fontrx's execution
model; v40 is the ClearType-era subset that ignores x-axis moves).

Test-only (nothing in the render path imports this); degrades to
``available() == False`` when the library is absent, and the
differential tests skip.
"""

from __future__ import annotations

import ctypes as C
from dataclasses import dataclass

import numpy as np

from fontrx.utils.log import get_logger

log = get_logger("FreeType")

FT_Long = C.c_long
FT_Int = C.c_int
FT_UInt = C.c_uint
FT_Short = C.c_short
FT_UShort = C.c_ushort
FT_Fixed = C.c_long
FT_Pos = C.c_long


class FT_Vector(C.Structure):
    _fields_ = [("x", FT_Pos), ("y", FT_Pos)]


class FT_BBox(C.Structure):
    _fields_ = [("xMin", FT_Pos), ("yMin", FT_Pos),
                ("xMax", FT_Pos), ("yMax", FT_Pos)]


class FT_Generic(C.Structure):
    _fields_ = [("data", C.c_void_p), ("finalizer", C.c_void_p)]


class FT_Glyph_Metrics(C.Structure):
    _fields_ = [(n, FT_Pos) for n in (
        "width", "height", "horiBearingX", "horiBearingY", "horiAdvance",
        "vertBearingX", "vertBearingY", "vertAdvance")]


class FT_Bitmap(C.Structure):
    _fields_ = [("rows", C.c_uint), ("width", C.c_uint),
                ("pitch", C.c_int), ("buffer", C.c_void_p),
                ("num_grays", C.c_ushort), ("pixel_mode", C.c_ubyte),
                ("palette_mode", C.c_ubyte), ("palette", C.c_void_p)]


class FT_Outline(C.Structure):
    _fields_ = [("n_contours", C.c_short), ("n_points", C.c_short),
                ("points", C.POINTER(FT_Vector)),
                ("tags", C.POINTER(C.c_ubyte)),
                ("contours", C.POINTER(C.c_short)),
                ("flags", C.c_int)]


class FT_GlyphSlotRec(C.Structure):
    _fields_ = [("library", C.c_void_p), ("face", C.c_void_p),
                ("next", C.c_void_p), ("glyph_index", FT_UInt),
                ("generic", FT_Generic), ("metrics", FT_Glyph_Metrics),
                ("linearHoriAdvance", FT_Fixed),
                ("linearVertAdvance", FT_Fixed),
                ("advance", FT_Vector), ("format", C.c_int),
                ("bitmap", FT_Bitmap), ("bitmap_left", C.c_int),
                ("bitmap_top", C.c_int), ("outline", FT_Outline),
                ("num_subglyphs", FT_UInt), ("subglyphs", C.c_void_p),
                ("control_data", C.c_void_p), ("control_len", C.c_long),
                ("lsb_delta", FT_Pos), ("rsb_delta", FT_Pos),
                ("other", C.c_void_p), ("internal", C.c_void_p)]


class FT_Size_Metrics(C.Structure):
    _fields_ = [("x_ppem", FT_UShort), ("y_ppem", FT_UShort),
                ("x_scale", FT_Fixed), ("y_scale", FT_Fixed),
                ("ascender", FT_Pos), ("descender", FT_Pos),
                ("height", FT_Pos), ("max_advance", FT_Pos)]


class FT_SizeRec(C.Structure):
    _fields_ = [("face", C.c_void_p), ("generic", FT_Generic),
                ("metrics", FT_Size_Metrics), ("internal", C.c_void_p)]


class FT_FaceRec(C.Structure):
    _fields_ = [("num_faces", FT_Long), ("face_index", FT_Long),
                ("face_flags", FT_Long), ("style_flags", FT_Long),
                ("num_glyphs", FT_Long),
                ("family_name", C.c_char_p), ("style_name", C.c_char_p),
                ("num_fixed_sizes", FT_Int),
                ("available_sizes", C.c_void_p),
                ("num_charmaps", FT_Int), ("charmaps", C.c_void_p),
                ("generic", FT_Generic), ("bbox", FT_BBox),
                ("units_per_EM", FT_UShort), ("ascender", FT_Short),
                ("descender", FT_Short), ("height", FT_Short),
                ("max_advance_width", FT_Short),
                ("max_advance_height", FT_Short),
                ("underline_position", FT_Short),
                ("underline_thickness", FT_Short),
                ("glyph", C.POINTER(FT_GlyphSlotRec)),
                ("size", C.POINTER(FT_SizeRec)),
                ("charmap", C.c_void_p)]


# FT_LOAD_* flags
LOAD_DEFAULT = 0
LOAD_NO_SCALE = 1 << 0
LOAD_NO_HINTING = 1 << 1
LOAD_RENDER = 1 << 2
LOAD_NO_BITMAP = 1 << 3
LOAD_NO_AUTOHINT = 1 << 15
LOAD_TARGET_NORMAL = 0
LOAD_TARGET_MONO = 2 << 16

_ft = None


def _lib_handle():
    global _ft
    if _ft is None:
        try:
            _ft = C.CDLL("libfreetype.so.6")
        except OSError as e:
            log.info("libfreetype unavailable: %s", e)
            _ft = False
            return _ft
        _ft.FT_Init_FreeType.argtypes = [C.POINTER(C.c_void_p)]
        _ft.FT_Done_FreeType.argtypes = [C.c_void_p]
        _ft.FT_Property_Set.argtypes = [
            C.c_void_p, C.c_char_p, C.c_char_p, C.c_void_p]
        _ft.FT_New_Memory_Face.argtypes = [
            C.c_void_p, C.c_char_p, FT_Long, FT_Long,
            C.POINTER(C.POINTER(FT_FaceRec))]
        _ft.FT_Done_Face.argtypes = [C.POINTER(FT_FaceRec)]
        _ft.FT_Set_Pixel_Sizes.argtypes = [
            C.POINTER(FT_FaceRec), FT_UInt, FT_UInt]
        _ft.FT_Load_Glyph.argtypes = [
            C.POINTER(FT_FaceRec), FT_UInt, C.c_int32]
        _ft.FT_Library_Version.argtypes = [
            C.c_void_p, C.POINTER(C.c_int), C.POINTER(C.c_int),
            C.POINTER(C.c_int)]
        _ft.FT_MulFix.restype = FT_Long
        _ft.FT_MulFix.argtypes = [FT_Long, FT_Long]
        _ft.FT_DivFix.restype = FT_Long
        _ft.FT_DivFix.argtypes = [FT_Long, FT_Long]
        _ft.FT_MulDiv.restype = FT_Long
        _ft.FT_MulDiv.argtypes = [FT_Long, FT_Long, FT_Long]
    return _ft


def available() -> bool:
    return bool(_lib_handle())


def version() -> tuple[int, int, int]:
    ft = _lib_handle()
    lib = C.c_void_p()
    ft.FT_Init_FreeType(C.byref(lib))
    a, b, c = C.c_int(), C.c_int(), C.c_int()
    ft.FT_Library_Version(lib, C.byref(a), C.byref(b), C.byref(c))
    ft.FT_Done_FreeType(lib)
    return a.value, b.value, c.value


def mulfix(a: int, b: int) -> int:
    return _lib_handle().FT_MulFix(a, b)


def divfix(a: int, b: int) -> int:
    return _lib_handle().FT_DivFix(a, b)


def muldiv(a: int, b: int, c: int) -> int:
    return _lib_handle().FT_MulDiv(a, b, c)


@dataclass
class LoadedGlyph:
    """One FT_Load_Glyph result: 26.6 outline + metrics."""

    points: np.ndarray          # (n, 2) int64, 26.6
    on_curve: np.ndarray        # (n,) bool (tag bit 0)
    tags: np.ndarray            # (n,) uint8 raw FT tags
    ends: tuple[int, ...]       # contour end indices
    advance_x: int              # hinted advance, 26.6 (grid-rounded)
    advance_y: int
    linear_advance: int         # 16.16 unhinted linearly-scaled
    hori_bearing_x: int         # 26.6
    hori_bearing_y: int
    hori_advance: int           # metrics.horiAdvance, 26.6


class Library:
    """One FT_Library with a pinned TrueType interpreter version."""

    def __init__(self, interpreter_version: int = 35):
        ft = _lib_handle()
        if not ft:
            raise RuntimeError("libfreetype unavailable")
        self._ft = ft
        self._lib = C.c_void_p()
        err = ft.FT_Init_FreeType(C.byref(self._lib))
        if err:
            raise RuntimeError(f"FT_Init_FreeType error {err}")
        v = C.c_uint(interpreter_version)
        err = ft.FT_Property_Set(
            self._lib, b"truetype", b"interpreter-version", C.byref(v))
        if err:
            raise RuntimeError(
                f"interpreter-version {interpreter_version}: error {err}")
        self.interpreter_version = interpreter_version

    def face(self, data: bytes, index: int = 0) -> "Face":
        return Face(self, data, index)


class Face:
    """One memory face; keeps the byte buffer alive."""

    def __init__(self, lib: Library, data: bytes, index: int = 0):
        self._lib = lib
        self._data = data           # FT reads from this buffer lazily
        self._face = C.POINTER(FT_FaceRec)()
        err = lib._ft.FT_New_Memory_Face(
            lib._lib, data, len(data), index, C.byref(self._face))
        if err:
            raise RuntimeError(f"FT_New_Memory_Face error {err}")
        self._ppem = None

    @property
    def num_glyphs(self) -> int:
        return int(self._face.contents.num_glyphs)

    @property
    def units_per_em(self) -> int:
        return int(self._face.contents.units_per_EM)

    def set_pixel_sizes(self, ppem: int) -> None:
        err = self._lib._ft.FT_Set_Pixel_Sizes(self._face, 0, ppem)
        if err:
            raise RuntimeError(f"FT_Set_Pixel_Sizes error {err}")
        self._ppem = ppem

    @property
    def x_scale(self) -> int:
        """The 16.16 font-unit -> 26.6 scale FreeType derived."""
        return int(self._face.contents.size.contents.metrics.x_scale)

    def load(self, gid: int,
             flags: int = LOAD_NO_BITMAP | LOAD_NO_AUTOHINT) -> LoadedGlyph:
        err = self._lib._ft.FT_Load_Glyph(self._face, gid, flags)
        if err:
            raise RuntimeError(f"FT_Load_Glyph({gid}) error {err}")
        slot = self._face.contents.glyph.contents
        o = slot.outline
        n = o.n_points
        pts = np.empty((n, 2), np.int64)
        tags = np.empty(n, np.uint8)
        for i in range(n):
            pts[i, 0] = o.points[i].x
            pts[i, 1] = o.points[i].y
            tags[i] = o.tags[i]
        ends = tuple(int(o.contours[i]) for i in range(o.n_contours))
        return LoadedGlyph(
            points=pts, on_curve=(tags & 1).astype(bool), tags=tags,
            ends=ends,
            advance_x=int(slot.advance.x), advance_y=int(slot.advance.y),
            linear_advance=int(slot.linearHoriAdvance),
            hori_bearing_x=int(slot.metrics.horiBearingX),
            hori_bearing_y=int(slot.metrics.horiBearingY),
            hori_advance=int(slot.metrics.horiAdvance))

    def __del__(self):
        try:
            if self._face:
                self._lib._ft.FT_Done_Face(self._face)
        except Exception:
            pass
