"""ctypes bindings for the system ICU bidi engine — an independent
UAX#9 oracle for the test suite.

The ROADMAP wished for the Unicode BidiTest vectors (the UCD files
don't ship in this environment); the system's ``libicuuc`` carries
ICU's reference ``ubidi_*`` implementation, which is the next best
gold standard: ``tests/test_icu_bidi.py`` differentials fontrx's
``uax9.resolve`` levels and visual order against it over pinned rule
cases and seeded random mixed-direction strings.

Debian ICU exports version-suffixed symbols (``ubidi_setPara_72``);
the binding resolves the suffix from the library name.  Test-only;
degrades to ``available() == False`` when the library is absent.
"""

from __future__ import annotations

import ctypes
import ctypes.util

from fontrx.utils.log import get_logger

log = get_logger("ICU")

_icu = None
_suffix = ""


def _lib():
    global _icu, _suffix
    if _icu is None:
        name = ctypes.util.find_library("icuuc")
        try:
            _icu = ctypes.CDLL(name or "libicuuc.so")
        except OSError as e:
            log.info("libicuuc unavailable: %s", e)
            _icu = False
            return _icu
        # resolve the Debian version suffix
        for suf in ("", "_72", "_71", "_70", "_74", "_73", "_75",
                    "_76"):
            if hasattr(_icu, f"ubidi_open{suf}"):
                _suffix = suf
                break
        else:
            log.info("no ubidi symbols found")
            _icu = False
    return _icu


def _fn(name):
    return getattr(_lib(), name + _suffix)


def _close(bidi):
    f = _fn("ubidi_close")
    f.argtypes = [ctypes.c_void_p]
    f(bidi)


def available() -> bool:
    return bool(_lib())


def symbol(name):
    """Version-suffixed ICU symbol (resolves the suffix first)."""
    if not _lib():
        raise RuntimeError("libicuuc unavailable")
    return _fn(name)


def bidi_levels(cps: list[int], rtl: bool) -> list[int] | None:
    """ICU's resolved embedding level per codepoint (UTF-16 surrogate
    pairs collapse back to one level per codepoint), or None on
    error."""
    icu = _lib()
    if not icu:
        return None
    text = "".join(chr(c) for c in cps)
    u16 = text.encode("utf-16-le")
    n = len(u16) // 2
    buf = ctypes.create_string_buffer(u16, len(u16))
    open_f = _fn("ubidi_open")
    open_f.restype = ctypes.c_void_p
    bidi = open_f()
    try:
        err = ctypes.c_int(0)
        set_para = _fn("ubidi_setPara")
        set_para.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                             ctypes.c_int32, ctypes.c_uint8,
                             ctypes.c_void_p,
                             ctypes.POINTER(ctypes.c_int)]
        set_para(bidi, buf, n, 1 if rtl else 0, None,
                 ctypes.byref(err))
        if err.value > 0:
            return None
        get_levels = _fn("ubidi_getLevels")
        get_levels.restype = ctypes.POINTER(ctypes.c_uint8)
        get_levels.argtypes = [ctypes.c_void_p,
                               ctypes.POINTER(ctypes.c_int)]
        lv = get_levels(bidi, ctypes.byref(err))
        if err.value > 0 or not lv:
            return None
        u16_levels = [lv[i] for i in range(n)]
        # collapse surrogate pairs: one level per codepoint
        out = []
        i = 0
        for c in cps:
            out.append(u16_levels[i])
            i += 2 if c > 0xFFFF else 1
        return out
    finally:
        _close(bidi)


def bidi_visual_order(cps: list[int], rtl: bool) -> list[int] | None:
    """Logical indices in visual order per ICU (UTF-16 indices mapped
    back to codepoint indices; BMP-only callers get them 1:1)."""
    icu = _lib()
    if not icu:
        return None
    text = "".join(chr(c) for c in cps)
    u16 = text.encode("utf-16-le")
    n = len(u16) // 2
    buf = ctypes.create_string_buffer(u16, len(u16))
    open_f = _fn("ubidi_open")
    open_f.restype = ctypes.c_void_p
    bidi = open_f()
    try:
        err = ctypes.c_int(0)
        set_para = _fn("ubidi_setPara")
        set_para.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                             ctypes.c_int32, ctypes.c_uint8,
                             ctypes.c_void_p,
                             ctypes.POINTER(ctypes.c_int)]
        set_para(bidi, buf, n, 1 if rtl else 0, None,
                 ctypes.byref(err))
        if err.value > 0:
            return None
        size_f = _fn("ubidi_getResultLength")
        size_f.restype = ctypes.c_int32
        size_f.argtypes = [ctypes.c_void_p]
        m = size_f(bidi)
        arr = (ctypes.c_int32 * max(m, 1))()
        get_map = _fn("ubidi_getVisualMap")
        get_map.argtypes = [ctypes.c_void_p,
                            ctypes.POINTER(ctypes.c_int32),
                            ctypes.POINTER(ctypes.c_int)]
        get_map(bidi, arr, ctypes.byref(err))
        if err.value > 0:
            return None
        # map u16 indices back to codepoint indices
        cp_of_u16 = []
        for ci, c in enumerate(cps):
            cp_of_u16.append(ci)
            if c > 0xFFFF:
                cp_of_u16.append(ci)
        seen = set()
        out = []
        for k in range(m):
            ci = cp_of_u16[arr[k]]
            if ci not in seen:
                seen.add(ci)
                out.append(ci)
        return out
    finally:
        _close(bidi)


UBRK_CHARACTER = 0
UBRK_LINE = 2


def character_breaks(text: str) -> list[int] | None:
    """ICU's UAX#29 extended-grapheme-cluster boundaries as codepoint
    offsets (cluster START positions, excluding 0), or None on error.
    Differential oracle for ``fontrx.font.uax29``."""
    return _breaks(text, UBRK_CHARACTER)


def line_breaks(text: str) -> list[int] | None:
    """ICU's UAX#14 line-break opportunities as codepoint offsets
    (positions where the NEXT line may start), or None on error.
    EXACT differential oracle for ``fontrx.font.uax14`` (and the
    soundness bar for every break the layout wrapper takes)."""
    return _breaks(text, UBRK_LINE)


def _breaks(text: str, kind: int) -> list[int] | None:
    icu = _lib()
    if not icu:
        return None
    u16 = text.encode("utf-16-le")
    n = len(u16) // 2
    buf = ctypes.create_string_buffer(u16, len(u16))
    err = ctypes.c_int(0)
    open_f = _fn("ubrk_open")
    open_f.restype = ctypes.c_void_p
    open_f.argtypes = [ctypes.c_int, ctypes.c_char_p,
                       ctypes.c_void_p, ctypes.c_int32,
                       ctypes.POINTER(ctypes.c_int)]
    bi = open_f(kind, b"en", buf, n, ctypes.byref(err))
    if err.value > 0 or not bi:
        return None
    try:
        nxt = _fn("ubrk_next")
        nxt.restype = ctypes.c_int32
        nxt.argtypes = [ctypes.c_void_p]
        # u16 offset -> codepoint offset
        cp_at = []
        ci = 0
        for ch in text:
            cp_at.append(ci)
            if ord(ch) > 0xFFFF:
                cp_at.append(ci)
            ci += 1
        cp_at.append(ci)
        out = []
        while True:
            p = nxt(bi)
            if p == -1:
                break
            out.append(cp_at[p])
        return out
    finally:
        f = _fn("ubrk_close")
        f.argtypes = [ctypes.c_void_p]
        f(bi)
