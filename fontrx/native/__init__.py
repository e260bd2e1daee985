"""ctypes bindings for the native fast-path library.

The runtime-around-the-compute in C++ (the analog of the reference
being fully native): a QOI encoder and a fused glyph decode+pack
data-loader.  Everything degrades gracefully to the pure-Python
implementations when the shared library hasn't been built
(``make -C fontrx/native``).
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

from fontrx.utils.log import get_logger

log = get_logger("Native")

_LIB_PATH = pathlib.Path(__file__).parent / "libfontrx_native.so"
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists():
        built = build(quiet=True)
        if not built:
            log.info("native library not built; using pure-Python paths")
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        if not hasattr(lib, "gsub_apply_lookup"):
            # stale library from before the GSUB walk: rebuild
            log.info("native library stale; rebuilding")
            build(quiet=True)
            lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError as e:
        log.warning("failed to load native library: %s", e)
        return None
    if not hasattr(lib, "gsub_apply_lookup"):
        log.warning("native library lacks gsub_apply_lookup; disabled")
        return None
    lib.gsub_apply_lookup.restype = ctypes.c_long
    lib.gsub_apply_lookup.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_long,
    ]
    lib.gpos_apply_lookup.restype = ctypes.c_long
    lib.gpos_apply_lookup.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_long,
        ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.qoi_encode_rgb.restype = ctypes.c_long
    lib.qoi_encode_rgb.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.c_void_p, ctypes.c_long,
    ]
    lib.ttf_pack_glyphs.restype = ctypes.c_long
    lib.ttf_pack_glyphs.argtypes = [
        ctypes.c_void_p, ctypes.c_long,
        ctypes.c_void_p, ctypes.c_long, ctypes.c_long,
        ctypes.c_void_p, ctypes.c_long, ctypes.c_long,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.cff_glyph_outline.restype = ctypes.c_long
    lib.cff_glyph_outline.argtypes = [
        ctypes.c_void_p, ctypes.c_long,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long,
        ctypes.c_long,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long,
        ctypes.c_long,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long, ctypes.c_long,
        ctypes.c_void_p,
    ]
    _lib = lib
    return _lib


def build(quiet: bool = False) -> bool:
    """Build the shared library with make (idempotent)."""
    try:
        subprocess.run(
            ["make", "-C", str(pathlib.Path(__file__).parent)],
            check=True,
            capture_output=quiet,
        )
        return _LIB_PATH.exists()
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        if not quiet:
            log.warning("native build failed: %s", e)
        return False


def available() -> bool:
    return _load() is not None


def qoi_encode_native(pixels: np.ndarray) -> bytes | None:
    """Encode uint8 [H, W, 3] to QOI via the native encoder; None if
    the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    pixels = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w = pixels.shape[:2]
    cap = 14 + h * w * 4 + 8
    out = np.empty(cap, np.uint8)
    n = lib.qoi_encode_rgb(
        pixels.ctypes.data, w, h, out.ctypes.data, cap
    )
    if n < 0:
        return None
    return out[:n].tobytes()


def pack_glyphs_native(
    font_data: bytes,
    loca: np.ndarray,
    glyf_offset: int,
    glyph_ids: np.ndarray,
    capacity: int,
):
    """Fused decode+pack of simple glyphs.

    Returns ``(segments [B,S,3,2] f32, seg_counts i32, boxes i32[B,4],
    flags u8)`` where flags: 0 ok / 1 compound / 2 overflow / 3 error —
    non-zero rows must be filled in by the Python path.  None if the
    library is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    loca = np.ascontiguousarray(loca, np.uint32)
    glyph_ids = np.ascontiguousarray(glyph_ids, np.int32)
    b = len(glyph_ids)
    segments = np.empty((b, capacity, 3, 2), np.float32)
    counts = np.empty(b, np.int32)
    boxes = np.empty((b, 4), np.int32)
    flags = np.empty(b, np.uint8)
    lib.ttf_pack_glyphs(
        font_data, len(font_data),
        loca.ctypes.data, len(loca), glyf_offset,
        glyph_ids.ctypes.data, b, capacity,
        segments.ctypes.data, counts.ctypes.data,
        boxes.ctypes.data, flags.ctypes.data,
    )
    return segments, counts, boxes, flags


def _subr_blob(subrs: list[bytes]):
    """(blob bytes, int64 offsets[n+1]) for a subr list."""
    offs = np.zeros(len(subrs) + 1, np.int64)
    for i, s in enumerate(subrs):
        offs[i + 1] = offs[i] + len(s)
    return b"".join(subrs), offs


def cff_outline_native(
    code: bytes,
    gsub_blob: bytes, gsub_offs: np.ndarray, n_gsub: int,
    lsub_blob: bytes, lsub_offs: np.ndarray, n_lsub: int,
    cff2: bool,
    scalars: np.ndarray | None, scalar_offs: np.ndarray | None,
    vsindex0: int,
):
    """Run one Type 2 charstring natively.

    Returns ``(points float64 [n, 2], contour_ends int64 [c])`` or
    ``None`` when the library is unavailable or the charstring failed
    (caller falls back to the Python interpreter).
    """
    lib = _load()
    if lib is None:
        return None
    cap_pts = 65536
    cap_contours = 1024
    # reusable scratch (1 MB): per-call np.empty would mmap/munmap in
    # the hot loop; calls are synchronous so one buffer suffices
    global _cff_scratch
    try:
        out_pts, out_ends = _cff_scratch
    except NameError:
        out_pts = np.empty((cap_pts, 2), np.float64)
        out_ends = np.empty(cap_contours, np.int64)
        _cff_scratch = (out_pts, out_ends)
    n_pts = ctypes.c_long(0)
    n_vardata = 0 if scalar_offs is None else len(scalar_offs) - 1
    rc = lib.cff_glyph_outline(
        code, len(code),
        gsub_blob, gsub_offs.ctypes.data, n_gsub,
        lsub_blob, lsub_offs.ctypes.data, n_lsub,
        1 if cff2 else 0,
        None if scalars is None else scalars.ctypes.data,
        None if scalar_offs is None else scalar_offs.ctypes.data,
        n_vardata, vsindex0,
        out_pts.ctypes.data, out_ends.ctypes.data, cap_pts, cap_contours,
        ctypes.byref(n_pts),
    )
    if rc < 0:
        return None
    return out_pts[: n_pts.value].copy(), out_ends[:rc].copy()
