"""ctypes bindings for the system Brotli libraries.

WOFF2's entropy stage is Brotli (RFC 7932).  No Python ``brotli``
wheel ships in this environment, but the system carries the reference
C implementation (``libbrotlidec.so.1`` / ``libbrotlienc.so.1``), so
we bind the one-shot C API directly — the same native-runtime pattern
as ``fontrx/native/__init__.py``'s own library, with the same graceful
degradation: ``available()`` is False and WOFF2 opening raises a clear
error when the libraries are absent.

The encoder binding exists for the test suite only (building WOFF2
fixtures in-test, and letting fontTools' WOFF2 writer/reader act as
the differential oracle via ``install_shim()``); the decode path is
what production font loading uses.
"""

from __future__ import annotations

import ctypes
import ctypes.util

from fontrx.utils.log import get_logger

log = get_logger("Brotli")

_DECODER_SUCCESS = 1  # BROTLI_DECODER_RESULT_SUCCESS
_MODE_GENERIC, _MODE_TEXT, _MODE_FONT = 0, 1, 2

_dec = None
_enc = None
_tried = False


def _load() -> None:
    global _dec, _enc, _tried
    if _tried:
        return
    _tried = True
    for name in ("libbrotlidec.so.1", "libbrotlidec.so",
                 ctypes.util.find_library("brotlidec")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        lib.BrotliDecoderDecompress.restype = ctypes.c_int
        lib.BrotliDecoderDecompress.argtypes = [
            ctypes.c_size_t, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_size_t), ctypes.c_char_p,
        ]
        _dec = lib
        break
    if _dec is None:
        log.info("libbrotlidec not found; WOFF2 disabled")
    for name in ("libbrotlienc.so.1", "libbrotlienc.so",
                 ctypes.util.find_library("brotlienc")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        lib.BrotliEncoderCompress.restype = ctypes.c_int
        lib.BrotliEncoderCompress.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_size_t, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_size_t), ctypes.c_char_p,
        ]
        _enc = lib
        break


def available() -> bool:
    """True when the system decoder library loaded."""
    _load()
    return _dec is not None


def decompress(data: bytes, expected_size: int) -> bytes:
    """One-shot Brotli decode into a buffer of known size.

    WOFF2 always knows the decompressed size up front (the sum of the
    directory's transform/orig lengths), so the streaming API is
    unnecessary; a size mismatch or decoder failure is a corrupt file.
    """
    _load()
    if _dec is None:
        raise RuntimeError("system brotli decoder not available")
    out = ctypes.create_string_buffer(max(expected_size, 1))
    out_len = ctypes.c_size_t(expected_size)
    rc = _dec.BrotliDecoderDecompress(
        len(data), data, ctypes.byref(out_len), out)
    if rc != _DECODER_SUCCESS:
        raise ValueError("brotli stream is corrupt or truncated")
    if out_len.value != expected_size:
        raise ValueError(
            f"brotli stream decoded to {out_len.value} bytes, "
            f"expected {expected_size}")
    return out.raw[:expected_size]


def compress(data: bytes, quality: int = 9, mode: int = _MODE_FONT) -> bytes:
    """One-shot Brotli encode (test/fixture use)."""
    _load()
    if _enc is None:
        raise RuntimeError("system brotli encoder not available")
    # worst-case bound per brotli's BrotliEncoderMaxCompressedSize
    bound = len(data) + (len(data) >> 1) + 1024
    out = ctypes.create_string_buffer(bound)
    out_len = ctypes.c_size_t(bound)
    rc = _enc.BrotliEncoderCompress(
        quality, 22, mode, len(data), data, ctypes.byref(out_len), out)
    if rc != 1:
        raise ValueError("brotli compression failed")
    return out.raw[:out_len.value]


class _ShimModule:
    """Minimal stand-in for the ``brotli`` PyPI module, backed by the
    ctypes bindings — just enough surface for fontTools' WOFF2
    reader/writer, which the test suite uses as a differential oracle."""

    MODE_GENERIC = _MODE_GENERIC
    MODE_TEXT = _MODE_TEXT
    MODE_FONT = _MODE_FONT

    class error(Exception):
        pass

    @staticmethod
    def compress(data, mode=_MODE_GENERIC, quality=9, **kwargs):
        return compress(bytes(data), quality=quality, mode=mode)

    @staticmethod
    def decompress(data, **kwargs):
        # size unknown here: grow geometrically until the one-shot
        # decode fits (fontTools passes whole-table streams, small)
        _load()
        if _dec is None:
            raise _ShimModule.error("no decoder")
        size = max(len(data) * 4, 1 << 16)
        while size <= (1 << 30):
            out = ctypes.create_string_buffer(size)
            out_len = ctypes.c_size_t(size)
            rc = _dec.BrotliDecoderDecompress(
                len(data), bytes(data), ctypes.byref(out_len), out)
            if rc == _DECODER_SUCCESS:
                return out.raw[:out_len.value]
            size *= 4
        raise _ShimModule.error("decode failed")


def install_shim() -> bool:
    """Register the shim as ``sys.modules['brotli']`` (idempotent; no-op
    when a real module or the libraries are missing).  Test-only."""
    import sys

    if "brotli" in sys.modules:
        return True
    _load()
    if _dec is None or _enc is None:
        return False
    sys.modules["brotli"] = _ShimModule()  # type: ignore[assignment]
    return True
