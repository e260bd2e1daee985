"""Minimal PNG encoder (grayscale + RGB + RGBA).

SURVEY §7 lists PNG as optional alongside the QOI writer; this is a
dependency-free encoder using stdlib zlib — enough for atlases, debug
dumps, and interactive-frame export.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode(img: np.ndarray, compress_level: int = 6) -> bytes:
    """Encode ``uint8 [H, W]`` (gray), ``[H, W, 3]`` (RGB) or
    ``[H, W, 4]`` (RGBA) to PNG bytes."""
    img = np.ascontiguousarray(img, np.uint8)
    if img.ndim == 2:
        color_type = 0
        row_bytes = img[:, :, None]
    elif img.ndim == 3 and img.shape[2] == 3:
        color_type = 2
        row_bytes = img
    elif img.ndim == 3 and img.shape[2] == 4:
        color_type = 6
        row_bytes = img
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    h, w = img.shape[:2]

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 (None) per scanline
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), row_bytes.reshape(h, -1)], axis=1
    ).tobytes()
    idat = zlib.compress(raw, compress_level)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def decode_header(data: bytes) -> tuple[int, int, int]:
    """Parse (width, height, color_type) from PNG bytes (test helper)."""
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG")
    w, h, _depth, color_type = struct.unpack(">IIBB", data[16:26])
    return w, h, color_type
