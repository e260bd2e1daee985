"""Minimal PNG encoder (stdlib zlib only).

QOI (``fontrx.io.qoi``) is the fidelity/archive format matching the
reference's writer (``src/tools/qoi.zig``); PNG exists solely so the
live HTTP viewer (``fontrx.cli.serve``) can show frames in a browser,
which cannot decode QOI.  Filter type 0 (None) per scanline, one zlib
IDAT — small and universally decodable.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode(pixels: np.ndarray) -> bytes:
    """Encode uint8 ``[H, W]`` (gray), ``[H, W, 3]`` (RGB) or
    ``[H, W, 4]`` (RGBA) to PNG bytes."""
    pixels = np.asarray(pixels, np.uint8)
    if pixels.ndim == 2:
        color_type, channels = 0, 1
        flat = pixels[:, :, None]
    elif pixels.shape[2] == 3:
        color_type, channels = 2, 3
        flat = pixels
    elif pixels.shape[2] == 4:
        color_type, channels = 6, 4
        flat = pixels
    else:
        raise ValueError(f"unsupported shape {pixels.shape}")
    h, w = pixels.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 prepended per scanline
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), flat.reshape(h, w * channels)], axis=1
    ).tobytes()
    return (
        _MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )
