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


def decode(data: bytes) -> np.ndarray:
    """Decode a PNG into uint8 ``[H, W]`` / ``[H, W, 3]`` /
    ``[H, W, 4]`` (color types 0/2/4/6 at bit depth 8,
    non-interlaced — the shapes sbix/CBDT bitmap glyphs and this
    module's encoder produce; the full format is out of scope)."""
    if data[:8] != _MAGIC:
        raise ValueError("not a PNG")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG (depth {depth}, interlace {interlace})")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {ctype}")
    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    if len(raw) < h * (stride + 1):
        raise ValueError("PNG pixel data truncated")
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1
        ).astype(np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 2:              # Up
            cur = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):      # Sub / Average / Paeth: scan
            cur = np.zeros(stride, np.int32)
            for x in range(stride):
                a = cur[x - channels] if x >= channels else 0
                b = prev[x]
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) >> 1
                else:
                    c = prev[x - channels] if x >= channels else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else c)
                cur[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"PNG filter {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    img = out.reshape(h, w, channels)
    if channels == 1:
        return img[:, :, 0]
    if channels == 2:                 # gray+alpha -> RGBA
        rgba = np.empty((h, w, 4), np.uint8)
        rgba[..., 0] = rgba[..., 1] = rgba[..., 2] = img[..., 0]
        rgba[..., 3] = img[..., 1]
        return rgba
    return img
