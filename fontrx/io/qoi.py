"""QOI (Quite OK Image) encoder/decoder.

Byte-compatible with the reference's encoder (``src/tools/qoi.zig:25-88``),
which implements standard QOI for 3-channel sRGB: RUN / INDEX / DIFF /
LUMA / RGB ops with the 64-entry running hash ``(3r+5g+7b+11a) & 63``
and the 8-byte ``...0001`` end marker.  (The reference's
insert-previous-pixel-at-loop-top structure is equivalent to the
standard insert-after-processing — verified by trace.)

The encoder is NumPy-accelerated: run lengths and per-pixel deltas are
precomputed vectorially; only the sequential index-table walk stays in
Python.  A C fast path is provided by ``fontrx.native`` when built.
The decoder exists for round-tripping in tests.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"qoif"
END_MARKER = struct.pack(">Q", 1)

OP_INDEX = 0x00
OP_DIFF = 0x40
OP_LUMA = 0x80
OP_RUN = 0xC0
OP_RGB = 0xFE
OP_RGBA = 0xFF


def _hash(r: int, g: int, b: int) -> int:
    return (r * 3 + g * 5 + b * 7 + 255 * 11) & 63


def encode_rgb(pixels: np.ndarray) -> bytes:
    """Encode ``uint8 [H, W, 3]`` to QOI bytes (channels=3,
    colorspace=sRGB, matching ``qoi.zig:26-32``)."""
    try:
        from fontrx.native import qoi_encode_native

        out = qoi_encode_native(pixels)
        if out is not None:
            return out
    except ImportError:
        pass
    return _encode_rgb_py(pixels)


def _encode_rgb_py(pixels: np.ndarray) -> bytes:
    h, w = pixels.shape[:2]
    header = MAGIC + struct.pack(">IIBB", w, h, 3, 0)

    flat = pixels.reshape(-1, 3).astype(np.uint8)
    total = flat.shape[0]
    out = bytearray(header)
    if total == 0:
        out += END_MARKER
        return bytes(out)

    # vector precompute: wrapped deltas vs previous pixel, hashes,
    # run-break positions
    prev = np.vstack([np.zeros((1, 3), np.uint8), flat[:-1]])
    delta = (flat.astype(np.int16) - prev.astype(np.int16)) & 0xFF
    same = (delta == 0).all(axis=1)
    dr = ((delta[:, 0] + 2) & 0xFF).astype(np.uint8)
    dg = ((delta[:, 1] + 2) & 0xFF).astype(np.uint8)
    db = ((delta[:, 2] + 2) & 0xFF).astype(np.uint8)
    small = (dr < 4) & (dg < 4) & (db < 4)
    lr = (dr + (8 - dg)) & 0xFF
    lb = (db + (8 - dg)) & 0xFF
    lg = (dg + 30) & 0xFF
    luma = (lr < 16) & (lg < 64) & (lb < 16)
    hashes = (
        flat[:, 0].astype(np.uint32) * 3
        + flat[:, 1].astype(np.uint32) * 5
        + flat[:, 2].astype(np.uint32) * 7
        + 255 * 11
    ) & 63

    # zero-initialized table, matching the reference: any black pixel
    # matches any entry until overwritten (``qoi.zig:35``)
    index = np.zeros((64, 3), np.uint8)
    i = 0
    while i < total:
        if same[i]:
            run = 1
            j = i + 1
            while j < total and same[j] and run < 62:
                run += 1
                j += 1
            out.append(OP_RUN | (run - 1))
            hsh = hashes[i]
            index[hsh] = flat[i]
            i = j
            continue
        r, g, b = flat[i]
        hsh = hashes[i]
        if index[hsh, 0] == r and index[hsh, 1] == g and index[hsh, 2] == b:
            out.append(OP_INDEX | int(hsh))
        elif small[i]:
            out.append(OP_DIFF | (int(dr[i]) << 4) | (int(dg[i]) << 2) | int(db[i]))
        elif luma[i]:
            out.append(OP_LUMA | int(lg[i]))
            out.append((int(lr[i]) << 4) | int(lb[i]))
        else:
            out += bytes((OP_RGB, r, g, b))
        index[hsh] = flat[i]
        i += 1

    out += END_MARKER
    return bytes(out)


def encode_rgba(pixels: np.ndarray) -> bytes:
    """Encode ``uint8 [H, W, 4]`` to QOI bytes (channels=4).

    Beyond the reference (its encoder is RGB-only, ``qoi.zig:26``): the
    transparent-background display mode (the Ctrl+T analog) emits RGBA
    frames, so the alpha channel must survive the container.  Standard
    QOI semantics: DIFF/LUMA/RGB ops only when alpha is unchanged,
    OP_RGBA otherwise; the running hash includes the real alpha."""
    h, w = pixels.shape[:2]
    header = MAGIC + struct.pack(">IIBB", w, h, 4, 0)
    flat = pixels.reshape(-1, 4).astype(np.uint8)
    total = flat.shape[0]
    out = bytearray(header)
    if total == 0:
        out += END_MARKER
        return bytes(out)

    first_prev = np.array([[0, 0, 0, 255]], np.uint8)  # spec start pixel
    prev = np.vstack([first_prev, flat[:-1]])
    delta = (flat.astype(np.int16) - prev.astype(np.int16)) & 0xFF
    same = (delta == 0).all(axis=1)
    alpha_same = delta[:, 3] == 0
    dr = ((delta[:, 0] + 2) & 0xFF).astype(np.uint8)
    dg = ((delta[:, 1] + 2) & 0xFF).astype(np.uint8)
    db = ((delta[:, 2] + 2) & 0xFF).astype(np.uint8)
    small = (dr < 4) & (dg < 4) & (db < 4) & alpha_same
    lr = (dr + (8 - dg)) & 0xFF
    lb = (db + (8 - dg)) & 0xFF
    lg = (dg + 30) & 0xFF
    luma = (lr < 16) & (lg < 64) & (lb < 16) & alpha_same
    hashes = (
        flat[:, 0].astype(np.uint32) * 3
        + flat[:, 1].astype(np.uint32) * 5
        + flat[:, 2].astype(np.uint32) * 7
        + flat[:, 3].astype(np.uint32) * 11
    ) & 63

    index = np.zeros((64, 4), np.uint8)
    i = 0
    while i < total:
        if same[i]:
            run = 1
            j = i + 1
            while j < total and same[j] and run < 62:
                run += 1
                j += 1
            out.append(OP_RUN | (run - 1))
            index[hashes[i]] = flat[i]
            i = j
            continue
        r, g, b, a = flat[i]
        hsh = hashes[i]
        if (index[hsh] == flat[i]).all():
            out.append(OP_INDEX | int(hsh))
        elif small[i]:
            out.append(OP_DIFF | (int(dr[i]) << 4) | (int(dg[i]) << 2) | int(db[i]))
        elif luma[i]:
            out.append(OP_LUMA | int(lg[i]))
            out.append((int(lr[i]) << 4) | int(lb[i]))
        elif alpha_same[i]:
            out += bytes((OP_RGB, r, g, b))
        else:
            out += bytes((OP_RGBA, r, g, b, a))
        index[hsh] = flat[i]
        i += 1

    out += END_MARKER
    return bytes(out)


def decode(data: bytes) -> np.ndarray:
    """Decode QOI bytes to ``uint8 [H, W, channels]`` — 3 channels with
    alpha dropped for RGB files, 4 for RGBA files.  Used by tests to
    round-trip the encoders."""
    if data[:4] != MAGIC:
        raise ValueError("not a QOI file")
    w, h, channels, _colorspace = struct.unpack(">IIBB", data[4:14])
    total = w * h
    out = np.zeros((total, 4), np.uint8)
    index = np.zeros((64, 4), np.uint8)
    r, g, b, a = 0, 0, 0, 255
    pos = 14
    i = 0
    while i < total:
        op = data[pos]
        pos += 1
        if op == OP_RGB:
            r, g, b = data[pos], data[pos + 1], data[pos + 2]
            pos += 3
        elif op == OP_RGBA:
            r, g, b, a = data[pos], data[pos + 1], data[pos + 2], data[pos + 3]
            pos += 4
        else:
            tag = op & 0xC0
            if tag == OP_INDEX:
                r, g, b, a = (int(v) for v in index[op & 63])
            elif tag == OP_DIFF:
                r = (r + ((op >> 4) & 3) - 2) & 0xFF
                g = (g + ((op >> 2) & 3) - 2) & 0xFF
                b = (b + (op & 3) - 2) & 0xFF
            elif tag == OP_LUMA:
                dg = (op & 0x3F) - 32
                b2 = data[pos]
                pos += 1
                r = (r + dg + ((b2 >> 4) & 0xF) - 8) & 0xFF
                g = (g + dg) & 0xFF
                b = (b + dg + (b2 & 0xF) - 8) & 0xFF
            else:  # OP_RUN
                run = (op & 0x3F) + 1
                out[i : i + run] = (r, g, b, a)
                i += run
                index[(r * 3 + g * 5 + b * 7 + a * 11) & 63] = (r, g, b, a)
                continue
        out[i] = (r, g, b, a)
        i += 1
        index[(r * 3 + g * 5 + b * 7 + a * 11) & 63] = (r, g, b, a)
    if data[pos : pos + 8] != END_MARKER:
        raise ValueError("bad QOI end marker")
    out = out.reshape(h, w, 4)
    return out if channels == 4 else out[:, :, :3]
