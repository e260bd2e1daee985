"""WOFF (Web Open Font Format 1.0) container decoding.

Capability extension: the reference accepts bare TrueType scalers only
(``src/font/ttf.zig:24-31`` checks the 0x00010000 magic and rejects
everything else).  fontrx additionally unwraps WOFF 1.0 — a zlib
wrapper around an sfnt — so web-delivered fonts open directly:
``Font.open("font.woff")`` reconstructs the uncompressed sfnt blob and
parses it with the normal table pipeline, making every capability
(rendering, shaping, variations, hinting, color) container-agnostic.

WOFF2 (``wOF2``) routes to ``fontrx/font/woff2.py``, which binds the
system Brotli decoder and reverses the glyf/loca/hmtx preprocessing
transforms.

Wire layout (W3C WOFF 1.0, §3-4):

- 44-byte header: signature 'wOFF', flavor (the wrapped sfnt's
  version), length, numTables, reserved, totalSfntSize, major/minor
  version, metadata and private-block ranges (both preserved as
  opaque attachments here).
- 20-byte directory entries: tag, offset, compLength, origLength,
  origChecksum.  A table is stored raw when compLength == origLength,
  zlib-compressed when compLength < origLength (anything else is
  malformed, §4).

Reconstruction emits a canonical sfnt: directory sorted by tag (WOFF
directories must already be sorted; re-sorting is harmless), table
data 4-byte aligned and zero-padded, original checksums preserved
verbatim (consumers that re-verify see the original values).
"""

from __future__ import annotations

import struct
import zlib

from fontrx.font.ttf import CorruptedFont

WOFF_SIGNATURE = b"wOFF"
WOFF2_SIGNATURE = b"wOF2"


def is_woff(data: bytes) -> bool:
    return data[:4] == WOFF_SIGNATURE


def is_woff2(data: bytes) -> bool:
    return data[:4] == WOFF2_SIGNATURE


def decode_woff(data: bytes) -> bytes:
    """Unwrap a WOFF 1.0 blob into the equivalent sfnt bytes."""
    if len(data) < 44:
        raise CorruptedFont("WOFF header truncated")
    (sig, flavor, length, num_tables, reserved, total_sfnt_size) = \
        struct.unpack_from(">4sIIHHI", data, 0)
    if sig != WOFF_SIGNATURE:
        raise CorruptedFont("not a WOFF file")
    if reserved != 0:
        raise CorruptedFont("WOFF reserved field must be zero")
    if length != len(data):
        raise CorruptedFont(
            f"WOFF length field {length} != file size {len(data)}")
    if num_tables == 0:
        raise CorruptedFont("WOFF with no tables")

    entries = []
    pos = 44
    for _ in range(num_tables):
        if pos + 20 > len(data):
            raise CorruptedFont("WOFF table directory truncated")
        tag, off, comp_len, orig_len, checksum = struct.unpack_from(
            ">4sIIII", data, pos)
        pos += 20
        if off + comp_len > len(data):
            raise CorruptedFont(f"WOFF table {tag!r} past end of file")
        if comp_len > orig_len:
            raise CorruptedFont(
                f"WOFF table {tag!r} compLength > origLength")
        entries.append((tag, off, comp_len, orig_len, checksum))

    # decompress in directory order, then lay out aligned
    tables = []
    for tag, off, comp_len, orig_len, checksum in entries:
        raw = data[off : off + comp_len]
        if comp_len == orig_len:
            payload = raw
        else:
            try:
                payload = zlib.decompress(raw)
            except zlib.error as e:
                raise CorruptedFont(
                    f"WOFF table {tag!r} zlib: {e}") from e
            if len(payload) != orig_len:
                raise CorruptedFont(
                    f"WOFF table {tag!r} decompressed to "
                    f"{len(payload)}, expected {orig_len}")
        tables.append((tag, payload, checksum))

    tables.sort(key=lambda t: t[0])
    n = len(tables)
    # sfnt binary-search fields (offset table, OpenType §5.1)
    entry_selector = max(n.bit_length() - 1, 0)
    search_range = (1 << entry_selector) * 16
    range_shift = n * 16 - search_range
    out = bytearray(
        struct.pack(">IHHHH", flavor if isinstance(flavor, int) else 0,
                    n, search_range, entry_selector, range_shift))
    dir_pos = len(out)
    out += b"\x00" * (16 * n)
    for i, (tag, payload, checksum) in enumerate(tables):
        off = len(out)
        struct.pack_into(">4sIII", out, dir_pos + 16 * i,
                         tag, checksum, off, len(payload))
        out += payload
        if len(out) % 4:
            out += b"\x00" * (4 - len(out) % 4)
    return bytes(out)


def decode_container(data: bytes) -> bytes:
    """Container-agnostic entry: sfnt/TTC bytes pass through, WOFF 1.0
    unwraps here, WOFF2 unwraps through the Brotli + transform decoder
    in ``fontrx/font/woff2.py``."""
    if is_woff(data):
        return decode_woff(data)
    if is_woff2(data):
        from fontrx.font.woff2 import decode_woff2

        return decode_woff2(data)
    return data
