"""``SVG `` table parsing (OT-SVG color glyph documents).

Capability extension — the reference has no color-font support at all
(``src/main.zig`` maps codepoints straight to monochrome outlines).
The table is a list of glyph-ID ranges, each pointing at an SVG
document (optionally gzip-compressed); a document may serve several
ranges and several glyphs, each glyph addressed by an element with
``id="glyph{gid}"``.  Document interpretation lives in
``fontrx.font.svgdoc``; this module is wire format only.

Wire layout (OpenType ``SVG `` v0):

- header: version u16, svgDocumentListOffset u32, reserved u32
- document list: numEntries u16, then entries of
  (startGlyphID u16, endGlyphID u16, svgDocOffset u32,
  svgDocLength u32) — offsets relative to the document list.
"""

from __future__ import annotations

import gzip
import struct

from fontrx.font.ttf import CorruptedFont
from fontrx.utils.reader import BigEndianReader


class SvgTable:
    """Parsed document ranges + lazy, cached document decompression."""

    def __init__(self, entries, data: bytes, list_base: int):
        # entries sorted by start gid: (start, end, offset, length)
        self.entries = entries
        self._data = data
        self._base = list_base
        self._cache: dict[int, bytes] = {}

    @classmethod
    def parse(cls, r: BigEndianReader) -> "SvgTable":
        base = r.pos
        data = r.data
        if base + 10 > len(data):
            raise CorruptedFont("SVG header truncated")
        version, list_off, _reserved = struct.unpack_from(
            ">HII", data, base)
        if version != 0:
            raise CorruptedFont(f"SVG table version {version}")
        list_base = base + list_off
        if list_base + 2 > len(data):
            raise CorruptedFont("SVG document list truncated")
        (n,) = struct.unpack_from(">H", data, list_base)
        entries = []
        for i in range(n):
            p = list_base + 2 + 12 * i
            if p + 12 > len(data):
                raise CorruptedFont("SVG document entry truncated")
            start, end, off, length = struct.unpack_from(">HHII", data, p)
            if end < start:
                raise CorruptedFont("SVG range endGlyphID < startGlyphID")
            if list_base + off + length > len(data):
                raise CorruptedFont("SVG document past end of table")
            entries.append((start, end, off, length))
        entries.sort()
        return cls(entries, data, list_base)

    def document(self, gid: int) -> bytes | None:
        """The (decompressed) SVG document covering ``gid``, or None."""
        for start, end, off, length in self.entries:
            if start <= gid <= end:
                doc = self._cache.get(off)
                if doc is None:
                    doc = self._data[self._base + off
                                     : self._base + off + length]
                    if doc[:2] == b"\x1f\x8b":
                        try:
                            doc = gzip.decompress(doc)
                        except OSError as e:
                            raise CorruptedFont(
                                f"SVG gzip document: {e}") from e
                    self._cache[off] = doc
                return doc
        return None

    def covered(self, gid: int) -> bool:
        return any(s <= gid <= e for s, e, _, _ in self.entries)
