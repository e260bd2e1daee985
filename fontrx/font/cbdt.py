"""CBDT/CBLC color bitmap glyphs (Google-style embedded PNG strikes).

The second bitmap-emoji family (Noto Color Emoji et al.), completing
the pair with ``fontrx.font.sbix``: CBLC indexes per-strike glyph
ranges into the CBDT data table, whose color formats carry PNG
payloads.  Supported subset — the shapes CBDT fonts actually use:

- index formats 1 (uint32 offsets), 2 (constant size + shared big
  metrics) and 3 (uint16 offsets); sparse formats 4/5 degrade to "no
  bitmap" (documented);
- image formats 17 (small metrics + PNG), 18 (big metrics + PNG) and
  19 (metrics in CBLC, data-only PNG).

Monochrome EBDT/EBLC bit-aligned formats are out of scope (legacy,
and the color pipeline is the consumer).  PNGs decode through
``fontrx.io.png.decode`` (libpng-differential-validated).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from fontrx.font.ttf import CorruptedFont
from fontrx.utils.reader import BigEndianReader


@dataclass(frozen=True, slots=True)
class CbdtStrike:
    ppem: int
    bit_depth: int
    # (first_gid, last_gid, index_format, image_format,
    #  image_data_offset, subtable_offset) per index subtable;
    # offsets absolute into the shared byte buffer
    subtables: tuple


@dataclass(frozen=True, slots=True)
class CbdtTable:
    strikes: tuple
    cblc: bytes
    cbdt_base: int       # absolute offset of CBDT in the buffer
    data: bytes

    @classmethod
    def parse(
        cls, cblc_r: BigEndianReader, cbdt_r: BigEndianReader
    ) -> "CbdtTable":
        base = cblc_r.pos
        major, _minor, n_sizes = cblc_r.unpack("HHI")
        if major not in (2, 3) or n_sizes == 0 or n_sizes > 0xFFFF:
            raise CorruptedFont(f"CBLC version {major} / {n_sizes} sizes")
        data = cblc_r.data
        strikes = []
        for k in range(n_sizes):
            rec = base + 8 + 48 * k
            (ista_off, _ists, n_ist, _color) = struct.unpack_from(
                ">IIII", data, rec)
            # skip the two sbitLineMetrics (24 bytes) + range fields
            start_gid, end_gid, ppem_x, ppem_y, depth, _flags = \
                struct.unpack_from(">HHBBBb", data, rec + 40)
            del start_gid, end_gid
            subtables = []
            for i in range(min(n_ist, 0xFFFF)):
                first, last, add_off = struct.unpack_from(
                    ">HHI", data, base + ista_off + 8 * i)
                st = base + ista_off + add_off
                idx_fmt, img_fmt, img_off = struct.unpack_from(
                    ">HHI", data, st)
                subtables.append((int(first), int(last), int(idx_fmt),
                                  int(img_fmt), int(img_off), st))
            strikes.append(CbdtStrike(
                int(ppem_x) or int(ppem_y), int(depth),
                tuple(subtables)))
        strikes.sort(key=lambda s: s.ppem)
        return cls(tuple(strikes), data, cbdt_r.pos, cbdt_r.data)

    def best_strike(self, ppem: float) -> CbdtStrike | None:
        if not self.strikes:
            return None
        for s in self.strikes:
            if s.ppem >= ppem:
                return s
        return self.strikes[-1]

    def glyph_image(
        self, strike: CbdtStrike, gid: int
    ) -> tuple[int, int, bytes] | None:
        """(bearing_x, bottom_y, png_bytes) in strike pixels —
        ``bottom_y`` the bitmap's bottom edge relative to the
        baseline — or None (no bitmap / unsupported format)."""
        d = self.data
        for first, last, idx_fmt, img_fmt, img_off, st in \
                strike.subtables:
            if not first <= gid <= last:
                continue
            try:
                if idx_fmt == 1:
                    p = st + 8 + 4 * (gid - first)
                    lo, hi = struct.unpack_from(">II", d, p)
                elif idx_fmt == 3:
                    p = st + 8 + 2 * (gid - first)
                    lo, hi = struct.unpack_from(">HH", d, p)
                elif idx_fmt == 2:
                    (img_size,) = struct.unpack_from(">I", d, st + 8)
                    metrics = struct.unpack_from(">BBbbBbbB", d, st + 12)
                    lo = img_size * (gid - first)
                    hi = lo + img_size
                    if img_fmt != 19:
                        return None
                    start = self.cbdt_base + img_off + lo
                    (dlen,) = struct.unpack_from(">I", d, start)
                    png = d[start + 4 : start + 4 + dlen]
                    h, w, bx, by = metrics[0], metrics[1], \
                        metrics[2], metrics[3]
                    del w
                    return int(bx), int(by) - int(h), png
                else:
                    return None          # sparse formats 4/5: degrade
            except struct.error:
                return None
            if hi <= lo:
                return None              # no bitmap for this glyph
            start = self.cbdt_base + img_off + lo
            try:
                if img_fmt == 17:        # smallGlyphMetrics + PNG
                    h, _w, bx, by, _adv = struct.unpack_from(
                        ">BBbbB", d, start)
                    (dlen,) = struct.unpack_from(">I", d, start + 5)
                    png = d[start + 9 : start + 9 + dlen]
                    return int(bx), int(by) - int(h), png
                if img_fmt == 18:        # bigGlyphMetrics + PNG
                    h, _w, bx, by = struct.unpack_from(
                        ">BBbb", d, start)
                    (dlen,) = struct.unpack_from(">I", d, start + 8)
                    png = d[start + 12 : start + 12 + dlen]
                    return int(bx), int(by) - int(h), png
                if img_fmt == 19:        # data-only (metrics in CBLC)
                    (dlen,) = struct.unpack_from(">I", d, start)
                    return 0, 0, d[start + 4 : start + 4 + dlen]
            except struct.error:
                return None
            return None                  # other image formats: degrade
        return None
