"""CBDT/CBLC and EBDT/EBLC bitmap glyphs.

Two bitmap families share this module because their wire structure is
one format at two versions: CBLC (3.0, color) and EBLC (2.0, legacy
monochrome/grayscale) have identical strike/index layouts, and CBDT's
PNG image formats (17/18/19) extend EBDT's raw-bitmap formats
(1/2/5/6/7 + composite 8/9) without changing any of them.

- index formats: 1 (uint32 offsets), 2 (constant size + shared big
  metrics), 3 (uint16 offsets), 4 (sparse glyph-code/offset pairs),
  5 (constant size, sparse glyph array + shared big metrics);
- color image formats 17 (small metrics + PNG), 18 (big metrics +
  PNG), 19 (metrics in CBLC, data-only PNG) — PNGs decode through
  ``fontrx.io.png.decode`` (libpng-differential-validated);
- monochrome image formats 1 (small metrics, byte-aligned), 2 (small
  metrics, bit-aligned), 5 (bit-aligned, metrics from the index
  subtable), 6 (big metrics, byte-aligned), 7 (big metrics,
  bit-aligned), 8/9 (composite, small/big metrics) at bit depths
  1/2/4/8, expanded to 8-bit alpha.

Differential oracle: fontTools' EBDT/EBLC decompiler re-reads the
fixtures and must agree row-for-row (``tests/test_ebdt.py``).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from fontrx.font.ttf import CorruptedFont
from fontrx.utils.reader import BigEndianReader


def _unpack_rows(d: bytes, body: int, end: int, h: int, w: int,
                 depth: int, *, byte_aligned: bool) -> "np.ndarray":
    """Expand packed rows to ``uint8 [h, w]`` alpha.  Byte-aligned:
    each row padded to a byte boundary; bit-aligned: one continuous
    MSB-first bit stream across rows."""
    if h == 0 or w == 0:
        return np.zeros((max(h, 0), max(w, 0)), np.uint8)
    if byte_aligned:
        row_bytes = (w * depth + 7) >> 3
        need = row_bytes * h
    else:
        need = (h * w * depth + 7) >> 3
    if body + need > end:
        raise ValueError("bitmap data truncated")
    raw = np.frombuffer(d, np.uint8, need, body)
    bits = np.unpackbits(raw)
    if byte_aligned:
        bits = bits.reshape(h, row_bytes * 8)[:, : w * depth]
    else:
        bits = bits[: h * w * depth].reshape(h, w * depth)
    if depth == 1:
        vals = bits
    else:
        # combine each pixel's MSB-first bit group
        weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint16)
        vals = (bits.reshape(h, w, depth).astype(np.uint16)
                * weights).sum(axis=2)
    scale = 255 // ((1 << depth) - 1)
    return (vals * scale).astype(np.uint8)


def _blit_max(dst: "np.ndarray", src: "np.ndarray",
              top: int, left: int) -> None:
    """max-combine ``src`` into ``dst`` with its top-left at
    (top, left), clipped to the destination."""
    h, w = dst.shape
    sh, sw = src.shape
    y0, x0 = max(top, 0), max(left, 0)
    y1, x1 = min(top + sh, h), min(left + sw, w)
    if y0 >= y1 or x0 >= x1:
        return
    view = dst[y0:y1, x0:x1]
    np.maximum(view, src[y0 - top : y1 - top, x0 - left : x1 - left],
               out=view)


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

    def exact_strike(self, ppem: float) -> CbdtStrike | None:
        """Strike whose ppem matches exactly (fixed-size bitmaps are
        only faithful unscaled — the FreeType embedded-bitmap rule)."""
        target = int(round(ppem))
        for s in self.strikes:
            if s.ppem == target:
                return s
        return None

    def _locate(self, strike: CbdtStrike, gid: int):
        """Resolve ``gid`` through the strike's index subtables:
        ``(abs_start, length, big_metrics | None, image_format)`` or
        ``None`` (outside every range / no bitmap / malformed)."""
        d = self.data
        for first, last, idx_fmt, img_fmt, img_off, st in \
                strike.subtables:
            if not first <= gid <= last:
                continue
            metrics = None
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
                elif idx_fmt == 4:
                    # sparse: numGlyphs+1 (glyphID, offset) pairs;
                    # the trailing sentinel pair ends the last glyph
                    (n,) = struct.unpack_from(">I", d, st + 8)
                    lo = hi = None
                    for k in range(min(n, 0xFFFF)):
                        g0, o0, _g1, o1 = struct.unpack_from(
                            ">HHHH", d, st + 12 + 4 * k)
                        if g0 == gid:
                            lo, hi = o0, o1
                            break
                    if lo is None:
                        return None
                elif idx_fmt == 5:
                    (img_size,) = struct.unpack_from(">I", d, st + 8)
                    metrics = struct.unpack_from(">BBbbBbbB", d, st + 12)
                    (n,) = struct.unpack_from(">I", d, st + 20)
                    ids = struct.unpack_from(
                        f">{min(n, 0xFFFF)}H", d, st + 24)
                    try:
                        k = ids.index(gid)
                    except ValueError:
                        return None
                    lo = img_size * k
                    hi = lo + img_size
                else:
                    return None
            except struct.error:
                return None
            if hi <= lo:
                return None              # no bitmap for this glyph
            return (self.cbdt_base + img_off + lo, hi - lo, metrics,
                    img_fmt)
        return None

    def glyph_image(
        self, strike: CbdtStrike, gid: int
    ) -> tuple[int, int, bytes] | None:
        """(bearing_x, bottom_y, png_bytes) in strike pixels —
        ``bottom_y`` the bitmap's bottom edge relative to the
        baseline — or None (no bitmap / non-PNG format)."""
        loc = self._locate(strike, gid)
        if loc is None:
            return None
        start, _length, idx_metrics, img_fmt = loc
        d = self.data
        try:
            if img_fmt == 17:            # smallGlyphMetrics + PNG
                h, _w, bx, by, _adv = struct.unpack_from(
                    ">BBbbB", d, start)
                (dlen,) = struct.unpack_from(">I", d, start + 5)
                png = d[start + 9 : start + 9 + dlen]
                return int(bx), int(by) - int(h), png
            if img_fmt == 18:            # bigGlyphMetrics + PNG
                h, _w, bx, by = struct.unpack_from(">BBbb", d, start)
                (dlen,) = struct.unpack_from(">I", d, start + 8)
                png = d[start + 12 : start + 12 + dlen]
                return int(bx), int(by) - int(h), png
            if img_fmt == 19:            # data-only (metrics in index)
                (dlen,) = struct.unpack_from(">I", d, start)
                png = d[start + 4 : start + 4 + dlen]
                if idx_metrics is not None:
                    h, _w, bx, by = idx_metrics[:4]
                    return int(bx), int(by) - int(h), png
                return 0, 0, png
        except struct.error:
            return None
        return None                      # monochrome/other: not a PNG

    # -- monochrome/grayscale decode (EBDT formats 1/2/5/6/7/8/9) ----

    def glyph_alpha(
        self, strike: CbdtStrike, gid: int, _depth: int = 0
    ) -> tuple["np.ndarray", int, int, int] | None:
        """Decode a raw-bitmap glyph to 8-bit alpha:
        ``(alpha uint8 [h, w], bearing_x, bottom_y, advance)`` in
        strike pixels (``bottom_y`` the bitmap's bottom edge relative
        to the baseline), or ``None``.  Bit depths 1/2/4/8 expand
        linearly to 0..255 (MSB-first within bytes, leftmost pixel in
        the most significant bits, per spec)."""
        if _depth > 4:
            return None                  # composite recursion bound
        loc = self._locate(strike, gid)
        if loc is None:
            return None
        start, length, idx_metrics, img_fmt = loc
        d = self.data
        try:
            if img_fmt in (1, 2, 8):     # smallGlyphMetrics
                h, w, bx, by, adv = struct.unpack_from(">BBbbB", d, start)
                body = start + 5
            elif img_fmt in (6, 7, 9):   # bigGlyphMetrics
                h, w, bx, by, adv = struct.unpack_from(">BBbbB", d, start)
                body = start + 8
            elif img_fmt == 5:           # metrics live in the index
                if idx_metrics is None:
                    return None
                h, w, bx, by, adv = idx_metrics[:5]
                body = start
            else:
                return None
        except struct.error:
            return None
        depth = strike.bit_depth if strike.bit_depth in (1, 2, 4, 8) \
            else 1
        end = start + length
        try:
            if img_fmt in (1, 6):        # byte-aligned rows
                alpha = _unpack_rows(d, body, end, h, w, depth,
                                     byte_aligned=True)
            elif img_fmt in (2, 5, 7):   # bit-aligned stream
                alpha = _unpack_rows(d, body, end, h, w, depth,
                                     byte_aligned=False)
            else:                        # 8/9: composite of components
                if img_fmt == 8:
                    body += 1            # pad byte
                (n_comp,) = struct.unpack_from(">H", d, body)
                alpha = np.zeros((h, w), np.uint8)
                p = body + 2
                for _ in range(min(n_comp, 0xFF)):
                    cg, dx, dy = struct.unpack_from(">Hbb", d, p)
                    p += 4
                    sub = self.glyph_alpha(strike, cg, _depth + 1)
                    if sub is None:
                        continue
                    # component top-left at (dx, dy) from the
                    # composite's top-left (FreeType ttsbit.c
                    # x_pos/y_pos accumulation)
                    _blit_max(alpha, sub[0], dy, dx)
        except (struct.error, ValueError):
            return None
        return alpha, int(bx), int(by) - int(h), int(adv)
