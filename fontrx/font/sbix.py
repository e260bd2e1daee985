"""sbix bitmap color glyphs (Apple-style embedded PNG strikes).

Capability extension (the reference renders outlines only): the sbix
table stores pre-rendered bitmap glyphs per *strike* (a ppem size),
each glyph a PNG (or JPEG/TIFF, unsupported here) with an origin
offset in strike pixels.  fontrx decodes the PNGs with its own
stdlib-zlib decoder (``fontrx.io.png.decode``, validated against
libpng output across all five filter types) and the color pipeline
scales the best strike to the requested size.

Wire layout (Apple TrueType Reference Manual / OpenType sbix):

- header: uint16 version, uint16 flags, uint32 numStrikes,
  Offset32 strikeOffset[numStrikes] (from table start);
- strike: uint16 ppem, uint16 ppi,
  Offset32 glyphDataOffsets[numGlyphs + 1] (from strike start) —
  equal consecutive offsets mean "no bitmap for this glyph";
- glyph data: int16 originOffsetX, int16 originOffsetY (bottom-left
  of the bitmap relative to the glyph origin, in strike pixels),
  4-byte graphicType tag, payload.  ``dupe`` redirects to another
  glyph id.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from fontrx.font.ttf import CorruptedFont
from fontrx.utils.reader import BigEndianReader


@dataclass(frozen=True, slots=True)
class SbixStrike:
    ppem: int
    ppi: int
    offsets: np.ndarray  # uint32 [numGlyphs+1], absolute


@dataclass(frozen=True, slots=True)
class SbixTable:
    version: int
    flags: int
    strikes: tuple
    data: bytes

    @classmethod
    def parse(cls, r: BigEndianReader, num_glyphs: int) -> "SbixTable":
        base = r.pos
        version, flags, n = r.unpack("HHI")
        if n == 0 or n > 0xFFFF:
            raise CorruptedFont(f"sbix with {n} strikes")
        strike_offs = r.u32_array(n)
        strikes = []
        for so in strike_offs:
            sr = BigEndianReader(r.data, base + int(so))
            ppem, ppi = sr.unpack("HH")
            offs = sr.u32_array(num_glyphs + 1).astype(np.int64) \
                + base + int(so)
            if not (np.diff(offs) >= 0).all():
                raise CorruptedFont("sbix glyph offsets not monotonic")
            strikes.append(SbixStrike(int(ppem), int(ppi), offs))
        strikes.sort(key=lambda s: s.ppem)
        return cls(int(version), int(flags), tuple(strikes), r.data)

    def best_strike(self, ppem: float) -> SbixStrike | None:
        """The smallest strike >= the requested size, else the
        largest (downscaling beats upscaling)."""
        if not self.strikes:
            return None
        for s in self.strikes:
            if s.ppem >= ppem:
                return s
        return self.strikes[-1]

    def glyph_image(
        self, strike: SbixStrike, gid: int, _depth: int = 0
    ) -> tuple[int, int, bytes, bytes] | None:
        """(originOffsetX, originOffsetY, graphicType, payload) or
        None (no bitmap / malformed / unsupported redirect)."""
        if not (0 <= gid < len(strike.offsets) - 1) or _depth > 4:
            return None
        lo = int(strike.offsets[gid])
        hi = int(strike.offsets[gid + 1])
        if hi - lo < 8 or hi > len(self.data):
            return None
        try:
            ox, oy = struct.unpack_from(">hh", self.data, lo)
        except struct.error:
            return None
        gtype = self.data[lo + 4 : lo + 8]
        payload = self.data[lo + 8 : hi]
        if gtype == b"dupe":
            if len(payload) < 2:
                return None
            (ref,) = struct.unpack_from(">H", payload, 0)
            return self.glyph_image(strike, int(ref), _depth + 1)
        return int(ox), int(oy), gtype, payload


def decode_bitmap(entry) -> np.ndarray | None:
    """Decode a glyph_image entry's payload to RGBA uint8 [h, w, 4];
    None for non-PNG graphic types (jpg/tiff are out of scope,
    documented)."""
    if entry is None:
        return None
    _, _, gtype, payload = entry
    if gtype != b"png ":
        return None
    from fontrx.io.png import decode

    try:
        img = decode(payload)
    except Exception:
        return None
    if img.ndim == 2:
        rgba = np.empty(img.shape + (4,), np.uint8)
        rgba[..., 0] = rgba[..., 1] = rgba[..., 2] = img
        rgba[..., 3] = 255
        return rgba
    if img.shape[2] == 3:
        rgba = np.empty(img.shape[:2] + (4,), np.uint8)
        rgba[..., :3] = img
        rgba[..., 3] = 255
        return rgba
    return img
