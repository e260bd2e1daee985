"""AAT tracking (``trak``): size-dependent letter spacing.

Capability extension — Apple-ecosystem fonts (the San Francisco
family and friends) carry per-point-size tracking curves.  The value
for a point size interpolates piecewise-linearly between the size
table's entries and EXTRAPOLATES beyond the ends (the HarfBuzz
behavior, pinned by the fixture differential: 12pt -50 / 24pt -100
yields -75 at 18pt and -200 at 48pt).

Application (the hb convention, ``tests/test_trak.py``): each glyph's
advance widens by the track value and the glyph shifts by half of it
(truncated toward zero); fontrx applies the value per REAL advance
cell, deferring past zero-advance attached marks like the rest of the
tracking machinery.

Wire format: Apple TrueType Reference Manual, "The 'trak' table".
Only the ``track = 0.0`` entry (the font's default curve) is
consumed; named alternate tracks are a UI concept.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

from fontrx.font.ttf import BigEndianReader, CorruptedFont
from fontrx.utils.log import get_logger

log = get_logger("Trak")


def _u16(d: bytes, o: int) -> int:
    return (d[o] << 8) | d[o + 1]


def _s16(v: int) -> int:
    return v - 0x10000 if v & 0x8000 else v


def _fixed(d: bytes, o: int) -> float:
    return struct.unpack_from(">i", d, o)[0] / 65536.0


@dataclass(frozen=True, slots=True)
class TrakTable:
    """Parsed horizontal default-track curve: (sizes_pt, values_fu)."""

    sizes: tuple
    values: tuple

    @classmethod
    def parse(cls, r: BigEndianReader) -> "TrakTable | None":
        d = r.data
        base = r.pos
        if base + 12 > len(d):
            raise CorruptedFont("trak header truncated")
        version = struct.unpack_from(">I", d, base)[0]
        if version != 0x00010000:
            raise CorruptedFont(f"trak version {version:#x}")
        horiz_off = _u16(d, base + 6)
        if not horiz_off:
            return None
        td = base + horiz_off
        if td + 8 > len(d):
            raise CorruptedFont("trak trackData truncated")
        n_tracks = _u16(d, td)
        n_sizes = _u16(d, td + 2)
        size_off = struct.unpack_from(">I", d, td + 4)[0]
        if n_tracks > 64 or n_sizes > 64:
            raise CorruptedFont("trak counts out of range")
        sizes = tuple(
            _fixed(d, base + size_off + 4 * k) for k in range(n_sizes))
        # ONLY the default track (0.0) is consumed — hb applies no
        # tracking when a font carries named tracks but no default
        chosen = None
        for t in range(n_tracks):
            e = td + 8 + 8 * t
            if e + 8 > len(d):
                raise CorruptedFont("trak trackTable truncated")
            if _fixed(d, e) == 0.0:
                chosen = _u16(d, e + 6)
                break
        if chosen is None or not n_sizes:
            return None
        values = tuple(
            _s16(_u16(d, base + chosen + 2 * k)) for k in range(n_sizes))
        return cls(sizes, values)

    def value(self, ptem: float) -> float:
        """Tracking in font units at ``ptem`` points: piecewise-linear
        between size entries, extrapolated beyond the ends."""
        s, v = self.sizes, self.values
        if len(s) == 1:
            return float(v[0])
        if ptem <= s[0]:
            lo, hi = 0, 1
        elif ptem >= s[-1]:
            lo, hi = len(s) - 2, len(s) - 1
        else:
            hi = next(k for k in range(1, len(s)) if s[k] >= ptem)
            lo = hi - 1
        span = s[hi] - s[lo]
        if span == 0:
            return float(v[lo])
        t = (ptem - s[lo]) / span
        return v[lo] + (v[hi] - v[lo]) * t
