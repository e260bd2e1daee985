"""Character -> glyph-index mapping.

Behavioral equivalent of the reference's ``src/font/CharGlyphMapping.zig``:
a sorted table of ``RangeMapping{end_char, char_count, end_glyph}`` rows
queried in O(log n), with glyph 0 (".notdef") for unmapped characters.

Re-design note: the reference builds a breadth-first implicit binary
search tree of ``Branch`` nodes over the ranges and walks it per lookup
(``CharGlyphMapping.zig:95-144,71-93``).  The NumPy-idiomatic equivalent
of that binary search is ``np.searchsorted`` over the sorted ``end_char``
column — the same O(log n) decision tree, vectorized so whole codepoint
arrays can be resolved in one call (which is what the atlas packer
needs).  A reverse ``char_for_glyph`` linear scan mirrors ``getChar``
(``CharGlyphMapping.zig:62-69``).

Encoding convention carried over from the reference's flatten step
(``ttf.zig:451-494``): ``end_glyph`` is stored **+1** so that 0 can
serve as the "explicitly unmapped" sentinel inside a range; ``end_char``
is exclusive (one past the last char of the range).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from fontrx.utils.reader import CorruptedFont, ensure_mono_increase


@dataclass(frozen=True, slots=True)
class RangeMapping:
    """One contiguous char range mapping to a contiguous glyph range
    (``CharGlyphMapping.zig:34-46``).

    ``stride`` extends the reference's encoding: 1 means the glyph
    index advances with the char (formats 0/4/6/12); 0 means every
    char in the range maps to the SAME glyph (format 13 many-to-one
    groups, which the reference cannot represent at all)."""

    end_char: int    # exclusive end of the char range
    char_count: int  # number of chars in the range
    end_glyph: int   # glyph index of the last char, +1 (0 = unmapped)
    stride: int = 1  # 1 = consecutive glyphs, 0 = constant glyph


class CharGlyphMapping:
    """Vectorized range-mapping lookup table."""

    def __init__(self, rows: np.ndarray):
        """``rows`` is ``int64 [n, 3]`` of (end_char, char_count,
        end_glyph) or ``[n, 4]`` with a trailing stride column."""
        rows = np.asarray(rows, dtype=np.int64)
        if rows.ndim != 2 or rows.shape[1] not in (3, 4):
            rows = rows.reshape(-1, 3)
        ensure_mono_increase(rows[:, 0], "charmap end_char")
        if np.any(rows[:, 1] <= 0):
            raise CorruptedFont("charmap range with non-positive char_count")
        self.end_char = rows[:, 0].copy()
        self.char_count = rows[:, 1].copy()
        self.end_glyph = rows[:, 2].copy()
        if rows.shape[1] == 4:
            if np.any((rows[:, 3] != 0) & (rows[:, 3] != 1)):
                raise CorruptedFont("charmap stride must be 0 or 1")
            self.stride = rows[:, 3].copy()
        else:
            self.stride = np.ones(len(rows), dtype=np.int64)

    def __len__(self) -> int:
        return len(self.end_char)

    @property
    def ranges(self) -> list[RangeMapping]:
        return [RangeMapping(int(e), int(c), int(g), int(s))
                for e, c, g, s in zip(self.end_char, self.char_count,
                                      self.end_glyph, self.stride)]

    def glyph_index(self, char: int) -> int:
        """O(log n) single lookup; 0 when unmapped
        (``CharGlyphMapping.getGlyph``, ``CharGlyphMapping.zig:71-93``).
        Memoized: layout resolves one char at a time and text repeats
        few unique codepoints."""
        memo = getattr(self, "_gid_memo", None)
        if memo is None:
            memo = self._gid_memo = {}
        c = int(char)
        v = memo.get(c)
        if v is None:
            v = memo[c] = int(self.glyph_indices(np.array([c]))[0])
        return v

    def glyph_indices(self, chars: np.ndarray) -> np.ndarray:
        """Vectorized batch lookup — resolves a whole codepoint array at
        once (the atlas-packing fast path the reference's per-char tree
        walk cannot express)."""
        chars = np.asarray(chars, dtype=np.int64)
        # Find the first range whose exclusive end exceeds the char.
        idx = np.searchsorted(self.end_char, chars, side="right")
        in_table = idx < len(self.end_char)
        safe = np.where(in_table, idx, 0)
        start_char = self.end_char[safe] - self.char_count[safe]
        in_range = in_table & (chars >= start_char)
        offset_from_end = self.end_char[safe] - 1 - chars
        glyph = self.end_glyph[safe] - 1 - offset_from_end * self.stride[safe]
        glyph = np.where(in_range & (self.end_glyph[safe] != 0), glyph, 0)
        # end_glyph stores +1; unwrap, clamping explicit-unmapped to 0
        return np.maximum(glyph, 0)

    def char_for_glyph(self, glyph_index: int) -> int | None:
        """Reverse linear scan (``CharGlyphMapping.getChar``,
        ``CharGlyphMapping.zig:62-69``)."""
        for e, c, g, s in zip(self.end_char, self.char_count,
                              self.end_glyph, self.stride):
            if g == 0:
                continue
            last_glyph = g - 1
            first_glyph = last_glyph - (c - 1) * s
            if first_glyph <= glyph_index <= last_glyph:
                if s == 0:  # constant range: report its first char
                    return int(e - c)
                return int(e - 1 - (last_glyph - glyph_index))
        return None
