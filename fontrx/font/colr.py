"""COLR/CPAL color glyph layers (capability extension).

The reference renders monochrome outlines only (its pipeline has no
color tables at all — ``src/font/ttf.zig`` parses the glyf family and
``render_glyph.zig`` emits single-channel winding/fill); fontrx adds
the OpenType color-layer subsystem: COLR v0 maps a base glyph to an
ordered stack of layer glyphs, each painted in a CPAL palette color,
composited src-over bottom-to-top.

Scope: COLR **version 0** (layer records).  A COLR v1 table's v0
records (the compatibility fallback most v1 fonts carry) are used when
present; v1 paint graphs (gradients/transforms) are out of scope and a
v1-only base glyph simply renders as its monochrome outline —
documented degradation, never an error.  CPAL v0 and v1 are parsed
(v1's palette-type/label arrays are skipped; they only annotate).

Layer rasters ride the existing batched coverage pipeline — layers are
just more glyph tiles in the same Pallas launch — and compositing is a
``lax.scan`` src-over fold on device (``fontrx/cli/main.py`` mode
``color``).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from fontrx.font.ttf import CorruptedFont
from fontrx.utils.reader import BigEndianReader

# CPAL paletteIndex sentinel: use the text foreground color
FOREGROUND = 0xFFFF


@dataclass(frozen=True, slots=True)
class ColrTable:
    """COLR v0 layer records.

    ``base_gids``: sorted uint16 base glyph ids; ``first_layer`` /
    ``num_layers`` parallel arrays into the layer records
    (``layer_gids``, ``layer_palettes``).
    """

    version: int
    base_gids: np.ndarray       # uint16 [B], sorted
    first_layer: np.ndarray     # uint16 [B]
    num_layers: np.ndarray      # uint16 [B]
    layer_gids: np.ndarray      # uint16 [L]
    layer_palettes: np.ndarray  # uint16 [L] (palette entry or 0xFFFF)

    @classmethod
    def parse(cls, r: BigEndianReader) -> "ColrTable":
        base = r.pos
        version, n_base = r.unpack("HH")
        base_off, layer_off = r.unpack("II")
        (n_layers,) = r.unpack("H")
        if n_base:
            r.seek(base + base_off)
            rec = r.u16_array(3 * n_base).reshape(n_base, 3)
        else:
            rec = np.zeros((0, 3), np.uint16)
        if n_layers:
            r.seek(base + layer_off)
            lay = r.u16_array(2 * n_layers).reshape(n_layers, 2)
        else:
            lay = np.zeros((0, 2), np.uint16)
        first = rec[:, 1].astype(np.int64)
        count = rec[:, 2].astype(np.int64)
        if len(rec) and (first + count).max(initial=0) > n_layers:
            raise CorruptedFont("COLR layer range past layer records")
        return cls(
            int(version),
            rec[:, 0].copy(),
            rec[:, 1].copy(),
            rec[:, 2].copy(),
            lay[:, 0].copy(),
            lay[:, 1].copy(),
        )

    def layers(self, gid: int) -> list[tuple[int, int]] | None:
        """Ordered ``[(layer_gid, palette_index), ...]`` painting
        bottom-to-top, or ``None`` when ``gid`` has no color layers
        (including v1-only base glyphs — callers fall back to the
        monochrome outline)."""
        i = int(np.searchsorted(self.base_gids, gid))
        if i >= len(self.base_gids) or int(self.base_gids[i]) != gid:
            return None
        lo = int(self.first_layer[i])
        n = int(self.num_layers[i])
        return [
            (int(self.layer_gids[j]), int(self.layer_palettes[j]))
            for j in range(lo, lo + n)
        ]


@dataclass(frozen=True, slots=True)
class CpalTable:
    """CPAL color palettes: ``colors[p, e]`` = RGBA uint8."""

    version: int
    colors: np.ndarray  # uint8 [numPalettes, numPaletteEntries, 4] RGBA

    @classmethod
    def parse(cls, r: BigEndianReader) -> "CpalTable":
        base = r.pos
        version, n_entries, n_palettes, n_records = r.unpack("HHHH")
        (records_off,) = r.unpack("I")
        if n_entries == 0 or n_palettes == 0:
            raise CorruptedFont("CPAL with no palettes")
        starts = r.u16_array(n_palettes).astype(np.int64)
        # v1 trailing offsets (palette types/labels) are annotations
        # only — skipped
        if (starts + n_entries).max() > n_records:
            raise CorruptedFont("CPAL palette start past color records")
        r.seek(base + records_off)
        bgra = np.frombuffer(
            r.bytes(4 * n_records), np.uint8
        ).reshape(n_records, 4)
        rgba = bgra[:, [2, 1, 0, 3]]
        colors = np.stack(
            [rgba[s : s + n_entries] for s in starts]
        )
        return cls(int(version), colors.copy())

    @property
    def num_palettes(self) -> int:
        return self.colors.shape[0]

    @property
    def num_entries(self) -> int:
        return self.colors.shape[1]

    def color(
        self, palette: int, entry: int,
        foreground: tuple[int, int, int, int] = (0, 0, 0, 255),
    ) -> tuple[int, int, int, int]:
        """RGBA for ``entry`` of ``palette``; the 0xFFFF sentinel is
        the text foreground color, per spec."""
        if entry == FOREGROUND:
            return foreground
        if not (0 <= palette < self.num_palettes):
            raise IndexError(f"palette {palette} of {self.num_palettes}")
        if not (0 <= entry < self.num_entries):
            raise CorruptedFont(
                f"palette entry {entry} of {self.num_entries}")
        return tuple(int(v) for v in self.colors[palette, entry])
