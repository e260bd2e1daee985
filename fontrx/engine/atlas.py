"""Atlas batching: rasterize a whole glyph set in one jitted step.

BASELINE configs 3 (ASCII atlas @128px) and 4 (CJK SDF atlas) — the TPU
replacement for the reference's per-glyph GPU residency + per-instance
draws (``src/Appli.zig:219-302``): all glyphs of a set become one
``[B, S, 3, 2]`` tensor and one kernel launch rasterizes every tile.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from fontrx.engine.raster import RasterEngine
from fontrx.font.font import Font
from fontrx.pack.segments import PackedBatch, pack_glyphs


@dataclass(frozen=True, slots=True)
class AtlasLayout:
    """Glyph-tile placement in an atlas sheet: ``cols x rows`` tiles of
    ``tile x tile`` pixels, row-major by glyph order."""

    tile: int
    cols: int
    rows: int
    chars: tuple[int, ...]

    @property
    def width(self) -> int:
        return self.cols * self.tile

    @property
    def height(self) -> int:
        return self.rows * self.tile

    def tile_origin(self, i: int) -> tuple[int, int]:
        return (i % self.cols) * self.tile, (i // self.cols) * self.tile


def pack_charset(
    font: Font, chars: str | list[int], pad_batch_to: int | None = None
) -> PackedBatch:
    """Load + pack a character set from a font (vectorized char->glyph
    resolution, lazy glyph loads)."""
    codes = [ord(c) for c in chars] if isinstance(chars, str) else list(chars)
    idx = font.charmap.glyph_indices(np.array(codes, np.int64))
    glyphs = [font.load_glyph(int(i)) for i in idx]
    widths = [int(font.advance_widths[int(i)]) for i in idx]
    return pack_glyphs(glyphs, widths, pad_batch_to=pad_batch_to)


def render_atlas(
    font: Font,
    chars: str | list[int],
    font_size: int,
    tile: int,
    engine: RasterEngine | None = None,
) -> tuple[np.ndarray, AtlasLayout]:
    """Rasterize a character set into one atlas sheet.

    Returns ``(uint8 [H, W] fill atlas, layout)``.  One kernel launch
    computes every glyph tile; the sheet assembly is a reshape.
    """
    engine = engine or RasterEngine()
    codes = [ord(c) for c in chars] if isinstance(chars, str) else list(chars)
    batch = pack_charset(font, codes)
    winding, _grids = engine.winding_packed(
        batch, font_size, font.info.units_per_em, tile
    )
    fills = np.asarray(engine.fill(winding))  # [B, T, T]

    b = len(fills)
    cols = int(np.ceil(np.sqrt(b)))
    rows = (b + cols - 1) // cols
    sheet = np.zeros((rows * tile, cols * tile), np.uint8)
    for i in range(b):
        x0 = (i % cols) * tile
        y0 = (i // cols) * tile
        sheet[y0 : y0 + tile, x0 : x0 + tile] = fills[i]
    layout = AtlasLayout(tile, cols, rows, tuple(codes))
    return sheet, layout
