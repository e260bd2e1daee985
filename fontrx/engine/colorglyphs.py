"""Color glyph (COLR/CPAL) rendering — layered coverage composite.

Capability extension: the reference is monochrome end to end (its
kernels emit single-channel winding/fill, ``render_glyph.zig:20-33``).
fontrx renders COLR v0 color glyphs by rastering every layer of every
glyph in ONE batched coverage launch (layers are just extra rows in
the segment tensor — the TPU-friendly shape) and folding the layer
stack src-over on device.

Per base glyph all layers share one grid (anchored at the union of the
layer boxes) so the stack composites in register; glyphs without COLR
layers degrade to a single foreground-colored layer of their own
outline, which makes mixed color/monochrome text uniform.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from fontrx.font.font import Font
from fontrx.kernels.grid import RasterGrid
from fontrx.pack.segments import pack_glyphs


def color_tiles(
    font: Font,
    gids: list[int],
    size: int,
    engine,
    *,
    palette: int = 0,
    samples: int = 2,
    foreground: tuple[int, int, int, int] = (0, 0, 0, 255),
    background: tuple[int, int, int] = (255, 255, 255),
) -> np.ndarray:
    """Render ``gids`` as ``size x size`` RGB tiles: uint8
    ``[len(gids), size, size, 3]``.

    One coverage launch covers all (glyph, layer) rows; the src-over
    fold ``rgb = rgb*(1-a) + layer_rgb*a`` with ``a = coverage *
    alpha/255`` runs bottom-to-top per glyph, matching the COLR v0
    paint order.
    """
    upem = font.info.units_per_em
    # (glyph cell) -> ordered [(row, rgba), ...]; rows index the packed
    # (cell, layer) batch
    glyphs = []
    cells: list[list[tuple[int, tuple[int, int, int, int]]]] = []
    row_grid: list[RasterGrid] = []
    for gid in gids:
        layers = font.color_layers(gid, palette, foreground)
        if layers is None:
            layers = [(gid, foreground)]
        loaded = [(font.load_glyph_safe(lg), rgba) for lg, rgba in layers]
        # shared cell grid: union of the layer boxes (all layers must
        # sample identical pixel centers or the stack shears)
        boxes = [g.box for g, _ in loaded]
        union = (
            min(b.x_min for b in boxes), min(b.y_min for b in boxes),
            max(b.x_max for b in boxes), max(b.y_max for b in boxes),
        )
        grid = RasterGrid.fixed_tile(union, size, upem, size)
        rows = []
        for g, rgba in loaded:
            rows.append((len(glyphs), rgba))
            glyphs.append(g)
            row_grid.append(grid)
        cells.append(rows)

    batch = pack_glyphs(glyphs)
    cov = engine.coverage_batch(
        jnp.asarray(batch.segments),
        jnp.array([g.min_x for g in row_grid], jnp.int32),
        jnp.array([g.max_y for g in row_grid], jnp.int32),
        row_grid[0].scale if row_grid else np.float32(size / upem),
        height=size,
        width=size,
        samples=max(samples, 2),
    )

    bg = jnp.asarray(background, jnp.float32)
    tiles = []
    for rows in cells:
        rgb = jnp.broadcast_to(bg, (size, size, 3))
        for row, (r, g_, b, a) in rows:
            av = cov[row][..., None] * (a / 255.0)
            rgb = rgb * (1.0 - av) + jnp.asarray(
                (r, g_, b), jnp.float32) * av
        tiles.append(rgb)
    sheet = jnp.stack(tiles) if tiles else jnp.zeros((0, size, size, 3))
    return np.asarray(
        jnp.clip(jnp.round(sheet), 0, 255).astype(jnp.uint8))
