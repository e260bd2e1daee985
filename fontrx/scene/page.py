"""Page rendering: text layout -> full pixel page, on device.

The TPU re-design of the reference's frame loop (``Appli.zig:145-217``,
three pipeline passes x per-instance ``cmdDrawIndexed``): here a frame is
two jitted steps —

1. **glyph pass**: one batched winding raster of the *unique* glyphs at
   the current zoom (cost O(unique glyphs), the same reuse property as
   the reference's mesh cache, SURVEY §5.7), then
2. **composite pass**: a ``lax.scan`` of max-blend ``dynamic_update_slice``
   placements of instance tiles onto the page.

Static shapes: tile size and instance count are bucketed so zooming
never recompiles (``grid.min_x/max_y`` and pen offsets are traced
inputs; only the tile bucket changes shape).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from fontrx.engine.raster import RasterEngine
from fontrx.font.font import Font
from fontrx.kernels.grid import RasterGrid
from fontrx.scene.layout import TextLayout
from fontrx.scene.transform import ViewTransform
from fontrx.utils.log import get_logger

log = get_logger("Page")


@functools.partial(jax.jit, static_argnames=("page_h", "page_w", "tile"))
def composite_tiles(tiles, xs, ys, *, page_h, page_w, tile):
    """Max-blend fixed-size tiles onto a page.

    ``tiles``: uint8 ``[N, T, T]``; ``xs``/``ys``: int32 ``[N]`` top-left
    page coords (may be out of bounds — the page is padded by T on every
    side here, then cropped, so edge glyphs clip instead of smearing).
    """
    padded = jnp.zeros((page_h + 2 * tile, page_w + 2 * tile), jnp.uint8)

    def body(page, args):
        t, x0, y0 = args
        x0 = jnp.clip(x0 + tile, 0, page_w + tile)
        y0 = jnp.clip(y0 + tile, 0, page_h + tile)
        cur = jax.lax.dynamic_slice(page, (y0, x0), (tile, tile))
        return (
            jax.lax.dynamic_update_slice(page, jnp.maximum(cur, t), (y0, x0)),
            None,
        )

    padded, _ = jax.lax.scan(body, padded, (tiles, xs, ys))
    return padded[tile : tile + page_h, tile : tile + page_w]


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


@dataclass
class PageRenderer:
    """Renders a ``TextLayout`` under a ``ViewTransform`` to a page.

    The per-frame flow (``render``) is the analog of
    ``Appli.renderingFn``: update transforms, raster unique glyphs (only
    when zoom changed — the glyph tiles persist across pans like the
    reference's GPU-resident meshes), composite instances.
    """

    font: Font
    layout: TextLayout
    width: int
    height: int
    engine: RasterEngine | None = None
    _cached_scale: float | None = None
    _cached_tiles: object = None
    _cached_grids: object = None

    def __post_init__(self):
        if self.engine is None:
            self.engine = RasterEngine()

    # -- glyph pass --------------------------------------------------------

    def _tile_size(self, px_per_unit: float) -> int:
        boxes = np.asarray(self.layout.batch.boxes)
        if len(boxes) == 0:
            return 128
        spans = np.maximum(boxes[:, 2] - boxes[:, 0], boxes[:, 3] - boxes[:, 1])
        max_px = float(spans.max()) * px_per_unit
        return min(max(_next_pow2(int(max_px) + 2), 128), 2048)

    def rasterize_glyphs(self, px_per_unit: float):
        """Raster every unique glyph at the current zoom into fixed
        tiles; cached until the zoom (scale) changes."""
        if self._cached_scale == px_per_unit and self._cached_tiles is not None:
            return self._cached_tiles, self._cached_grids, self._tile_size(px_per_unit)
        tile = self._tile_size(px_per_unit)
        boxes = np.asarray(self.layout.batch.boxes)
        grids = [
            RasterGrid(
                width=tile,
                height=tile,
                min_x=int(np.floor(np.float32(b[0]) * np.float32(px_per_unit))),
                max_y=int(np.ceil(np.float32(b[3]) * np.float32(px_per_unit))),
                scale=float(np.float32(px_per_unit)),
            )
            for b in boxes
        ]
        winding = self.engine.winding_batch(
            jnp.asarray(self.layout.batch.segments),
            np.array([g.min_x for g in grids], np.int32),
            np.array([g.max_y for g in grids], np.int32),
            np.float32(px_per_unit),
            height=tile,
            width=tile,
        )
        tiles = self.engine.fill(winding)  # [B, T, T] uint8
        self._cached_scale = px_per_unit
        self._cached_tiles = tiles
        self._cached_grids = grids
        return tiles, grids, tile

    # -- frame -------------------------------------------------------------

    def render(self, view: ViewTransform) -> np.ndarray:
        """Render one frame: uint8 ``[H, W]`` page."""
        px_per_unit = view.scale[0] * (self.width / 2.0)
        if px_per_unit <= 0:
            raise ValueError("view scale must be positive")
        tiles, grids, tile = self.rasterize_glyphs(px_per_unit)

        slots, offsets = self.layout.instance_arrays()
        if len(slots) == 0:
            return np.zeros((self.height, self.width), np.uint8)
        inst_tiles = jnp.asarray(tiles)[slots]

        # pen position (em) -> NDC -> page pixels; y flips top-down
        xs = np.empty(len(slots), np.int32)
        ys = np.empty(len(slots), np.int32)
        for i, (slot, (ex, ey)) in enumerate(zip(slots, offsets)):
            ndc_x, ndc_y = view.apply(float(ex), float(ey))
            base_px = (ndc_x + 1.0) / 2.0 * self.width
            base_py = (1.0 - ndc_y) / 2.0 * self.height
            g = grids[slot]
            # tile origin: glyph bbox anchor relative to the pen
            xs[i] = int(round(base_px)) + g.min_x
            ys[i] = int(round(base_py)) - g.max_y
        page = composite_tiles(
            inst_tiles,
            jnp.asarray(xs),
            jnp.asarray(ys),
            page_h=self.height,
            page_w=self.width,
            tile=tile,
        )
        return np.asarray(page)
