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
def composite_tiles(tiles, slots, xs, ys, *, page_h, page_w, tile):
    """Max-blend fixed-size tiles onto a page.

    ``tiles``: uint8 ``[U, T, T]`` UNIQUE glyph tiles; ``slots``: int32
    ``[N]`` tile index per instance; ``xs``/``ys``: int32 ``[N]``
    top-left page coords (may be out of bounds — the page is padded by
    T on every side here, then cropped, so edge glyphs clip instead of
    smearing).  The scan gathers each instance's tile INSIDE the body:
    only the unique tiles stay resident, so 10k-instance pages don't
    materialize an ``[N, T, T]`` gather (which OOM'd a 16 GB chip at
    page scale — round-5 probe).
    """
    padded = jnp.zeros((page_h + 2 * tile, page_w + 2 * tile), jnp.uint8)

    def body(page, args):
        s, x0, y0 = args
        t = tiles[s]
        x0 = jnp.clip(x0 + tile, 0, page_w + tile)
        y0 = jnp.clip(y0 + tile, 0, page_h + tile)
        cur = jax.lax.dynamic_slice(page, (y0, x0), (tile, tile))
        return (
            jax.lax.dynamic_update_slice(page, jnp.maximum(cur, t), (y0, x0)),
            None,
        )

    padded, _ = jax.lax.scan(body, padded, (slots, xs, ys))
    return padded[tile : tile + page_h, tile : tile + page_w]


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


class GlyphTileCache:
    """Device-resident LRU of rastered glyph tiles, keyed by
    ``(glyph id, zoom, mode, tile size, variation location)``.

    The reference keeps *meshes* GPU-resident, so pans are free but
    every zoom re-tessellates nothing (vector data).  fontrx's
    composite tiles are rasters, so they are zoom-dependent; this cache
    makes the two interactive hot paths free:

    - **zoom-return**: scroll steps are reversible (1.15^n), so zooming
      in and back out revisits exact scales — every revisited level is
      a full hit and re-rasters nothing;
    - **text edit** (``char_input``): a new layout re-uses every glyph
      already on screen; only genuinely new glyphs raster.

    Eviction is byte-bounded LRU (device tiles; a 512px uint8 tile is
    256 KB).  The cache outlives PageRenderer rebuilds — sessions pass
    one cache into every renderer they create.
    """

    def __init__(self, capacity_bytes: int = 128 * 1024 * 1024):
        from collections import OrderedDict

        self.capacity_bytes = capacity_bytes
        self._tiles: "OrderedDict[tuple, jax.Array]" = OrderedDict()
        self._bytes = 0
        self.hits = 0
        self.misses = 0

    def __len__(self) -> int:
        return len(self._tiles)

    @property
    def nbytes(self) -> int:
        return self._bytes

    def get(self, key):
        t = self._tiles.get(key)
        if t is not None:
            self._tiles.move_to_end(key)
            self.hits += 1
        else:
            self.misses += 1
        return t

    def put(self, key, tile) -> None:
        if key in self._tiles:
            self._tiles.move_to_end(key)
            return
        self._tiles[key] = tile
        self._bytes += int(np.prod(tile.shape))  # uint8
        while self._bytes > self.capacity_bytes and len(self._tiles) > 1:
            _, old = self._tiles.popitem(last=False)
            self._bytes -= int(np.prod(old.shape))

    def stats(self) -> dict:
        return {
            "tiles": len(self._tiles),
            "bytes": self._bytes,
            "hits": self.hits,
            "misses": self.misses,
        }


# direct-page kernel tuning (group_guard, seg_chunk, tile_w or None =
# width-derived).  Set by the round-2 REAL-page A/B
# (tools/tpu_probes/tpu_page_real.py): group elision — a big win on
# per-glyph tile rasters (engine/raster.py defaults) — REGRESSES on
# dense text pages (4K, 140k live segments: 128 -> 188 ms/frame),
# because nearly every (chunk, tile) group is active there and the
# guards only add per-group read-modify-writes; 1080p is a wash.  The
# synthetic uniform-stroke sweep (tpu_page_gg.py) had suggested
# otherwise — tuning decisions here must come from real-content A/Bs.
# 4th element (round 3): row_windows — sub-strip hull-gated detail
# windows; a page chunk's glyphs span ~2-3 of the 8 windows, so phase B
# skips the rest (tools/tpu_probes/tpu_page_rw.py)
PAGE_TUNING = (0, 16, 128, 8)


@functools.partial(
    jax.jit,
    static_argnames=("page_h", "page_w", "exact", "interpret", "mode",
                     "tuning", "out_h"),
)
def _direct_page_step(
    flat_segments, seg_inst_idx, inst_offsets, s_px, band_y0=0, *,
    page_h, page_w, exact=False, interpret=False,
    sample_offset=(0.0, 0.0), mode="fill", tuning=PAGE_TUNING,
    out_h=None,
):
    """One direct-raster frame: map pre-compacted instance segments from
    em to page pixels (y up) and raster the whole page with the v2
    kernel.

    - ``flat_segments``: float32 [S_total, 3, 2] — every instance's live
      segments concatenated (no padding; built once per layout)
    - ``seg_inst_idx``: int32 [S_total] — owning instance per segment
    - ``inst_offsets``: float32 [N, 2] page-pixel offsets of each
      instance's em origin (y up)
    - ``s_px``: pixels per font unit
    - ``band_y0``/``out_h``: render only page rows ``[band_y0,
      band_y0 + out_h)`` (the dirty-strip edit path).  Winding is
      row-local, so the band equals the same rows of the full render
      BIT-FOR-BIT (the full render already splits into row bands
      internally — this just anchors the split).  ``band_y0`` is
      traced (no recompile per edit); ``out_h`` is static.
    """
    from fontrx.kernels.winding_pallas_v2 import winding_pallas_v2_batch

    offs = inst_offsets[seg_inst_idx]           # [S_total, 2]
    flat = (flat_segments * s_px + offs[:, None, :])[None]  # [1, S, 3, 2]

    oh = page_h if out_h is None else out_h
    top = page_h - 1 - band_y0                  # y anchor of row 0
    ph = ((oh + 127) // 128) * 128
    pw = ((page_w + 127) // 128) * 128
    if pw >= 1024:
        # wide pages: the deferred-carry page kernel with DYNAMIC
        # x-hull tile windows — per chunk, a traced fori_loop visits
        # only the 1-2 column tiles its hull overlaps (pl.multiple_of
        # aligns the dynamic lane slices); carries bucket per tile and
        # flush once per strip (kernels/winding_page.py).  Bit-identical
        # to the banded v2 path (device A/B mismatch=0 at 4K and
        # 1080p); real-content timings incl ~33 ms tunnel RTT
        # (tpu_page_defer.py): 4K 168 -> 52.5 ms (~20 ms device, from
        # 94-206 in round 2), 1080p 39 -> 33.  seg_chunk=32: sc64 is
        # interpret-exact but MISCOMPILES on device (Mosaic, the
        # 64-wide unroll inside nested pl.when; docs/RESULTS.md r3).
        from fontrx.kernels.winding_page import winding_page_batch

        wd = winding_page_batch(
            flat,
            jnp.zeros(1, jnp.int32),
            jnp.full(1, 1, jnp.int32) * top,
            jnp.float32(1.0),
            height=ph,
            width=pw,
            exact=exact,
            interpret=interpret,
            sample_offset=sample_offset,
            seg_chunk=32,
            tile_w=256 if pw % 256 == 0 else 128,
            row_windows=tuning[3] if len(tuning) > 3 and tuning[3]
            else 8,
            dynamic_tiles=True,
        )
        winding = wd[0, :oh, :page_w]
        if mode == "winding":
            return jnp.clip(winding * 20 + 100, 0, 255).astype(jnp.uint8)
        return jnp.where(winding != 0, 255, 0).astype(jnp.uint8)
    # split very large pages into row bands: XLA stages each kernel
    # output in scoped VMEM (~16 MB), which a 4K int32 page blows past
    target_bytes = 4 * 1024 * 1024
    band_rows = min(ph, max(128, (target_bytes // (pw * 4)) // 128 * 128))
    bands = []
    for b0 in range(0, ph, band_rows):
        bands.append(
            winding_pallas_v2_batch(
                flat,
                jnp.zeros(1, jnp.int32),
                jnp.full(1, 1, jnp.int32) * top - b0,
                jnp.float32(1.0),
                height=band_rows,
                width=pw,
                exact=exact,
                interpret=interpret,
                sample_offset=sample_offset,
                group_guard=tuning[0],
                seg_chunk=tuning[1],
                tile_w=tuning[2] if tuning[2] else
                (256 if pw % 256 == 0 else 128),
                row_windows=tuning[3] if len(tuning) > 3 else 0,
            )
        )
    winding = jnp.concatenate(bands, axis=1)[0, :oh, :page_w]
    if mode == "winding":
        # debug visualization: the reference's winding coloring
        # (render_glyph.zig:28) instead of the binary fill (Ctrl+D)
        return jnp.clip(winding * 20 + 100, 0, 255).astype(jnp.uint8)
    return jnp.where(winding != 0, 255, 0).astype(jnp.uint8)


@functools.partial(
    jax.jit,
    static_argnames=("page_h", "page_w", "exact", "interpret", "tuning"),
)
def _direct_page_msaa_pair(
    flat_segments, seg_inst_idx, inst_offsets, s_px, *, page_h, page_w,
    sample_oy, sample_oxs, exact=False, interpret=False,
    tuning=PAGE_TUNING,
):
    """Per-sample fill counts (uint16 [page_h, page_w], values 0..2)
    for the two x samples sharing row offset ``sample_oy`` — ONE fused
    launch of ``winding_page_msaa_batch`` (phase A shared across the
    pair; each plane bit-identical to the single-sample kernel, so the
    2x2-MSAA page equals the 4-pass sum exactly).  Wide pages only
    (``page_w`` rounds to >= 1024)."""
    from fontrx.kernels.winding_page import winding_page_msaa_batch

    offs = inst_offsets[seg_inst_idx]
    flat = (flat_segments * s_px + offs[:, None, :])[None]
    ph = ((page_h + 127) // 128) * 128
    pw = ((page_w + 127) // 128) * 128
    wd = winding_page_msaa_batch(
        flat,
        jnp.zeros(1, jnp.int32),
        jnp.full(1, page_h - 1, jnp.int32),
        jnp.float32(1.0),
        height=ph,
        width=pw,
        exact=exact,
        interpret=interpret,
        sample_oy=sample_oy,
        sample_oxs=sample_oxs,
        seg_chunk=32,
        tile_w=256 if pw % 256 == 0 else 128,
        row_windows=tuning[3] if len(tuning) > 3 and tuning[3] else 8,
    )
    fills = jnp.where(wd[0, :, :page_h, :page_w] != 0, 255, 0)
    return fills.astype(jnp.uint16).sum(axis=0)


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
    kernel_tuning: tuple = PAGE_TUNING  # (gg, seg_chunk, tile_w, row_windows)
    tile_cache: GlyphTileCache | None = None  # shared LRU (survives re-layout)
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

    def rasterize_glyphs(
        self, px_per_unit: float, msaa: bool = False, debug: bool = False
    ):
        """Raster every unique glyph at the current zoom into fixed
        tiles; cached until the zoom (scale) or render mode changes.

        ``msaa``: tiles are 2x2-supersampled coverage (antialiased
        alpha) instead of the binary fill — the composite-mode analog of
        the reference's MSAA resolve.  ``debug``: tiles carry the
        winding visualization (``render_glyph.zig:28``), so the
        composite shows per-tile extents + winding structure (the
        Ctrl+D analog for this path)."""
        key = (px_per_unit, msaa, debug)
        if self._cached_scale == key and self._cached_tiles is not None:
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
        gids = self.layout.slot_gids
        cache = self.tile_cache
        if cache is not None and len(gids) == len(grids):
            mode = "msaa" if msaa and not debug else (
                "debug" if debug else "fill"
            )
            # variable fonts: the design location is part of glyph
            # identity (stale-weight tiles otherwise survive axis steps)
            coords = getattr(self.font, "_var_coords", None)
            var_key = None if coords is None else coords.tobytes()
            keys = [
                (gid, float(np.float32(px_per_unit)), mode, tile, var_key)
                for gid in gids
            ]
            got = [cache.get(k) for k in keys]
            missing = [i for i, t in enumerate(got) if t is None]
            if missing:
                sub = self._raster_tiles(
                    self.layout.batch.segments[missing],
                    np.array([grids[i].min_x for i in missing], np.int32),
                    np.array([grids[i].max_y for i in missing], np.int32),
                    px_per_unit, tile, msaa, debug,
                )
                for m, i in enumerate(missing):
                    got[i] = sub[m]
                    cache.put(keys[i], got[i])
            tiles = jnp.stack(got) if got else jnp.zeros(
                (0, tile, tile), jnp.uint8
            )
        else:
            tiles = self._raster_tiles(
                self.layout.batch.segments,
                np.array([g.min_x for g in grids], np.int32),
                np.array([g.max_y for g in grids], np.int32),
                px_per_unit, tile, msaa, debug,
            )
        self._cached_scale = key
        self._cached_tiles = tiles
        self._cached_grids = grids
        return tiles, grids, tile

    def _raster_tiles(
        self, segments, min_x, max_y, px_per_unit, tile, msaa, debug
    ):
        """Raster a batch of glyph tiles in the selected mode: uint8
        ``[B, tile, tile]``."""
        args = (jnp.asarray(segments), min_x, max_y, np.float32(px_per_unit))
        if msaa and not debug:
            cov = self.engine.coverage_batch(
                *args, height=tile, width=tile, samples=2
            )
            return jnp.clip(jnp.round(cov * 255.0), 0, 255).astype(jnp.uint8)
        winding = self.engine.winding_batch(*args, height=tile, width=tile)
        # debug: winding visualization; else binary fill [B, T, T] u8
        return (
            self.engine.gray(winding) if debug else self.engine.fill(winding)
        )

    # -- direct path -------------------------------------------------------

    def render_direct(
        self, view: ViewTransform, msaa: bool = False, debug: bool = False,
        band: tuple[int, int] | None = None,
    ) -> jax.Array:
        """Render one frame by rasterizing the *page* directly from all
        instance segments in a single v2-kernel launch — no per-glyph
        tiles, no composite pass.

        The carry-sweep kernel makes this efficient: per 128-row strip
        the root solve touches only instances whose glyphs intersect the
        strip (hull cull), and per-pixel work happens only in column
        tiles an outline actually crosses.  Zoom/pan change only traced
        inputs — no recompile.
        """
        slots, offsets_em = self.layout.instance_arrays()
        if len(slots) == 0:
            h = band[1] if band is not None else self.height
            return np.zeros((h, self.width), np.uint8)
        flat_segments, seg_inst_idx = self._compact_instances(slots)
        s_px = np.float32(view.scale[0] * (self.width / 2.0))
        # em origin of each instance in page pixels, y up
        # (page row r samples y = page_h-1-r in the kernel's grid).
        # Vectorized in f64 (same IEEE results as the scalar
        # view.apply loop, which cost ~ms/frame at 10k instances)
        em = offsets_em.astype(np.float64)
        ndc_x = em[:, 0] * view.scale[0] + view.offset[0]
        ndc_y = (em[:, 1] * view.scale[1] + view.offset[1]) * view.aspect_ratio
        # instance rows bucket to 256 for the same shape-stability
        # reason as the segment stream; padded rows sit far off-page
        # (and own only zero segments), so they contribute nothing
        n_inst = ((len(slots) + 1 + 255) // 256) * 256
        xs = np.full((n_inst, 2), -1e7, np.float32)
        xs[: len(slots), 0] = (ndc_x + 1.0) / 2.0 * self.width
        xs[: len(slots), 1] = (ndc_y + 1.0) / 2.0 * self.height
        # returns the device array; callers fetch at IO boundaries
        interp = self.engine._resolve() != "pallas"
        if band is not None:
            # dirty-strip edit path: rows [y0, y0+bh) only, bit-equal
            # to the same rows of the full render (fill mode; callers
            # fall back to full renders for msaa/debug)
            assert not msaa and not debug, "band renders are fill-only"
            y0, bh = band
            return _direct_page_step(
                flat_segments, seg_inst_idx, jnp.asarray(xs), s_px,
                np.int32(y0), page_h=self.height, page_w=self.width,
                interpret=interp, tuning=self.kernel_tuning, out_h=bh,
            )
        if msaa:
            from fontrx.kernels.coverage import sample_offsets

            offsets = np.asarray(sample_offsets(2))
            pw = ((self.width + 127) // 128) * 128
            if pw >= 1024:
                # wide pages: 2x2 MSAA as TWO fused x-pair launches of
                # the deferred-carry kernel — phase A and the chunk
                # stream are shared per row offset (the 4-pass cost was
                # chunk-fixed-cost-bound, not detail-bound).  Each
                # sample plane is bit-identical to the single-sample
                # kernel, so this equals the 4-pass page exactly
                # (device A/B: tools/tpu_probes/tpu_page_msaa.py).
                acc = None
                for oy in sorted(set(float(o[1]) for o in offsets)):
                    oxs = tuple(sorted(
                        float(o[0]) for o in offsets
                        if float(o[1]) == oy))
                    f = _direct_page_msaa_pair(
                        flat_segments, seg_inst_idx, jnp.asarray(xs),
                        s_px, page_h=self.height, page_w=self.width,
                        sample_oy=oy, sample_oxs=oxs,
                        interpret=interp, tuning=self.kernel_tuning,
                    )
                    acc = f if acc is None else acc + f
                return (acc // 4).astype(jnp.uint8)
            # narrow pages ride the banded v2 path: four sub-pixel
            # passes of the streamed winding kernel.  (Measured on TPU:
            # the fused coverage kernel loses badly at page widths —
            # its per-(chunk, sample, tile) guard branches dominate —
            # while four passes of the tuned winding kernel cost
            # ~4 x 13 ms at 1080p.)
            acc = None
            for ox, oy in offsets:
                f = _direct_page_step(
                    flat_segments, seg_inst_idx, jnp.asarray(xs), s_px,
                    page_h=self.height, page_w=self.width, interpret=interp,
                    sample_offset=(float(ox), float(oy)),
                    tuning=self.kernel_tuning,
                ).astype(jnp.uint16)
                acc = f if acc is None else acc + f
            return (acc // 4).astype(jnp.uint8)
        return _direct_page_step(
            flat_segments,
            seg_inst_idx,
            jnp.asarray(xs),
            s_px,
            page_h=self.height,
            page_w=self.width,
            interpret=interp,
            mode="winding" if debug else "fill",
            tuning=self.kernel_tuning,
        )

    def _compact_instances(self, slots):
        """Per-layout compaction: concatenate every instance's *live*
        segments (padding dropped — at 1000-instance pages the padded
        gather was ~4x the real segment count) with an owning-instance
        index per segment.  Built once; zoom/pan only change the traced
        offsets."""
        if getattr(self, "_compact_cache", None) is not None:
            return self._compact_cache
        batch = self.layout.batch
        seg_chunks = []
        idx_chunks = []
        for i, slot in enumerate(slots):
            n = int(batch.seg_counts[slot])
            if n == 0:
                continue
            seg_chunks.append(batch.segments[slot, :n])
            idx_chunks.append(np.full(n, i, np.int32))
        if not seg_chunks:
            seg_chunks = [np.zeros((1, 3, 2), np.float32)]
            idx_chunks = [np.zeros(1, np.int32)]
        seg = np.concatenate(seg_chunks)
        idx = np.concatenate(idx_chunks)
        # bucket the stream length so interactive EDITS keep a stable
        # traced shape (every keystroke changes the live segment count;
        # unbucketed, each edit recompiled the page kernel).  Padding
        # segments are all-zero (inert in the winding sum, the same
        # convention as pack_glyphs row padding) and owned by the
        # off-page sentinel instance render_direct appends.
        cap = ((len(seg) + 2047) // 2048) * 2048
        if cap != len(seg):
            seg = np.concatenate(
                [seg, np.zeros((cap - len(seg), 3, 2), np.float32)])
            idx = np.concatenate(
                [idx, np.full(cap - len(idx), len(slots), np.int32)])
        self._compact_cache = (jnp.asarray(seg), jnp.asarray(idx))
        return self._compact_cache

    # -- output conversion -------------------------------------------------

    @staticmethod
    def to_rgba(page: np.ndarray, transparent: bool = False) -> np.ndarray:
        """Page coverage -> RGBA.  ``transparent=True`` is the analog of
        the reference's transparent-framebuffer mode (premultiplied
        composite alpha, ``VulkanContext.zig:891`` + Ctrl+T): background
        alpha 0 so the page composites over anything; otherwise opaque
        over black.  Color pages (``[H, W, 3]`` from ``render_color``)
        pass through with an opaque alpha."""
        if page.ndim == 3:
            rgba = np.empty(page.shape[:2] + (4,), np.uint8)
            rgba[..., :3] = page
            rgba[..., 3] = 255
            return rgba
        a = page.astype(np.uint8)
        rgba = np.zeros(page.shape + (4,), np.uint8)
        rgba[..., 0] = a
        rgba[..., 1] = a
        rgba[..., 2] = a
        rgba[..., 3] = a if transparent else 255
        return rgba

    def render_color(
        self, view: ViewTransform, palette: int = 0, samples: int = 2,
    ) -> np.ndarray:
        """Render one COLR/CPAL color frame: uint8 ``[H, W, 3]``.

        The color analog of the composite pipeline: premultiplied RGBA
        glyph tiles raster once per zoom (cached like
        ``rasterize_glyphs``) and composite src-over at the instance
        pen positions (``engine/colorglyphs.py``).  Monochrome glyphs
        ride along as foreground-colored layers."""
        from fontrx.engine.colorglyphs import (
            color_glyph_tiles,
            composite_color_page,
        )

        px_per_unit = view.scale[0] * (self.width / 2.0)
        if px_per_unit <= 0:
            raise ValueError("view scale must be positive")
        tile = self._tile_size(px_per_unit)
        key = (px_per_unit, palette, tile)
        cached = getattr(self, "_color_cache", None)
        if cached is None or cached[0] != key:
            tiles, grids = color_glyph_tiles(
                self.font, [int(g) for g in self.layout.slot_gids],
                px_per_unit * self.font.info.units_per_em,
                self.engine, palette=palette, samples=samples,
                tile=tile,
            )
            self._color_cache = cached = (key, tiles, grids)
        _, tiles, grids = cached

        slots, offsets = self.layout.instance_arrays()
        em = offsets.astype(np.float64)
        ndc_x = em[:, 0] * view.scale[0] + view.offset[0]
        ndc_y = (em[:, 1] * view.scale[1] + view.offset[1]) \
            * view.aspect_ratio
        pen = np.empty((len(slots), 2), np.float64)
        pen[:, 0] = (ndc_x + 1.0) / 2.0 * self.width
        pen[:, 1] = (1.0 - ndc_y) / 2.0 * self.height
        return composite_color_page(
            tiles, grids, slots, pen,
            page_h=self.height, page_w=self.width,
        )

    # -- frame -------------------------------------------------------------

    def render(
        self, view: ViewTransform, msaa: bool = False, debug: bool = False
    ) -> np.ndarray:
        """Render one frame: uint8 ``[H, W]`` page.  ``msaa``/``debug``
        select the glyph-tile mode (see ``rasterize_glyphs``)."""
        px_per_unit = view.scale[0] * (self.width / 2.0)
        if px_per_unit <= 0:
            raise ValueError("view scale must be positive")
        tiles, grids, tile = self.rasterize_glyphs(px_per_unit, msaa, debug)

        slots, offsets = self.layout.instance_arrays()
        if len(slots) == 0:
            return np.zeros((self.height, self.width), np.uint8)

        # pen position (em) -> NDC -> page pixels; y flips top-down
        # (vectorized f64, same IEEE results as the scalar loop;
        # np.round == Python round: both round-half-even)
        em = offsets.astype(np.float64)
        ndc_x = em[:, 0] * view.scale[0] + view.offset[0]
        ndc_y = (em[:, 1] * view.scale[1] + view.offset[1]) * view.aspect_ratio
        base_px = (ndc_x + 1.0) / 2.0 * self.width
        base_py = (1.0 - ndc_y) / 2.0 * self.height
        g_minx = np.array([g.min_x for g in grids], np.int64)[slots]
        g_maxy = np.array([g.max_y for g in grids], np.int64)[slots]
        # tile origin: glyph bbox anchor relative to the pen
        xs = (np.round(base_px).astype(np.int64) + g_minx).astype(np.int32)
        ys = (np.round(base_py).astype(np.int64) - g_maxy).astype(np.int32)
        page = composite_tiles(
            jnp.asarray(tiles),
            jnp.asarray(slots),
            jnp.asarray(xs),
            jnp.asarray(ys),
            page_h=self.height,
            page_w=self.width,
            tile=tile,
        )
        return np.asarray(page)
