"""Exhaustive TPU bit-exactness qualification (the full gate).

Checks EVERY pixel of:

1. all 94 printable-ASCII glyphs @256px, winding, both kernel modes
   (``guard=False`` carry-free and ``guard=True`` carry-sweep);
2. the same ASCII set @64px 4x (2x2) MSAA coverage through BOTH
   strategies (fused single-launch kernel and k^2-offset multipass-v2),
   at every sample offset;
3. 100 seeded-random glyphs from the full font @256px, both guard
   modes;
4. the split-packing path (``pack_glyphs_split`` +
   ``RasterEngine.winding_split``: per-row rasters folded by an
   on-device ``segment_sum``) over those random glyphs @64px,

against the CPU IEEE oracle (the op-for-op NumPy reimplementation of
``/root/reference/src/tools/render_glyph.zig:35-73``).

Tunnel-aware design: large host *fetches* crawl (~8 MB/s), so expected
rasters are uploaded once with ``device_put`` and compared ON DEVICE;
only the int mismatch-count scalar comes back.

FMA semantics: the oracle has two modes for the x-polynomial
``(ax*t + bx)*t + p0x`` — ``contract=True`` (fused, what XLA:CPU
emits) and ``contract=False`` (strict, what XLA:TPU emits).  The gate
reports mismatches against BOTH and asserts zero against the
backend-canonical one.

Run standalone (``python -m benchmarks.full_gate``) or via
``FONTRX_FULL_GATE=1 python bench.py``.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

FONT = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"
ASCII = [c for c in range(33, 127)]


def _device_mismatch(out_dev, expected: np.ndarray) -> int:
    """Exact device-side compare: upload expected, fetch one scalar."""
    import jax
    import jax.numpy as jnp

    exp = jax.device_put(jnp.asarray(expected))
    return int(jnp.sum(out_dev != exp))


def _oracle_windings(batch, grids, contract: bool) -> np.ndarray:
    from fontrx.kernels import oracle

    out = np.zeros(
        (len(grids), grids[0].height, grids[0].width), np.int32
    )
    for i, g in enumerate(grids):
        xs, ys = g.sample_coords()
        out[i] = oracle.winding_at(
            batch.segments[i], xs[None, :], ys[:, None], contract=contract
        )
    return out


def _offset_coords(grid, ox: float, oy: float):
    """Sample coords at an MSAA sub-pixel offset with the kernels' exact
    op order: int anchor -> f32, + f32 offset, correctly-rounded / scale."""
    scale = np.float32(grid.scale)
    xs = ((grid.min_x + np.arange(grid.width)).astype(np.float32)
          + np.float32(ox)) / scale
    ys = ((grid.max_y - np.arange(grid.height)).astype(np.float32)
          + np.float32(oy)) / scale
    return xs, ys


def run_full_gate(verbose: bool = True) -> dict:
    import jax
    import jax.numpy as jnp

    from fontrx.engine.atlas import pack_charset
    from fontrx.engine.raster import RasterEngine
    from fontrx.font.font import Font
    from fontrx.kernels import oracle
    from fontrx.kernels.coverage import sample_offsets
    from fontrx.kernels.grid import RasterGrid
    from fontrx.kernels.winding_pallas_v2 import winding_pallas_v2_batch
    from fontrx.pack.segments import pack_glyphs, pack_glyphs_split

    backend = jax.default_backend()
    # canonical oracle mode per backend: XLA:TPU does not contract the
    # x-polynomial into FMAs; XLA:CPU does (round-1 finding)
    canonical_contract = backend != "tpu"
    engine = RasterEngine()  # exact=True default
    font = Font.open(FONT)
    results = {"backend": backend, "canonical_contract": canonical_contract}
    total_checked = 0
    total_mismatch = 0

    def log(msg):
        if verbose:
            print(msg, file=sys.stderr, flush=True)

    oracle_cache: dict = {}

    def gate(name, out_dev, grids, batch):
        nonlocal total_checked, total_mismatch
        t0 = time.perf_counter()
        key = (id(batch), id(grids))  # expected is identical across guard modes
        if key not in oracle_cache:
            oracle_cache[key] = (
                _oracle_windings(batch, grids, contract=canonical_contract),
                _oracle_windings(batch, grids, contract=not canonical_contract),
            )
        exp_c, exp_a = oracle_cache[key]
        m_c = _device_mismatch(out_dev, exp_c)
        m_a = _device_mismatch(out_dev, exp_a)
        n = exp_c.size
        results[name] = {
            "checked": n,
            "mismatch_canonical": m_c,
            "mismatch_alt_fma": m_a,
        }
        total_checked += n
        total_mismatch += m_c
        log(f"  {name}: {m_c}/{n} (alt-FMA oracle: {m_a}) "
            f"[{time.perf_counter() - t0:.1f}s]")

    # ---- 1. ASCII @256, both guard modes --------------------------------
    log("gate 1: ASCII 94 @256px winding, both guard modes")
    batch = pack_charset(font, ASCII)
    grids = [
        RasterGrid.fixed_tile(tuple(b), 256, font.info.units_per_em, 256)
        for b in np.asarray(batch.boxes)
    ]
    seg = jnp.asarray(batch.segments)
    mx = jnp.asarray(np.array([g.min_x for g in grids], np.int32))
    my = jnp.asarray(np.array([g.max_y for g in grids], np.int32))
    scale = jnp.float32(grids[0].scale)
    for guard in (False, True):
        out = winding_pallas_v2_batch(
            seg, mx, my, scale, height=256, width=256,
            exact=True, guard=guard,
            interpret=backend != "tpu",
        )
        gate(f"ascii256_guard{guard}", out, grids, batch)
    # the ENGINE path: qualifies whatever production knobs
    # RasterEngine.winding_batch currently picks (capacity-adaptive
    # group_guard, tile_w, seg_chunk) — gates 1/3's direct kernel calls
    # cover the guard modes, this covers the shipped parameterization
    out = engine.winding_batch(
        seg, mx, my, float(scale), height=256, width=256,
    )
    gate("ascii256_engine", out, grids, batch)

    # ---- 2. ASCII @64 4x MSAA coverage, both strategies, every offset ---
    log("gate 2: ASCII 94 @64px 2x2 coverage, fused + multipass")
    grids64 = [
        RasterGrid.fixed_tile(tuple(b), 64, font.info.units_per_em, 64)
        for b in np.asarray(batch.boxes)
    ]
    mx64 = jnp.asarray(np.array([g.min_x for g in grids64], np.int32))
    my64 = jnp.asarray(np.array([g.max_y for g in grids64], np.int32))
    s64 = jnp.float32(grids64[0].scale)
    # expected coverage: mean over offsets of oracle nonzero-winding
    offs = sample_offsets(2)
    exp_cov = np.zeros((len(grids64), 64, 64), np.float32)
    for ox, oy in offs:
        for i, g in enumerate(grids64):
            xs, ys = _offset_coords(g, ox, oy)
            w = oracle.winding_at(
                batch.segments[i], xs[None, :], ys[:, None],
                contract=canonical_contract,
            )
            exp_cov[i] += (w != 0).astype(np.float32)
    exp_cov /= len(offs)
    for fused in (True, False):
        cov = engine.coverage_batch(
            seg, mx64, my64, s64, height=64, width=64, samples=2,
            fused=fused,
        )
        m = _device_mismatch(cov, exp_cov)
        name = f"coverage64_{'fused' if fused else 'multipass'}"
        results[name] = {"checked": exp_cov.size, "mismatch_canonical": m}
        total_checked += exp_cov.size
        total_mismatch += m
        log(f"  {name}: {m}/{exp_cov.size}")

    # ---- 3. 100 random glyphs @256, both guard modes --------------------
    log("gate 3: 100 random font glyphs @256px, both guard modes")
    rng = np.random.default_rng(20260816)
    candidates = rng.permutation(font.num_glyphs)
    glyphs = []
    for idx in candidates:
        g = font.load_glyph_safe(int(idx))
        if g.num_segments:
            glyphs.append(g)
        if len(glyphs) == 100:
            break
    rbatch = pack_glyphs(glyphs)
    rgrids = [
        RasterGrid.fixed_tile(tuple(b), 256, font.info.units_per_em, 256)
        for b in np.asarray(rbatch.boxes)
    ]
    rseg = jnp.asarray(rbatch.segments)
    rmx = jnp.asarray(np.array([g.min_x for g in rgrids], np.int32))
    rmy = jnp.asarray(np.array([g.max_y for g in rgrids], np.int32))
    rscale = jnp.float32(rgrids[0].scale)
    for guard in (False, True):
        out = winding_pallas_v2_batch(
            rseg, rmx, rmy, rscale, height=256, width=256,
            exact=True, guard=guard,
            interpret=backend != "tpu",
        )
        gate(f"random256_guard{guard}", out, rgrids, rbatch)
    out = engine.winding_batch(
        rseg, rmx, rmy, float(rscale), height=256, width=256,
    )
    gate("random256_engine", out, rgrids, rbatch)

    # ---- 4. split-packing path @64 --------------------------------------
    log("gate 4: split packing + on-device segment_sum fold @64px")
    split = pack_glyphs_split(glyphs, capacity=32)
    out_split, sgrids = engine.winding_split(
        split, 64, font.info.units_per_em, 64
    )
    exp_split = np.zeros((len(glyphs), 64, 64), np.int32)
    from fontrx.pack.segments import glyph_segments

    for i, (g, grid) in enumerate(zip(glyphs, sgrids)):
        xs, ys = grid.sample_coords()
        exp_split[i] = oracle.winding_at(
            glyph_segments(g), xs[None, :], ys[:, None],
            contract=canonical_contract,
        )
    m = _device_mismatch(out_split, exp_split)
    results["split64"] = {"checked": exp_split.size, "mismatch_canonical": m}
    total_checked += exp_split.size
    total_mismatch += m
    log(f"  split64: {m}/{exp_split.size}")

    # ---- 5. row-banded atlas path @64 and @32 ----------------------------
    log("gate 5: row-banded strips (2x @64px, 4x @32px) vs per-glyph oracle")
    for tile in (64, 32):
        out_b, bgrids = engine.winding_packed_banded(
            glyphs, tile, font.info.units_per_em, tile
        )
        exp_b = np.zeros((len(glyphs), tile, tile), np.int32)
        for i, (g, grid) in enumerate(zip(glyphs, bgrids)):
            xs, ys = grid.sample_coords()
            exp_b[i] = oracle.winding_at(
                glyph_segments(g), xs[None, :], ys[:, None],
                contract=canonical_contract,
            )
        m = _device_mismatch(out_b, exp_b)
        results[f"banded{tile}"] = {
            "checked": exp_b.size, "mismatch_canonical": m,
        }
        total_checked += exp_b.size
        total_mismatch += m
        log(f"  banded{tile}: {m}/{exp_b.size}")

    # ---- 6. dense-regime engine path (column-major kernel) ---------------
    log("gate 6: dense 288-seg atlas @64px/@32px (column-major kernel)")
    from benchmarks.cjk import UPEM as CJK_UPEM
    from benchmarks.cjk import make_batch
    from fontrx.pack.segments import xsort_segments

    dsegs = make_batch(150, 288, seed=20260817)
    dx = jnp.asarray(np.stack([xsort_segments(s) for s in dsegs]))
    for tile in (64, 32):
        dscale = np.float32(tile / CJK_UPEM)
        dmx = jnp.zeros(150, jnp.int32)
        dmy = jnp.full(150, tile - 1, jnp.int32)
        out_d = engine.winding_batch(
            dx, dmx, dmy, dscale, height=tile, width=tile,
        )
        exp_d = np.zeros((150, tile, tile), np.int32)
        xs = np.arange(tile).astype(np.float32) / dscale
        ys = (tile - 1 - np.arange(tile)).astype(np.float32) / dscale
        for i in range(150):
            exp_d[i] = oracle.winding_at(
                dsegs[i], xs[None, :], ys[:, None],
                contract=canonical_contract,
            )
        m = _device_mismatch(out_d, exp_d)
        results[f"dense{tile}"] = {
            "checked": exp_d.size, "mismatch_canonical": m,
        }
        total_checked += exp_d.size
        total_mismatch += m
        log(f"  dense{tile}: {m}/{exp_d.size}")

        # the window-packed dense path (the shipped atlas
        # parameterization when callers pack windows at pack time)
        wins = engine.pack_windows(
            np.stack([xsort_segments(s) for s in dsegs]),
            np.asarray(dmx), np.asarray(dmy), float(dscale),
            height=tile,
        )
        if wins is not None:
            out_w = engine.winding_batch(
                dx, dmx, dmy, dscale, height=tile, width=tile,
                windows=wins,
            )
            m = _device_mismatch(out_w, exp_d)
            results[f"dense{tile}win"] = {
                "checked": exp_d.size, "mismatch_canonical": m,
            }
            total_checked += exp_d.size
            total_mismatch += m
            log(f"  dense{tile}win: {m}/{exp_d.size}")

    # ---- 7. SDF + LCD modes (every shipped CLI mode gate-listed) ---------
    # SDF is Newton-lattice vs closed-form: tolerance-gated at the u8
    # quantization step (mismatch = pixels beyond it, expected 0).
    # LCD subpixel coverage is exact winding math: bit-gated.
    log("gate 7: SDF flat-mode tolerance + LCD subpixel bit-equality")
    from fontrx.kernels.coverage import lcd_coverage_batch
    from fontrx.kernels.sdf import sdf_batch

    sdf_glyphs = glyphs[:40]
    sbatch = pack_glyphs(sdf_glyphs)
    sgrids2 = [
        RasterGrid.fixed_tile(tuple(bx), 32, font.info.units_per_em, 32)
        for bx in np.asarray(sbatch.boxes)
    ]
    smx = jnp.asarray(np.array([g.min_x for g in sgrids2], np.int32))
    smy = jnp.asarray(np.array([g.max_y for g in sgrids2], np.int32))
    sscale = jnp.float32(sgrids2[0].scale)
    if backend == "tpu":
        from fontrx.kernels.sdf_pallas import sdf_pallas_batch

        sdf_dev = sdf_pallas_batch(
            sbatch.segments, smx, smy, sscale, height=32, width=32,
            flat=True,
        )
    else:
        sdf_dev = sdf_batch(
            jnp.asarray(sbatch.segments), smx, smy, sscale,
            height=32, width=32,
        )
    sdf_ref = sdf_batch(
        jnp.asarray(sbatch.segments), smx, smy, sscale,
        height=32, width=32,
    )
    # the reference SIGN comes from the backend-canonical oracle
    # winding (far-field sign flips on FMA-semantics tie pixels are
    # the same cross-backend delta the winding gates book-keep; the
    # TPU kernel's exact-mode sign matches the strict-FMA oracle)
    sgn = np.zeros((len(sdf_glyphs), 32, 32), np.float32)
    for gi, gg in enumerate(sgrids2):
        gxs, gys = gg.sample_coords()
        gw = oracle.winding_at(
            sbatch.segments[gi], gxs[None, :], gys[:, None],
            contract=canonical_contract,
        )
        sgn[gi] = np.where(gw != 0, 1.0, -1.0)
    sdf_ref = jnp.asarray(sgn) * jnp.abs(sdf_ref)
    spread = 8.0
    quant = spread / 127.0
    d = jnp.abs(jnp.clip(sdf_dev, -spread, spread)
                - jnp.clip(sdf_ref, -spread, spread))
    m = int(jnp.sum(d > quant))
    results["sdf32"] = {
        "checked": int(np.prod(sdf_dev.shape)),
        "mismatch_canonical": m,
        "tolerance_px": round(quant, 4),
        "max_dev_px": round(float(jnp.max(d)), 4),
    }
    total_checked += int(np.prod(sdf_dev.shape))
    total_mismatch += m
    log(f"  sdf32: {m}/{int(np.prod(sdf_dev.shape))} beyond "
        f"{quant:.4f}px (max dev {float(jnp.max(d)):.4f})")

    # ---- 7b. tiled band-culled SDF: BIT-identity vs the flat kernel ----
    # the tiled kernel's contract is bit-identical output (kept pairs
    # run the identical float program; dropped pairs provably clamp at
    # spread) — gate it at full strength on the same batch
    log("gate 7b: tiled band-culled SDF, bit-equality vs flat kernel")
    from fontrx.kernels.sdf_pallas import (
        pack_sdf_tiles,
        sdf_pallas_batch as _sdf_flat,
        sdf_pallas_tiled_batch,
    )

    flat_dev = (sdf_dev if backend == "tpu" else _sdf_flat(
        jnp.asarray(sbatch.segments), smx, smy, sscale,
        height=32, width=32, flat=True, interpret=True))
    stream, cnts, tids, cap = pack_sdf_tiles(
        np.asarray(sbatch.segments), np.asarray(smx), np.asarray(smy),
        float(sscale), 32, 32, tile_h=8, tile_w=16, sort_tiles=True)
    tiled_dev = sdf_pallas_tiled_batch(
        jnp.asarray(sbatch.segments), jnp.asarray(stream),
        jnp.asarray(cnts), tids, smx, smy, sscale, height=32, width=32,
        cap=cap, tile_h=8, tile_w=16, interpret=backend != "tpu")
    m = int(np.sum(np.asarray(tiled_dev) != np.asarray(flat_dev)))
    results["sdf_tiled32"] = {
        "checked": int(np.prod(np.asarray(tiled_dev).shape)),
        "mismatch_canonical": m,
        "tile": "8x16", "cap": int(cap),
    }
    total_checked += int(np.prod(np.asarray(tiled_dev).shape))
    total_mismatch += m
    log(f"  sdf_tiled32: {m}/{int(np.prod(np.asarray(tiled_dev).shape))}")

    lcd_glyphs = glyphs[:20]
    lbatch = pack_glyphs(lcd_glyphs)
    lgrids = [
        RasterGrid.fixed_tile(tuple(bx), 48, font.info.units_per_em, 48)
        for bx in np.asarray(lbatch.boxes)
    ]
    lmx = jnp.asarray(np.array([g.min_x for g in lgrids], np.int32))
    lmy = jnp.asarray(np.array([g.max_y for g in lgrids], np.int32))
    lscale = jnp.float32(lgrids[0].scale)
    # the Pallas path needs strip-padded tiles (the CLI pads the same
    # way, cli/main.py lcd mode); compare the cropped rasters
    lcd = lcd_coverage_batch(
        jnp.asarray(lbatch.segments), lmx, lmy, lscale,
        height=128, width=128, samples=2, exact=True, use_pallas=True,
        interpret=backend != "tpu",
    )[:, :48, :48, :]
    lcd_ref = lcd_coverage_batch(
        jnp.asarray(lbatch.segments), lmx, lmy, lscale,
        height=48, width=48, samples=2, use_pallas=False,
    )
    m = int(jnp.sum(lcd != lcd_ref))
    results["lcd48"] = {
        "checked": int(np.prod(lcd.shape)), "mismatch_canonical": m,
    }
    total_checked += int(np.prod(lcd.shape))
    total_mismatch += m
    log(f"  lcd48: {m}/{int(np.prod(lcd.shape))}")

    # ---- 8. Loop-Blinn triangle fill (config 3's mode) -------------------
    # coverage identity: the Pallas kernel runs the same float program
    # per (triangle, pixel) as the jnp twin, and the fill fold is
    # order-independent — bit-gated
    log("gate 8: Loop-Blinn triangle fill, Pallas vs jnp twin")
    from fontrx.geometry import TriangulatedGlyph
    from fontrx.kernels.loopblinn import (
        _pack_triangle_arrays,
        loopblinn_batch,
        loopblinn_pallas_batch,
        pad_triangles,
    )

    lb_glyphs = []
    for c in ASCII:
        g, _ = font.get_glyph(chr(c))
        if g.num_segments:
            lb_glyphs.append((chr(c), g))
    tgs = []
    for _, g in lb_glyphs:
        try:
            tgs.append(TriangulatedGlyph.from_glyph(g))
        except Exception:  # self-intersecting: winding fallback
            tgs.append(None)
    pairs = [(g, t) for (_, g), t in zip(lb_glyphs, tgs)
             if t is not None and len(t.triangles)]
    lcap = max(len(t.triangles) for _, t in pairs)
    ltris = np.zeros((len(pairs), lcap, 3, 4), np.float32)
    lcls = np.full((len(pairs), lcap), 3, np.int32)
    lgrids2 = []
    for i, (g, t) in enumerate(pairs):
        p, pc = pad_triangles(_pack_triangle_arrays(t), t.classes, lcap)
        ltris[i] = p
        lcls[i] = pc
        lgrids2.append(RasterGrid.fixed_tile(
            (g.box.x_min, g.box.y_min, g.box.x_max, g.box.y_max),
            128, font.info.units_per_em, 128))
    lb_args = (
        jnp.asarray(ltris), jnp.asarray(lcls),
        jnp.asarray(np.array([g.min_x for g in lgrids2], np.int32)),
        jnp.asarray(np.array([g.max_y for g in lgrids2], np.int32)),
        jnp.float32(lgrids2[0].scale),
    )
    lb_dev = loopblinn_pallas_batch(
        *lb_args, height=128, width=128, interpret=backend != "tpu")
    lb_ref = loopblinn_batch(*lb_args, height=128, width=128)
    m = _device_mismatch(lb_dev, np.asarray(lb_ref))
    results["loopblinn128"] = {
        "checked": int(np.prod(lb_dev.shape)), "mismatch_canonical": m,
        "glyphs": len(pairs),
    }
    total_checked += int(np.prod(lb_dev.shape))
    total_mismatch += m
    log(f"  loopblinn128: {m}/{int(np.prod(lb_dev.shape))} "
        f"({len(pairs)} triangulated glyphs)")

    # ---- 9. outline (stroke) mode — the SDF-derived coverage -------------
    # outline coverage = clamp(stroke/2 + 0.5 - |d|, 0, 1) is 1-Lipschitz
    # in d (cli/main.py outline mode), so the SDF tolerance transfers:
    # gate at the same u8 quantization step against the closed-form twin
    log("gate 9: outline/stroke mode (SDF-derived coverage)")
    half = np.float32(2.0 / 2.0)  # CLI default --stroke 2.0
    ocov_dev = jnp.clip(half + 0.5 - jnp.abs(sdf_dev), 0.0, 1.0)
    ocov_ref = jnp.clip(half + 0.5 - jnp.abs(sdf_ref), 0.0, 1.0)
    d = jnp.abs(ocov_dev - ocov_ref)
    m = int(jnp.sum(d > quant))
    results["outline32"] = {
        "checked": int(np.prod(ocov_dev.shape)),
        "mismatch_canonical": m,
        "tolerance": round(quant, 4),
        "max_dev": round(float(jnp.max(d)), 4),
    }
    total_checked += int(np.prod(ocov_dev.shape))
    total_mismatch += m
    log(f"  outline32: {m}/{int(np.prod(ocov_dev.shape))} beyond "
        f"{quant:.4f} (max dev {float(jnp.max(d)):.4f})")

    # ---- 10. color composite fold (COLR src-over) ------------------------
    # device color tiles vs a NumPy src-over oracle over the
    # gate-canonical oracle coverage: premultiplied dst = dst*(1-a)+src
    # per layer, bottom-to-top (engine/colorglyphs.py)
    log("gate 10: COLR v0 color composite fold vs numpy src-over oracle")
    from fontrx.engine.colorglyphs import color_glyph_tiles
    from fontrx.font.font import Font as _Font

    cfont = _Font.open("tests/data/colrtest.ttf")
    cgids = [cfont.glyph_index(c) for c in "AB"]
    ctiles, cgrids = color_glyph_tiles(
        cfont, cgids, 64, engine, samples=2)
    exp_tiles = np.zeros((len(cgids), 64, 64, 4), np.float32)
    cupem = cfont.info.units_per_em
    for i, gid in enumerate(cgids):
        tree = cfont.color_paint_tree(gid, 0, (0, 0, 0, 255))
        assert tree is not None and tree[0] == "layers", tree
        layers = tree[1]
        boxes = []
        lglyphs = []
        for node in layers:
            assert node[0] == "glyph" and node[2][0] == "solid", node
            lg = cfont.load_glyph_safe(node[1])
            lglyphs.append((lg, node[2][1]))
            boxes.append(lg.box)
        union = (
            min(bx.x_min for bx in boxes), min(bx.y_min for bx in boxes),
            max(bx.x_max for bx in boxes), max(bx.y_max for bx in boxes))
        cgrid = RasterGrid.fixed_tile(union, 64, cupem, 64)
        assert (cgrid.min_x, cgrid.max_y) == (
            cgrids[i].min_x, cgrids[i].max_y), (cgrid, cgrids[i])
        dst = np.zeros((64, 64, 4), np.float32)
        from fontrx.pack.segments import glyph_segments as _gseg

        for lg, (r8, g8, b8, a8) in lglyphs:
            cov = np.zeros((64, 64), np.float32)
            for ox, oy in sample_offsets(2):
                xs, ys = _offset_coords(cgrid, ox, oy)
                w = oracle.winding_at(
                    _gseg(lg), xs[None, :], ys[:, None],
                    contract=canonical_contract)
                cov += (w != 0).astype(np.float32)
            cov /= 4.0
            # mirror the device ops exactly: av = cov * f32(a/255)
            # (weak-typed python-float constant rounds to f32), rgb =
            # f32(c)/f32(255) (an f32 division in _eval_node)
            a = cov * np.float32(a8 / 255.0)
            c255 = np.float32(255.0)
            src = np.stack([
                (np.float32(r8) / c255) * a, (np.float32(g8) / c255) * a,
                (np.float32(b8) / c255) * a, a], axis=-1)
            dst = dst * (np.float32(1.0) - a[..., None]) + src
        exp_tiles[i] = dst
    m = _device_mismatch(ctiles, exp_tiles)
    results["color64"] = {
        "checked": int(exp_tiles.size), "mismatch_canonical": m,
    }
    total_checked += int(exp_tiles.size)
    total_mismatch += m
    log(f"  color64: {m}/{exp_tiles.size}")

    # ---- 10b. COLR v1 gradient paints -------------------------------------
    # device tiles (linear/radial gradient fields through div_cr/sqrt_cr
    # + Porter-Duff composite) vs a NumPy mirror of the same formulas
    # over the oracle coverage.  Gated at 2/255 (coverage and folds are
    # exact; the residual is jnp.interp's internal arithmetic vs
    # np.interp, ~ulps).  Sweep paints (arctan2: documented hardware
    # libm) are excluded.
    log("gate 10b: COLR v1 gradients (linear/radial/composite) vs "
        "numpy field oracle")
    from fontrx.font.glyph import transform_glyph as _tg

    def _np_extend(t, s0, s1, extend):
        span = s1 - s0
        if span <= 0:
            return np.full_like(t, s0)
        if extend == 1:
            return s0 + np.mod(t - s0, span)
        if extend == 2:
            mm = np.mod(t - s0, 2.0 * span)
            return s0 + np.where(mm > span, 2.0 * span - mm, mm)
        return np.clip(t, s0, s1)

    def _np_field(paint, grid, tile):
        kind, geom, extend, stops = paint
        c = np.arange(tile, dtype=np.float32)
        ex = ((grid.min_x + c[None, :]) / grid.scale).astype(np.float32)
        ey = ((grid.max_y - c[:, None]) / grid.scale).astype(np.float32)
        ex = np.broadcast_to(ex, (tile, tile)).astype(np.float32)
        ey = np.broadcast_to(ey, (tile, tile)).astype(np.float32)
        if kind == "linear":
            x0, y0, x1, y1, x2, y2 = (float(v) for v in geom)
            dx, dy = x1 - x0, y1 - y0
            rx, ry = x2 - x0, y2 - y0
            rr = rx * rx + ry * ry
            if rr > 0.0:
                k = (dx * rx + dy * ry) / rr
                dx, dy = dx - k * rx, dy - k * ry
            dd = dx * dx + dy * dy
            if dd <= 0.0:
                return np.zeros((tile, tile, 4), np.float32)
            t = ((ex - x0) * np.float32(dx)
                 + (ey - y0) * np.float32(dy)) / np.float32(dd)
            valid = np.ones((tile, tile), bool)
        else:
            assert kind == "radial", kind
            x0, y0, r0, x1, y1, r1 = (float(v) for v in geom)
            cdx, cdy = x1 - x0, y1 - y0
            dr = r1 - r0
            pdx, pdy = ex - np.float32(x0), ey - np.float32(y0)
            a = np.float32(cdx * cdx + cdy * cdy - dr * dr)
            bq = (pdx * np.float32(cdx) + pdy * np.float32(cdy)
                  + np.float32(r0 * dr))
            cc = pdx * pdx + pdy * pdy - np.float32(r0 * r0)
            if abs(float(a)) < 1e-9:
                safe_b = np.where(bq == 0, np.float32(1.0), bq)
                t = cc / (np.float32(2.0) * safe_b)
                valid = (bq != 0) & (r0 + t * dr >= 0)
            else:
                disc = bq * bq - a * cc
                sq = np.sqrt(np.maximum(disc, 0.0))
                t1 = (bq + sq) / a
                t2 = (bq - sq) / a
                hi = np.maximum(t1, t2)
                lo = np.minimum(t1, t2)
                use_hi = r0 + hi * dr >= 0
                t = np.where(use_hi, hi, lo)
                valid = (disc >= 0) & (r0 + t * dr >= 0)
        s0 = float(stops[0][0])
        s1 = float(stops[-1][0])
        tt = _np_extend(t, s0, s1, extend)
        xs2 = np.asarray([o for o, _ in stops], np.float32)
        cols = np.asarray([cv for _, cv in stops],
                          np.float32) / np.float32(255.0)
        flat = tt.reshape(-1)
        rgba = np.stack(
            [np.interp(flat, xs2, cols[:, k]) for k in range(4)],
            axis=-1).astype(np.float32).reshape(tile, tile, 4)
        return np.where(valid[..., None], rgba, np.float32(0.0))

    _PD = {
        0: lambda sa, ba: (0.0, 0.0), 1: lambda sa, ba: (1.0, 0.0),
        2: lambda sa, ba: (0.0, 1.0), 3: lambda sa, ba: (1.0, 1.0 - sa),
        4: lambda sa, ba: (1.0 - ba, 1.0), 5: lambda sa, ba: (ba, 0.0),
        6: lambda sa, ba: (0.0, sa), 7: lambda sa, ba: (1.0 - ba, 0.0),
        8: lambda sa, ba: (0.0, 1.0 - sa), 9: lambda sa, ba: (ba, 1.0 - sa),
        10: lambda sa, ba: (1.0 - ba, sa),
        11: lambda sa, ba: (1.0 - ba, 1.0 - sa),
        12: lambda sa, ba: (1.0, 1.0),
    }

    vfont = _Font.open("tests/data/colrv1test.ttf")
    vupem = vfont.info.units_per_em

    def _np_cov(lg, grid):
        cov = np.zeros((64, 64), np.float32)
        for ox, oy in sample_offsets(2):
            xs2, ys2 = _offset_coords(grid, ox, oy)
            w = oracle.winding_at(
                _gseg(lg), xs2[None, :], ys2[:, None],
                contract=canonical_contract)
            cov += (w != 0).astype(np.float32)
        return cov / 4.0

    def _np_node(node, grid):
        if node[0] == "glyph":
            _, gid_or_g, paint, xf = node
            lg = vfont.load_glyph_safe(gid_or_g)
            if xf is not None:
                lg = _tg(lg, xf)
            cov = _np_cov(lg, grid)
            if paint[0] == "solid":
                r8, g8, b8, a8 = paint[1]
                av = cov[..., None] * np.float32(a8 / 255.0)
                rgb = (np.asarray((r8, g8, b8), np.float32)
                       / np.float32(255.0))[None, None]
                return np.concatenate([rgb * av, av], axis=-1)
            field = _np_field(paint, grid, 64)
            av = cov[..., None] * field[..., 3:]
            return np.concatenate([field[..., :3] * av, av], axis=-1)
        if node[0] == "layers":
            acc = np.zeros((64, 64, 4), np.float32)
            for k in node[1]:
                src = _np_node(k, grid)
                acc = acc * (np.float32(1.0) - src[..., 3:]) + src
            return acc
        assert node[0] == "composite" and node[1] <= 12, node[:2]
        _, mode, sn, bn = node
        src = _np_node(sn, grid)
        bdp = _np_node(bn, grid)
        fa, fb = _PD[mode](src[..., 3:], bdp[..., 3:])
        return np.clip(src * fa + bdp * fb, 0.0, 1.0).astype(np.float32)

    def _leaf_boxes(node, acc):
        if node[0] == "glyph":
            lg = vfont.load_glyph_safe(node[1])
            if node[3] is not None:
                lg = _tg(lg, node[3])
            acc.append(lg.box)
        elif node[0] == "layers":
            for k in node[1]:
                _leaf_boxes(k, acc)
        elif node[0] == "composite":
            _leaf_boxes(node[2], acc)
            _leaf_boxes(node[3], acc)

    vgids = [vfont.glyph_index(c) for c in "CDEH"]  # linear/radial/
    # transformed-linear/composite; G (sweep) excluded: arctan2
    vtiles, vgrids = color_glyph_tiles(vfont, vgids, 64, engine,
                                       samples=2)
    vexp = np.zeros((len(vgids), 64, 64, 4), np.float32)
    for i, gid in enumerate(vgids):
        tree = vfont.color_paint_tree(gid, 0, (0, 0, 0, 255))
        clip = None
        if vfont.colr is not None and hasattr(vfont.colr, "clip_box"):
            clip = vfont.colr.clip_box(gid)
        if clip is not None:
            union = clip
        else:
            bxs: list = []
            _leaf_boxes(tree, bxs)
            union = (min(b.x_min for b in bxs), min(b.y_min for b in bxs),
                     max(b.x_max for b in bxs), max(b.y_max for b in bxs))
        vgrid = RasterGrid.fixed_tile(union, 64, vupem, 64)
        assert (vgrid.min_x, vgrid.max_y) == (
            vgrids[i].min_x, vgrids[i].max_y), (vgrid, vgrids[i])
        vexp[i] = _np_node(tree, vgrid)
    vtol = 2.0 / 255.0
    dv = jnp.abs(vtiles - jax.device_put(jnp.asarray(vexp)))
    mv = int(jnp.sum(dv > vtol))
    results["colorv164"] = {
        "checked": int(vexp.size), "mismatch_canonical": mv,
        "tolerance": round(vtol, 5),
        "max_dev": round(float(jnp.max(dv)), 5),
    }
    total_checked += int(vexp.size)
    total_mismatch += mv
    log(f"  colorv164: {mv}/{vexp.size} beyond {vtol:.5f} "
        f"(max dev {float(jnp.max(dv)):.5f})")

    # ---- 11. hinted fill at one ppem --------------------------------------
    # grid-fitted 26.6 outlines (fontrx.font.hinting, FreeType-pinned)
    # with the CLI's half-pixel center shift, rastered at scale 1/64
    # (cli/main.py _render_hinted) — bit-gated vs the oracle on the
    # same hinted segments
    log("gate 11: hinted fill @16ppem (grid-fitted 26.6 outlines)")
    from fontrx.font.glyph import Contour as _Contour, Glyph as _Glyph

    ppem = 16
    hglyphs = []
    for c in ASCII[:48]:
        gid = font.charmap.glyph_index(c)
        hg, _adv = font.hinted_glyph(gid, ppem)
        if hg.num_segments:
            hglyphs.append(_Glyph(hg.box, tuple(
                _Contour(k.points + np.array([-32, 32], k.points.dtype))
                for k in hg.contours)))
    hbatch = pack_glyphs(hglyphs)
    hgrids = [
        RasterGrid.fixed_tile(tuple(bx), 1, 64, 32)
        for bx in np.asarray(hbatch.boxes)
    ]
    hseg = jnp.asarray(hbatch.segments)
    hmx = jnp.asarray(np.array([g.min_x for g in hgrids], np.int32))
    hmy = jnp.asarray(np.array([g.max_y for g in hgrids], np.int32))
    out_h = engine.winding_batch(
        hseg, hmx, hmy, float(hgrids[0].scale), height=32, width=32,
    )
    gate("hinted16", out_h, hgrids, hbatch)

    results["total_checked"] = total_checked
    results["total_mismatch_canonical"] = total_mismatch
    return results


def main() -> int:
    res = run_full_gate()
    print(json.dumps(res))
    return 0 if res["total_mismatch_canonical"] == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
