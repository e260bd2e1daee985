"""Probe: banded column-major kernel (full lane occupancy) vs the
single-band dense kernel and the old row-major banded kernel, on the
full-font cap-64 bucket and the CJK batch."""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

from benchmarks.cjk import UPEM, _chained_timer, make_batch  # noqa: E402
from benchmarks.harness import DEJAVU, setup_cache  # noqa: E402

setup_cache()

import jax.numpy as jnp  # noqa: E402

from fontrx.engine.raster import RasterEngine  # noqa: E402
from fontrx.font.font import Font  # noqa: E402

font = Font.open(DEJAVU)
glyphs = []
for gid in range(font.num_glyphs):
    g = font.load_glyph_safe(gid)
    if 0 < g.num_segments <= 64:
        glyphs.append(g)
engine = RasterEngine()

for tile in (64, 32):
    # engine banded path (NOW the banded dense kernel)
    out, grids = engine.winding_packed_banded(
        glyphs, tile, font.info.units_per_em, tile)
    # reference: per-glyph engine path (single-band dense) — bit-compare
    from fontrx.kernels.grid import RasterGrid
    from fontrx.pack.segments import pack_glyphs

    batch = pack_glyphs(glyphs, capacity=64, sort="x")
    mx = jnp.asarray(np.array([g.min_x for g in grids], np.int32))
    my0 = np.array([g.max_y for g in grids], np.int32)
    scale = np.float32(grids[0].scale)
    ref = engine.winding_batch(
        jnp.asarray(batch.segments), mx, jnp.asarray(my0), scale,
        height=tile, width=tile)
    mism = int(jnp.sum(out != ref))
    d_var = jnp.stack([jnp.asarray(my0 + i) for i in range(4)])

    def banded_fn(my):
        # vary anchors through the banded path: rebuild is host-side,
        # so time the kernel directly through the engine entry
        o, _ = engine.winding_packed_banded(
            glyphs, tile, font.info.units_per_em, tile)
        return o

    # time the banded kernel via a direct chained call (host repack
    # excluded): reuse the engine's internals through one warm call
    import fontrx.engine.raster as R

    dt_single = _chained_timer(
        lambda my: engine.winding_batch(
            jnp.asarray(batch.segments), mx, my, scale,
            height=tile, width=tile),
        d_var, n_iter=8, repeats=4)
    print(json.dumps({
        "tile": tile, "glyphs": len(glyphs), "mismatch": mism,
        "single_band_ms": round(dt_single * 1e3, 2),
    }), flush=True)

print("PART2", flush=True)

# direct banded-kernel timing (kernel only, prepacked)
from fontrx.kernels.grid import RasterGrid  # noqa: E402
from fontrx.kernels.winding_dense import (  # noqa: E402
    winding_dense_banded_batch,
)
from fontrx.kernels.winding_pallas_v2 import (  # noqa: E402
    winding_pallas_banded_batch,
)
from fontrx.pack.segments import glyph_segments, xsort_segments  # noqa: E402

for tile in (64, 32):
    bands = 128 // tile
    grids = [
        RasterGrid.fixed_tile(
            (g.box.x_min, g.box.y_min, g.box.x_max, g.box.y_max),
            tile, font.info.units_per_em, tile)
        for g in glyphs
    ]
    n = len(glyphs)
    b = (n + bands - 1) // bands
    seg_arrays = [xsort_segments(glyph_segments(g)) for g in glyphs]
    elem_counts = [
        sum(len(seg_arrays[e * bands + k])
            for k in range(bands) if e * bands + k < n)
        for e in range(b)
    ]
    cap = max(8, ((max(elem_counts) + 7) // 8) * 8)
    segments = np.zeros((b, cap, 3, 2), np.float32)
    owners = np.zeros((b, cap), np.int32)
    min_x = np.zeros((bands, b), np.int32)
    max_y = np.zeros((bands, b), np.int32)
    for gi, (seg, grid) in enumerate(zip(seg_arrays, grids)):
        e, k = divmod(gi, bands)
        start = sum(len(seg_arrays[e * bands + j]) for j in range(k)
                    if e * bands + j < n)
        segments[e, start:start + len(seg)] = seg
        owners[e, start:start + len(seg)] = k
        min_x[k, e] = grid.min_x
        max_y[k, e] = grid.max_y
    d_seg = jnp.asarray(segments)
    d_own = jnp.asarray(owners)
    d_mx = jnp.asarray(min_x)
    my0 = max_y.copy()
    scale = np.float32(grids[0].scale)
    d_var = jnp.stack([jnp.asarray(my0 + i) for i in range(4)])

    def fn_dense(my):
        return winding_dense_banded_batch(
            d_seg, d_own, d_mx, my, jnp.float32(scale),
            width=tile, row_bands=bands, exact=True)

    def fn_rowmajor(my):
        return winding_pallas_banded_batch(
            d_seg, d_own, d_mx, my, jnp.float32(scale),
            width=128, row_bands=bands, exact=True)

    a = fn_dense(d_var[0])
    r = fn_rowmajor(d_var[0])
    mism = int(jnp.sum(a[:, :, :tile] != r[:, :, :tile]))
    dt_d = _chained_timer(fn_dense, d_var, n_iter=8, repeats=4)
    dt_r = _chained_timer(fn_rowmajor, d_var, n_iter=8, repeats=4)
    print(json.dumps({
        "tile": tile, "elements": b, "mismatch_vs_rowmajor": mism,
        "banded_dense_ms": round(dt_d * 1e3, 2),
        "banded_rowmajor_ms": round(dt_r * 1e3, 2),
    }), flush=True)
print("DONE", flush=True)
