"""Probe: can the column-major dense kernel beat the banded v2 path on
the SPARSE full-font small-tile atlas (DejaVu cap-64 bucket @64px /
@32px)?  The dense kernel wastes half its row lanes on a 64px tile but
pays no per-segment broadcasts and culls crossing x-windows."""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

from benchmarks.cjk import _chained_timer  # noqa: E402
from benchmarks.harness import DEJAVU, setup_cache  # noqa: E402

setup_cache()

import jax.numpy as jnp  # noqa: E402

from fontrx.engine.raster import RasterEngine  # noqa: E402
from fontrx.font.font import Font  # noqa: E402
from fontrx.kernels.grid import RasterGrid  # noqa: E402
from fontrx.kernels.winding_dense import winding_dense_batch  # noqa: E402
from fontrx.pack.segments import pack_glyphs  # noqa: E402

font = Font.open(DEJAVU)
glyphs = []
for gid in range(font.num_glyphs):
    g = font.load_glyph_safe(gid)
    n = g.num_segments
    if 0 < n <= 64:
        glyphs.append(g)
print(f"cap-64 bucket: {len(glyphs)} glyphs", flush=True)

for tile in (64, 32):
    batch_y = pack_glyphs(glyphs, capacity=64, sort="y")
    batch_x = pack_glyphs(glyphs, capacity=64, sort="x")
    grids = [
        RasterGrid.fixed_tile(tuple(b), float(tile),
                              font.info.units_per_em, tile)
        for b in np.asarray(batch_y.boxes)
    ]
    mx = jnp.asarray(np.array([g.min_x for g in grids], np.int32))
    my0 = np.array([g.max_y for g in grids], np.int32)
    scale = np.float32(grids[0].scale)
    d_var = jnp.stack([jnp.asarray(my0 + i) for i in range(4)])
    engine = RasterEngine()

    def banded(my):
        # current shipped small-tile atlas path (row-banded strips)
        from fontrx.kernels.winding_pallas_v2 import (
            winding_pallas_banded_batch,
        )
        bands = 128 // tile
        b = len(glyphs)
        groups = (b + bands - 1) // bands
        # simple banded pack: consecutive glyphs share a strip
        segs = np.zeros((groups, 64 * bands, 3, 2), np.float32)
        owners = np.zeros((groups, 64 * bands), np.int32)
        bmx = np.zeros((bands, groups), np.int32)
        bmy = np.zeros((bands, groups), np.int32)
        for i in range(b):
            g_, k_ = divmod(i, bands)
            segs[g_, k_ * 64 : k_ * 64 + 64] = batch_y.segments[i]
            owners[g_, k_ * 64 : k_ * 64 + 64] = k_
            bmx[k_, g_] = int(np.asarray(mx)[i])
            bmy[k_, g_] = int(np.asarray(my)[i] if hasattr(my, "__len__")
                              else my0[i])
        return winding_pallas_banded_batch(
            jnp.asarray(segs), jnp.asarray(owners), jnp.asarray(bmx),
            jnp.asarray(bmy), jnp.float32(scale), width=128,
            row_bands=bands, exact=True,
        )

    def dense(my, data):
        return winding_dense_batch(
            data, mx, my, jnp.float32(scale), height=tile, width=tile,
            exact=True, seg_chunk=64,
        )

    d_segs_y = jnp.asarray(batch_y.segments)
    d_segs_x = jnp.asarray(batch_x.segments)

    # correctness: dense vs engine path (v2 gg16)
    ref = engine.winding_batch(
        d_segs_y, mx, jnp.asarray(my0), scale, height=tile, width=tile)
    out = dense(jnp.asarray(my0), d_segs_x)
    mism = int(jnp.sum(out[:, :tile, :tile] != ref))

    dt_engine = _chained_timer(
        lambda my: engine.winding_batch(
            d_segs_y, mx, my, scale, height=tile, width=tile),
        d_var, n_iter=8, repeats=4)
    dt_dense_x = _chained_timer(
        lambda my: dense(my, d_segs_x), d_var, n_iter=8, repeats=4)
    dt_dense_y = _chained_timer(
        lambda my: dense(my, d_segs_y), d_var, n_iter=8, repeats=4)
    print(json.dumps({
        "tile": tile, "glyphs": len(glyphs),
        "engine_v2_ms": round(dt_engine * 1e3, 2),
        "dense_xsort_ms": round(dt_dense_x * 1e3, 2),
        "dense_ysort_ms": round(dt_dense_y * 1e3, 2),
        "mismatch": mism,
    }), flush=True)

print("DONE", flush=True)
