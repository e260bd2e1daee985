"""Probe: MSAA coverage strategies on a small-tile ATLAS batch —
fused kernel vs v2 multipass vs dense-kernel multipass."""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

from benchmarks.cjk import _chained_timer  # noqa: E402
from benchmarks.harness import DEJAVU, setup_cache  # noqa: E402

setup_cache()

import jax.numpy as jnp  # noqa: E402

from fontrx.font.font import Font  # noqa: E402
from fontrx.kernels.coverage import (  # noqa: E402
    coverage_batch_dense,
    coverage_batch_v2,
)
from fontrx.kernels.coverage_pallas import coverage_pallas_batch  # noqa: E402
from fontrx.kernels.grid import RasterGrid  # noqa: E402
from fontrx.pack.segments import pack_glyphs  # noqa: E402

font = Font.open(DEJAVU)
glyphs = []
for gid in range(font.num_glyphs):
    g = font.load_glyph_safe(gid)
    if 0 < g.num_segments <= 64:
        glyphs.append(g)
glyphs = glyphs[:1000]
batch = pack_glyphs(glyphs, capacity=64, sort="x")

for tile in (64, 32):
    grids = [
        RasterGrid.fixed_tile(tuple(b), float(tile),
                              font.info.units_per_em, tile)
        for b in np.asarray(batch.boxes)
    ]
    mx = jnp.asarray(np.array([g.min_x for g in grids], np.int32))
    my0 = np.array([g.max_y for g in grids], np.int32)
    scale = np.float32(grids[0].scale)
    d_seg = jnp.asarray(batch.segments)
    d_var = jnp.stack([jnp.asarray(my0 + i) for i in range(4)])
    h128 = 128

    def f_fused(my):
        return coverage_pallas_batch(
            d_seg, mx, my, jnp.float32(scale), height=h128, width=128,
            samples=2, exact=True)

    def f_v2(my):
        return coverage_batch_v2(
            d_seg, mx, my, jnp.float32(scale), height=h128, width=128,
            samples=2, exact=True)

    def f_dense(my):
        return coverage_batch_dense(
            d_seg, mx, my, jnp.float32(scale), height=tile, width=tile,
            samples=2, exact=True)

    a = f_fused(d_var[0])[:, :tile, :tile]
    d = f_dense(d_var[0])[:, :tile, :tile]
    mism = int(jnp.sum(a != d))
    r = {"tile": tile, "mismatch": mism}
    for name, fn in (("fused", f_fused), ("v2mp", f_v2),
                     ("dense_mp", f_dense)):
        r[name + "_ms"] = round(
            _chained_timer(fn, d_var, n_iter=6, repeats=4) * 1e3, 2)
    print(json.dumps(r), flush=True)
print("DONE", flush=True)
