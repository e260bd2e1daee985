"""Probe: multi-strip column-major kernel vs the shipped v2 gg16 path
on the HEADLINE batch (94 ASCII @256px)."""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

from benchmarks.cjk import _chained_timer  # noqa: E402
from benchmarks.harness import DEJAVU, setup_cache  # noqa: E402

setup_cache()

import jax.numpy as jnp  # noqa: E402

from fontrx.engine.atlas import pack_charset  # noqa: E402
from fontrx.font.font import Font  # noqa: E402
from fontrx.kernels.grid import RasterGrid  # noqa: E402
from fontrx.kernels.winding_dense import winding_dense_batch  # noqa: E402
from fontrx.kernels.winding_pallas_v2 import (  # noqa: E402
    winding_pallas_v2_batch,
)
from fontrx.pack.segments import xsort_segments  # noqa: E402

font = Font.open(DEJAVU)
batch = pack_charset(font, list(range(33, 127)))
grids = [
    RasterGrid.fixed_tile(tuple(b), 256, font.info.units_per_em, 256)
    for b in np.asarray(batch.boxes)
]
mx = jnp.asarray(np.array([g.min_x for g in grids], np.int32))
my0 = np.array([g.max_y for g in grids], np.int32)
scale = np.float32(grids[0].scale)
d_var = jnp.stack([jnp.asarray(my0 + i) for i in range(4)])
d_y = jnp.asarray(batch.segments)
d_x = jnp.asarray(np.stack(
    [xsort_segments(s) for s in np.asarray(batch.segments)]))


def v2(my):
    return winding_pallas_v2_batch(
        d_y, mx, my, jnp.float32(scale), height=256, width=256,
        exact=True, guard=True, seg_chunk=32, tile_w=256,
        group_guard=16)


ref = v2(d_var[0])
r = {"v2_gg16_ms": round(_chained_timer(v2, d_var, n_iter=24,
                                        repeats=4) * 1e3, 3)}
for name, data, sc in (("dense_x_sc64", d_x, 64),
                       ("dense_y_sc64", d_y, 64),
                       ("dense_x_sc32", d_x, 32)):
    def fn(my, data=data, sc=sc):
        return winding_dense_batch(
            data, mx, my, jnp.float32(scale), height=256, width=256,
            exact=True, seg_chunk=sc)
    out = fn(d_var[0])
    mism = int(jnp.sum(out[:, :256] != ref))
    r[name + "_ms"] = round(
        _chained_timer(fn, d_var, n_iter=24, repeats=4) * 1e3, 3)
    r[name + "_mismatch"] = mism
print(json.dumps(r), flush=True)
print("DONE", flush=True)
