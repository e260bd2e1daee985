"""Full-font atlas @64px: bucketed vs hybrid-split vs hybrid-banded.

The tail-bucket economics question (docs/ROADMAP.md perf 2): capacity
bucketing pays one launch per bucket + capacity padding on merged
tails; hybrid split packing rasters every cap-64 row in ONE launch and
folds multi-row glyphs with dense per-row-count reshape sums (no
scatter).  The banded variant additionally pairs rows into 2-band
128-row strip elements (the 64px strip-padding fix).  All three are
bit-identical per glyph (device-checked here before timing).

Chained-unique-seed protocol; every step consumes one element per
glyph (sub-launch DCE rule).
"""

import sys

sys.path.insert(0, "/root/repo")

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from fontrx.engine.raster import RasterEngine
from fontrx.font.font import Font
from fontrx.kernels.grid import RasterGrid
from fontrx.kernels.winding_pallas_v2 import (
    winding_pallas_banded_batch,
    winding_pallas_v2_batch,
)
from fontrx.pack.segments import pack_glyphs_bucketed, pack_glyphs_hybrid

FONT = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"
SIZE = 64
TILE = 64
KW = dict(guard=True, group_guard=8, seg_chunk=32)


def main():
    font = Font.open(FONT)
    upem = font.info.units_per_em
    glyphs = [font.load_glyph_safe(i) for i in range(font.num_glyphs)]
    n_glyphs = len(glyphs)
    print(f"{n_glyphs} glyphs", flush=True)

    # --- bucketed (current default) --------------------------------------
    buckets = pack_glyphs_bucketed(glyphs)
    bucket_dev = []
    for batch, idxs in buckets:
        grids = [
            RasterGrid.fixed_tile(tuple(b), SIZE, upem, TILE)
            for b in np.asarray(batch.boxes)
        ]
        bucket_dev.append((
            jnp.asarray(batch.segments),
            jnp.asarray(np.array([g.min_x for g in grids], np.int32)),
            jnp.asarray(np.array([g.max_y for g in grids], np.int32)),
            jnp.float32(grids[0].scale),
        ))
        print(f"  bucket cap={batch.capacity} n={len(batch)}", flush=True)

    # --- hybrid ------------------------------------------------------------
    hb = pack_glyphs_hybrid(glyphs, capacity=64)
    print(f"  hybrid rows={len(hb)} groups={hb.groups}", flush=True)
    h_grids = [
        RasterGrid.fixed_tile(tuple(b), SIZE, upem, TILE)
        for b in np.asarray(hb.boxes)
    ]
    h_segs = jnp.asarray(hb.segments)
    h_mx = jnp.asarray(np.array([g.min_x for g in h_grids], np.int32))
    h_my = jnp.asarray(np.array([g.max_y for g in h_grids], np.int32))
    scale = jnp.float32(h_grids[0].scale)
    groups = hb.groups

    def fold(rows):
        parts = []
        row = 0
        for r, n in groups:
            block = rows[row : row + r * n]
            parts.append(
                block if r == 1 else block.reshape(n, r, TILE, TILE).sum(axis=1)
            )
            row += r * n
        return jnp.concatenate(parts)

    def hybrid_flat(mx):
        rows = winding_pallas_v2_batch(
            h_segs, mx, h_my, scale, height=128, width=128, exact=True, **KW,
        )[:, :TILE, :TILE]
        return fold(rows)

    # --- hybrid banded x2 ---------------------------------------------------
    R = len(hb)
    E = (R + 1) // 2
    cap = hb.capacity
    b_segs = np.zeros((E, 2 * cap, 3, 2), np.float32)
    b_owner = np.zeros((E, 2 * cap), np.int32)
    b_mx = np.zeros((2, E), np.int32)
    b_my = np.zeros((2, E), np.int32)
    for row in range(R):
        e, k = divmod(row, 2)
        b_segs[e, k * cap : (k + 1) * cap] = hb.segments[row]
        b_owner[e, k * cap : (k + 1) * cap] = k
        b_mx[k, e] = h_grids[row].min_x
        b_my[k, e] = h_grids[row].max_y
    d_bsegs = jnp.asarray(b_segs)
    d_bowner = jnp.asarray(b_owner)
    d_bmx = jnp.asarray(b_mx)
    d_bmy = jnp.asarray(b_my)

    def hybrid_banded(bump):
        out = winding_pallas_banded_batch(
            d_bsegs, d_bowner, d_bmx + bump, d_bmy, scale,
            width=128, row_bands=2, exact=True, **KW,
        )  # [E, 128, 128]
        rows = out.reshape(E * 2, TILE, 128)[:R, :, :TILE]
        return fold(rows)

    # --- exactness cross-check (device) ------------------------------------
    ref_parts = []
    for segs, mx, my, sc in bucket_dev:
        ref_parts.append(winding_pallas_v2_batch(
            segs, mx, my, sc, height=128, width=128, exact=True, **KW,
        )[:, :TILE, :TILE])
    order_of = np.concatenate([idxs for _, idxs in buckets])
    inv = np.empty(n_glyphs, np.int64)
    inv[order_of] = np.arange(n_glyphs)
    ref = jnp.concatenate(ref_parts)[jnp.asarray(inv)]       # glyph order
    hyb = hybrid_flat(h_mx)[jnp.asarray(np.argsort(hb.order))]
    ban = hybrid_banded(jnp.int32(0))[jnp.asarray(np.argsort(hb.order))]
    print("hybrid-vs-bucketed mismatch:", int(jnp.sum(ref != hyb)), flush=True)
    print("banded-vs-bucketed mismatch:", int(jnp.sum(ref != ban)), flush=True)

    # --- timing -------------------------------------------------------------
    counter = [int(time.time()) % 100000]

    def timed(step_fn, n=20, repeats=5):
        @partial(jax.jit, static_argnames="n")
        def chain(seed, n):
            def body(i, dep):
                bump = (jnp.abs(dep) >> 30)
                out = step_fn(bump + (i % 4))
                return jnp.sum(out[:, 0, 0]) + dep % 1009
            return jax.lax.fori_loop(0, n, body, seed)

        def run(k):
            counter[0] += 1
            t0 = time.perf_counter()
            float(chain(jnp.int32(counter[0] << 8), k))
            return time.perf_counter() - t0

        run(1), run(n)
        rtt = min(run(1) for _ in range(repeats))
        tot = min(run(n) for _ in range(repeats))
        return max(tot - rtt, 1e-9) / (n - 1)

    def bucketed_step(bump):
        outs = []
        for segs, mx, my, sc in bucket_dev:
            outs.append(winding_pallas_v2_batch(
                segs, mx + bump, my, sc, height=128, width=128,
                exact=True, **KW,
            )[:, :1, :1])
        return jnp.concatenate(outs)

    for name, fn in (
        ("bucketed", bucketed_step),
        ("hybrid flat", lambda bump: hybrid_flat(h_mx + bump)),
        ("hybrid banded", hybrid_banded),
    ):
        dt = timed(fn)
        print(f"{name:14s} {dt*1e3:8.2f} ms -> {n_glyphs/dt:9.0f} glyphs/s",
              flush=True)


if __name__ == "__main__":
    main()
