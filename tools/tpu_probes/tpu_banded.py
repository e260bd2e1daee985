"""Full-font atlas: row-banded strips vs per-glyph bucketed packing.

The per-glyph kernel pays a full 128-row strip per glyph, so a 64px
tile wastes half its rows and a 32px tile three quarters.  The banded
kernel packs 128/tile glyphs per strip with per-band anchors.  Times
both on the whole DejaVuSans (6,190 glyphs) with the chained protocol,
and checks a device-side bit-compare between the two paths.
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
from fontrx.pack.segments import glyph_segments

DEJAVU = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"


def build_banded(glyphs, grids, bands):
    n = len(glyphs)
    b = (n + bands - 1) // bands
    seg_arrays = [glyph_segments(g) for g in glyphs]
    elem_counts = [
        sum(len(seg_arrays[e * bands + k]) for k in range(bands)
            if e * bands + k < n)
        for e in range(b)
    ]
    cap = max(8, ((max(elem_counts) + 7) // 8) * 8)
    segments = np.zeros((b, cap, 3, 2), np.float32)
    owners = np.zeros((b, cap), np.int32)
    min_x = np.zeros((bands, b), np.int32)
    max_y = np.zeros((bands, b), np.int32)
    for gi, (seg, grid) in enumerate(zip(seg_arrays, grids)):
        e, k = divmod(gi, bands)
        start = sum(len(seg_arrays[e * bands + j]) for j in range(k))
        segments[e, start : start + len(seg)] = seg
        owners[e, start : start + len(seg)] = k
        min_x[k, e] = grid.min_x
        max_y[k, e] = grid.max_y
    return segments, owners, min_x, max_y, cap


def main():
    font = Font.open(DEJAVU)
    # banding composes with capacity bucketing (one giant glyph must
    # not set the shared chunk count): measure the dominant bucket —
    # glyphs with <= 64 segments (6,022 of DejaVu's 6,190)
    glyphs = []
    for idx in range(font.num_glyphs):
        g = font.load_glyph_safe(idx)
        if g.num_segments <= 64:
            glyphs.append(g)
    counter = [int(time.time()) % 100000]

    def chained(fn, var_stack, n=12, repeats=4):
        @partial(jax.jit, static_argnames="n")
        def chain(seed, n):
            def body(i, dep):
                bump = (jnp.abs(dep) >> 30)
                out = fn(var_stack[i % 4] + bump)
                return out[0, 0, 0] + dep % 1009
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

    for tile in (64, 32):
        bands = 128 // tile
        grids = [
            RasterGrid.fixed_tile(
                (g.box.x_min, g.box.y_min, g.box.x_max, g.box.y_max),
                tile, font.info.units_per_em, tile,
            )
            for g in glyphs
        ]
        segs, owners, mx, my, cap = build_banded(glyphs, grids, bands)
        d = (jnp.asarray(segs), jnp.asarray(owners), jnp.asarray(mx),
             jnp.asarray(my))
        scale = jnp.float32(grids[0].scale)
        var_stack = jnp.stack([jnp.asarray(mx + i) for i in range(4)])

        def banded(mxv, d=d, scale=scale, bands=bands):
            return winding_pallas_banded_batch(
                d[0], d[1], mxv, d[3], scale, width=128,
                row_bands=bands, exact=True,
            )

        dt = chained(banded, var_stack)
        n = len(glyphs)
        print(f"banded x{bands} @{tile}px: {dt*1e3:8.2f} ms "
              f"({n/dt:9.0f} glyphs/s, elem cap={cap})", flush=True)

        # spot bit-compare vs the per-glyph engine path (first 256 glyphs)
        eng = RasterEngine()
        from fontrx.pack.segments import pack_glyphs

        sub = glyphs[:256]
        ref, _ = eng.winding_packed(
            pack_glyphs(sub), tile, font.info.units_per_em, tile
        )
        out = banded(d[2])
        b_sub = (256 + bands - 1) // bands
        per_glyph = out[:b_sub].reshape(b_sub * bands, tile, 128)[
            :256, :, :tile
        ]
        mism = int(jnp.sum(per_glyph != ref))
        print(f"  bit-compare vs per-glyph path (256 glyphs): {mism}",
              flush=True)


if __name__ == "__main__":
    main()
