"""Post-y-sort kernel-knob re-sweep on the headline batch.

Y-sorted packing (now the pack-time default) tightens per-chunk hulls
and concentrates group activity, which may move the optimal
(seg_chunk, group_guard) point chosen by the pre-sort sweep
(tpu_headline_opt*: sc=32, gg=8, tw=256).  Chained-unique-seed
protocol, per-glyph consumption.
"""

import sys

sys.path.insert(0, "/root/repo")

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from fontrx.engine.atlas import pack_charset
from fontrx.font.font import Font
from fontrx.kernels.grid import RasterGrid
from fontrx.kernels.winding_pallas_v2 import winding_pallas_v2_batch

FONT = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"


def main():
    font = Font.open(FONT)
    batch = pack_charset(font, list(range(33, 127)))  # y-sorted now
    b = len(batch)
    grids = [
        RasterGrid.fixed_tile(tuple(bx), 256, font.info.units_per_em, 256)
        for bx in np.asarray(batch.boxes)
    ]
    d_segs = jnp.asarray(batch.segments)
    min_x = np.array([g.min_x for g in grids], np.int32)
    d_var = jnp.stack([jnp.asarray(min_x + i) for i in range(4)])
    d_my = jnp.asarray(np.array([g.max_y for g in grids], np.int32))
    scale = jnp.float32(grids[0].scale)
    counter = [int(time.time()) % 100000]

    def timed(kw, n=40, repeats=5):
        @partial(jax.jit, static_argnames="n")
        def chain(seed, n):
            def body(i, dep):
                bump = (jnp.abs(dep) >> 30)
                out = winding_pallas_v2_batch(
                    d_segs, d_var[i % 4] + bump, d_my, scale,
                    height=256, width=256, exact=True, **kw,
                )
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

    variants = [
        ("sc=32 gg=8  (default)", dict(seg_chunk=32, group_guard=8)),
        ("sc=64 gg=8 ", dict(seg_chunk=64, group_guard=8)),
        ("sc=64 gg=16", dict(seg_chunk=64, group_guard=16)),
        ("sc=32 gg=16", dict(seg_chunk=32, group_guard=16)),
        ("sc=64 gg=32", dict(seg_chunk=64, group_guard=32)),
    ]
    for name, kw in variants:
        dt = timed(dict(kw, guard=True, tile_w=256))
        print(f"{name} {dt*1e3:8.3f} ms/batch -> {b/dt:9.0f} glyphs/s",
              flush=True)


if __name__ == "__main__":
    main()
