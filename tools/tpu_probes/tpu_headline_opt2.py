"""Round-2 follow-up sweep around the headline winner
(guard=True, group_guard=8, seg_chunk=32 -> 82.8k g/s)."""

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
    batch = pack_charset(font, list(range(33, 127)))
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

    variants = [
        ("gg=8  sc=32 (prev winner)", dict(guard=True, group_guard=8, seg_chunk=32)),
        ("gg=4  sc=32", dict(guard=True, group_guard=4, seg_chunk=32)),
        ("gg=16 sc=32", dict(guard=True, group_guard=16, seg_chunk=32)),
        ("gg=8  sc=64", dict(guard=True, group_guard=8, seg_chunk=64)),
        ("gg=16 sc=64", dict(guard=True, group_guard=16, seg_chunk=64)),
        ("gg=8  sc=32 tw=256", dict(guard=True, group_guard=8, seg_chunk=32,
                                    tile_w=256)),
        ("gg=8  sc=64 tw=256", dict(guard=True, group_guard=8, seg_chunk=64,
                                    tile_w=256)),
        ("phaseA sc=32 (timing)", dict(guard=True, seg_chunk=32, _detail=False)),
        ("phaseA sc=64 (timing)", dict(guard=True, seg_chunk=64, _detail=False)),
    ]
    for name, kw in variants:
        try:
            dt = timed(kw)
            print(f"{name:28s} {dt*1e3:8.3f} ms/batch -> {b/dt:9.0f} glyphs/s",
                  flush=True)
        except Exception as e:
            print(f"{name:28s} FAILED: {type(e).__name__}: {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
