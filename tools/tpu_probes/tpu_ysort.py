"""Does y-sorting each glyph's segments at pack time raise the
group-elision hit rate?

Group elision skips (8-segment group, strip, tile) units with no
in-strip crossing; contour order is only locally y-coherent, so
sorting segments by their y-span center should concentrate groups into
strips.  Winding is order-invariant (tested bit-exactly), so this is a
free packing-side change if it wins.
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


def ysort(segments: np.ndarray, counts: np.ndarray) -> np.ndarray:
    out = segments.copy()
    for i in range(len(segments)):
        n = int(counts[i])
        if n < 2:
            continue
        ymid = segments[i, :n, :, 1].min(axis=1) + segments[i, :n, :, 1].max(
            axis=1
        )
        order = np.argsort(ymid, kind="stable")
        out[i, :n] = segments[i, order]
    return out


def main():
    font = Font.open(FONT)
    batch = pack_charset(font, list(range(33, 127)))
    b = len(batch)
    grids = [
        RasterGrid.fixed_tile(tuple(bx), 256, font.info.units_per_em, 256)
        for bx in np.asarray(batch.boxes)
    ]
    min_x = np.array([g.min_x for g in grids], np.int32)
    d_var = jnp.stack([jnp.asarray(min_x + i) for i in range(4)])
    d_my = jnp.asarray(np.array([g.max_y for g in grids], np.int32))
    scale = jnp.float32(grids[0].scale)
    counter = [int(time.time()) % 100000]

    def timed(d_segs, kw, n=40, repeats=5):
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

    kw = dict(guard=True, group_guard=8, seg_chunk=32, tile_w=256)
    plain = jnp.asarray(batch.segments)
    sorted_ = jnp.asarray(ysort(batch.segments, batch.seg_counts))
    # bit-exactness first (device compare)
    a = winding_pallas_v2_batch(
        plain, d_var[0], d_my, scale, height=256, width=256, exact=True, **kw)
    bb = winding_pallas_v2_batch(
        sorted_, d_var[0], d_my, scale, height=256, width=256, exact=True, **kw)
    mism = int(jnp.sum(a != bb))
    print(f"sorted-vs-plain mismatch: {mism}", flush=True)
    for name, segs in (("contour order", plain), ("y-sorted", sorted_)):
        dt = timed(segs, kw)
        print(f"{name:16s} {dt*1e3:8.3f} ms/batch -> {b/dt:9.0f} glyphs/s",
              flush=True)
    # also at gg=4: finer groups may profit more from coherence
    for name, segs in (("y-sorted gg=4", sorted_),):
        dt = timed(segs, dict(kw, group_guard=4))
        print(f"{name:16s} {dt*1e3:8.3f} ms/batch -> {b/dt:9.0f} glyphs/s",
              flush=True)


if __name__ == "__main__":
    main()
