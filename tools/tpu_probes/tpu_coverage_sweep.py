"""Crossover sweep: fused coverage kernel vs k^2-offset multipass-v2.

Times both MSAA strategies at 128-row strips across page widths with the
chained-unique-seed protocol (one dispatch, on-device fori_loop chain,
single scalar fetch; RTT measured by a 1-step chain and subtracted).
Informs RasterEngine.coverage_batch's fused/multipass heuristic.
"""

import sys
sys.path.insert(0, "/root/repo")

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from fontrx.font.font import Font
from fontrx.kernels.coverage import coverage_batch_v2
from fontrx.kernels.coverage_pallas import coverage_pallas_batch
from fontrx.kernels.grid import RasterGrid
from fontrx.pack.segments import pack_glyphs

FONT = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"


def main():
    font = Font.open(FONT)
    glyphs = [font.get_glyph(c)[0] for c in "HeloWrd!,"]
    batch = pack_glyphs(glyphs)
    b = len(batch)
    grids = [
        RasterGrid.fixed_tile(tuple(bx), 64, font.info.units_per_em, 64)
        for bx in np.asarray(batch.boxes)
    ]
    d_segs = jnp.asarray(batch.segments)
    min_x = np.array([g.min_x for g in grids], np.int32)
    d_var = jnp.stack([jnp.asarray(min_x + i) for i in range(4)])
    d_my = jnp.asarray(np.array([g.max_y for g in grids], np.int32))
    scale = jnp.float32(grids[0].scale)

    counter = [1000]

    def timed(fn, n=24):
        @partial(jax.jit, static_argnames="n")
        def chain(seed, n):
            def body(i, dep):
                bump = jax.lax.convert_element_type(
                    jnp.floor(jnp.abs(dep)), jnp.int32) >> 30
                c = fn(d_var[i % 4] + bump)
                return c[0, 0, 0] + jnp.float32(dep % 7.0)
            return jax.lax.fori_loop(0, n, body, jnp.float32(seed))

        def run(k):
            counter[0] += 1
            t0 = time.perf_counter()
            float(chain(counter[0], k))
            return time.perf_counter() - t0

        run(1), run(n)
        rtt = min(run(1) for _ in range(4))
        tot = min(run(n) for _ in range(4))
        return max(tot - rtt, 1e-9) / (n - 1)

    for width in (128, 256, 512, 1024, 2048):
        def fused(mx, width=width):
            return coverage_pallas_batch(
                d_segs, mx, d_my, scale, height=128, width=width,
                samples=2, exact=True)

        def multi(mx, width=width):
            return coverage_batch_v2(
                d_segs, mx, d_my, scale, height=128, width=width,
                samples=2, exact=True, guard=width > 512)

        tf = timed(fused)
        tm = timed(multi)
        px = b * 128 * width
        print(
            f"width={width:5d}  fused={tf*1e3:8.3f} ms ({px/tf/1e9:6.2f} Gpix/s)"
            f"  multipass={tm*1e3:8.3f} ms ({px/tm/1e9:6.2f} Gpix/s)"
            f"  winner={'fused' if tf < tm else 'multipass'}",
            flush=True,
        )


if __name__ == "__main__":
    main()
