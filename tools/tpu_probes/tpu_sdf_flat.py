"""A/B the SDF kernel's flat-pixel mode vs the padded tiled mode on the
config-4 workload (1000 DejaVu glyphs @32px and @64px).  Chained
unique-seed protocol, per-glyph consumption."""

import sys

sys.path.insert(0, "/root/repo")

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from fontrx.font.font import Font
from fontrx.kernels.grid import RasterGrid
from fontrx.kernels.sdf_pallas import sdf_pallas_batch
from fontrx.pack.segments import pack_glyphs

FONT = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"


def main():
    font = Font.open(FONT)
    glyphs = []
    idx = 1
    while len(glyphs) < 1000 and idx < font.num_glyphs:
        g = font.load_glyph_safe(idx)
        if g.num_segments:
            glyphs.append(g)
        idx += 1
    batch = pack_glyphs(glyphs)
    counter = [int(time.time()) % 100000]

    for size in (32, 64):
        grids = [
            RasterGrid.fixed_tile(tuple(b), size, font.info.units_per_em, size)
            for b in np.asarray(batch.boxes)
        ]
        d_segs = jnp.asarray(batch.segments)
        min_x = np.array([g.min_x for g in grids], np.int32)
        d_var = jnp.stack([jnp.asarray(min_x + i) for i in range(4)])
        d_my = jnp.asarray(np.array([g.max_y for g in grids], np.int32))
        scale = jnp.float32(grids[0].scale)
        w128 = ((size + 127) // 128) * 128

        def timed(kw, width, n=12, repeats=4):
            @partial(jax.jit, static_argnames="n")
            def chain(seed, n):
                def body(i, dep):
                    bump = (jnp.abs(dep) >> 30)
                    out = sdf_pallas_batch(
                        d_segs, d_var[i % 4] + bump, d_my, scale,
                        height=size, width=width, **kw,
                    )
                    return (
                        jnp.sum(out[:, 0, 0]).astype(jnp.int32) % 7
                        + dep % 1009
                    )
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

        dt_t = timed(dict(), w128)
        print(f"{size}px tiled(p{w128}) {dt_t*1e3:8.2f} ms/atlas "
              f"-> {len(glyphs)/dt_t:8.0f} g/s", flush=True)
        dt_f = timed(dict(flat=True), size)
        print(f"{size}px flat        {dt_f*1e3:8.2f} ms/atlas "
              f"-> {len(glyphs)/dt_f:8.0f} g/s  ({dt_t/dt_f:.2f}x)",
              flush=True)
        dt_n = timed(dict(flat=True, starts=3, iters=3), size)
        print(f"{size}px flat s3 i3  {dt_n*1e3:8.2f} ms/atlas "
              f"-> {len(glyphs)/dt_n:8.0f} g/s  ({dt_t/dt_n:.2f}x)",
              flush=True)

        # device-side equality check (same float program)
        a = sdf_pallas_batch(d_segs, d_var[0], d_my, scale,
                             height=size, width=w128)[:, :, :size]
        b = sdf_pallas_batch(d_segs, d_var[0], d_my, scale,
                             height=size, width=size, flat=True)
        print(f"  mismatch: {int(jnp.sum(a != b))}", flush=True)


if __name__ == "__main__":
    main()
