"""SDF kernel partition sweep (config-4 workload, flat mode): the
Loop-Blinn lesson applied — the 8x8 (tile_h x seg_chunk) partition
turns a 1000-glyph atlas into tens of thousands of tiny pl.when
bodies.  Distance min-folds are order-independent, so every partition
is bit-identical (CPU + device parity checked here)."""

import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np

from benchmarks.harness import setup_cache

setup_cache()

import jax
import jax.numpy as jnp

from fontrx.font.font import Font
from fontrx.kernels.grid import RasterGrid
from fontrx.kernels.sdf_pallas import sdf_pallas_batch
from fontrx.pack.segments import pack_glyphs

FONT = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"

font = Font.open(FONT)
glyphs = []
idx = 1
while len(glyphs) < 1000 and idx < font.num_glyphs:
    g = font.load_glyph_safe(idx)
    if g.num_segments:
        glyphs.append(g)
    idx += 1
batch = pack_glyphs(glyphs)
print(f"capacity {batch.capacity}", flush=True)
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

    def timed(kw, n=12, repeats=4):
        @partial(jax.jit, static_argnames="n")
        def chain(seed, n):
            def body(i, dep):
                bump = (jnp.abs(dep) >> 30)
                out = sdf_pallas_batch(
                    d_segs, d_var[i % 4] + bump, d_my, scale,
                    height=size, width=size, flat=True, **kw,
                )
                return (jnp.sum(out[:, 0, 0]).astype(jnp.int32) % 7
                        + dep % 1009)
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

    ref = np.asarray(sdf_pallas_batch(
        d_segs[:100], jnp.asarray(min_x[:100]), d_my[:100], scale,
        height=size, width=size, flat=True, seg_chunk=8, tile_h=8))
    combos = [(8, 8), (32, 8), (64, 8), (32, 16), (32, 32), (64, 16)]
    for sc, th in combos:
        if (size * size) % (th * 128) or th * sc > 1024:
            continue
        out = np.asarray(sdf_pallas_batch(
            d_segs[:100], jnp.asarray(min_x[:100]), d_my[:100], scale,
            height=size, width=size, flat=True, seg_chunk=sc, tile_h=th))
        mism = int((out != ref).sum())
        dt = timed(dict(seg_chunk=sc, tile_h=th))
        print(f"{size}px sc={sc:3d} th={th:2d}: {dt*1e3:7.2f} ms/atlas "
              f"-> {len(glyphs)/dt:8.0f} g/s  mismatch={mism}", flush=True)
print("DONE", flush=True)
