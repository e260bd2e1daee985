"""Sweep v2 kernel knobs at the bench.py shape (B=94, 256px) with the
on-device fori_loop timing method (unique seed per run, min-of-2)."""
import sys, time
from functools import partial

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from fontrx.engine.atlas import pack_charset
from fontrx.font.font import Font
from fontrx.kernels.grid import RasterGrid
from fontrx.kernels.winding_pallas_v2 import winding_pallas_v2_batch

FONT = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"
TILE = 256

font = Font.open(FONT)
batch = pack_charset(font, [c for c in range(33, 127)])
b = len(batch)
grids = [RasterGrid.fixed_tile(tuple(box), 256, font.info.units_per_em, TILE)
         for box in np.asarray(batch.boxes)]
min_x = np.array([g.min_x for g in grids], np.int32)
max_y = np.array([g.max_y for g in grids], np.int32)
scale = np.float32(grids[0].scale)

segs = jnp.asarray(batch.segments)
var_stack = jnp.stack([jnp.asarray(min_x + i) for i in range(4)])
my = jnp.asarray(max_y)
print(f"B={b} S={batch.segments.shape[1]} tile={TILE}", flush=True)

counter = [500]
N = 30

def timing(seg_chunk, tile_w, guard):
    @partial(jax.jit, static_argnames="n")
    def chain_n(s, vs, m, seed, n):
        def body(i, dep):
            mx = vs[i % 4] + (jnp.abs(dep) >> 30)
            out = winding_pallas_v2_batch(
                s, mx, m, scale, height=TILE, width=TILE,
                exact=True, seg_chunk=seg_chunk, tile_w=tile_w, guard=guard,
            )
            return out[0, 0, 0] + dep % 1009
        return jax.lax.fori_loop(0, n, body, seed)

    def run(n):
        counter[0] += 1
        seed = jnp.int32(counter[0] << 8)
        t0 = time.perf_counter()
        float(chain_n(segs, var_stack, my, seed, n))
        return time.perf_counter() - t0

    run(1); run(N)  # compile both bounds
    rtt = min(run(1) for _ in range(2))
    total = min(run(N) for _ in range(2))
    dt = max(total - rtt, 1e-9) / (N - 1)
    return b / dt

for sc, tw, g in [(16, 128, False), (8, 128, False), (32, 128, False),
                  (16, 256, False), (16, 128, True), (32, 256, False)]:
    try:
        gps = timing(sc, tw, g)
        print(f"seg_chunk={sc:3d} tile_w={tw:3d} guard={g!s:5s} -> "
              f"{gps:10.0f} glyphs/s", flush=True)
    except Exception as e:
        print(f"seg_chunk={sc} tile_w={tw} guard={g}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
