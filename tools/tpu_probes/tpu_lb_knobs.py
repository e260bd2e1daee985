"""Loop-Blinn kernel knob sweep on the config-3 workload (94 ASCII
glyphs @128px): tile_h x chunk partition sizes.  The per-(triangle,
pixel) float program is identical for every setting (interpret parity
0 on CPU), so this is timing + device parity only.  Hypothesis: the
kernel is branch-bound — 1504 grid steps x n_chunks tiny pl.when
bodies — so fewer, fatter chunks/tiles should pay."""

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
from fontrx.geometry import TriangulatedGlyph
from fontrx.kernels.grid import RasterGrid
from fontrx.kernels.loopblinn import (
    _pack_triangle_arrays,
    loopblinn_pallas_batch,
    pad_triangles,
)

DEJAVU = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"

font = Font.open(DEJAVU)
chars = [chr(c) for c in range(33, 127)]
tgs = [TriangulatedGlyph.from_glyph(font.get_glyph(c)[0]) for c in chars]
cap = max(len(t.triangles) for t in tgs)
counts = [len(t.triangles) for t in tgs]
print(f"tris: cap {cap}, mean {np.mean(counts):.0f}, "
      f"median {np.median(counts):.0f}", flush=True)
tris = np.zeros((len(tgs), cap, 3, 4), np.float32)
cls = np.full((len(tgs), cap), 3, np.int32)
boxes = []
for i, (c, tg) in enumerate(zip(chars, tgs)):
    packed, pc = pad_triangles(_pack_triangle_arrays(tg), tg.classes, cap)
    tris[i] = packed
    cls[i] = pc
    g, _ = font.get_glyph(c)
    boxes.append((g.box.x_min, g.box.y_min, g.box.x_max, g.box.y_max))
grids = [RasterGrid.fixed_tile(b, 128, font.info.units_per_em, 128)
         for b in boxes]
args = (jnp.asarray(tris), jnp.asarray(cls),
        jnp.array([g.min_x for g in grids], jnp.int32),
        jnp.array([g.max_y for g in grids], jnp.int32),
        jnp.float32(grids[0].scale))
d_var = jnp.stack([args[2] + i for i in range(4)])
counter = [int(time.time()) % 100000]


def timed(th, ch, n=12, repeats=4):
    def fn(mx):
        return loopblinn_pallas_batch(
            args[0], args[1], mx, args[3], args[4],
            height=128, width=128, tile_h=th, chunk=ch,
        ).astype(jnp.int32)

    @partial(jax.jit, static_argnames="n")
    def chain(seed, n):
        def body(i, dep):
            bump = (jnp.abs(dep) >> 30)
            out = fn(d_var[i % 4] + bump)
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


ref = np.asarray(loopblinn_pallas_batch(
    args[0], args[1], args[2], args[3], args[4], height=128, width=128))
for th, ch in [(8, 8), (8, 32), (32, 8), (32, 32), (64, 32), (32, 64),
               (128, 32), (64, 64)]:
    out = np.asarray(loopblinn_pallas_batch(
        args[0], args[1], args[2], args[3], args[4],
        height=128, width=128, tile_h=th, chunk=ch))
    mism = int((out != ref).sum())
    dt = timed(th, ch)
    print(f"tile_h={th:3d} chunk={ch:3d}: {dt*1e3:7.2f} ms/atlas "
          f"-> {len(tgs)/dt:8.0f} g/s  mismatch={mism}", flush=True)
print("DONE", flush=True)
