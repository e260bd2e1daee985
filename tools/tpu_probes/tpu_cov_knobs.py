"""Fused-coverage kernel seg_chunk sweep on its live domain (tiles the
engine routes to it: >128px, here 94 ASCII @256px, 2x2).  Winding sums
are order-independent -> bit-identical for any chunking; device parity
checked.  Detail unrolls sit inside nested pl.when (the page kernel's
sc64 MISCOMPILED there, docs/RESULTS.md r3) — device validation is the
point of this probe, not just timing."""

import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np

from benchmarks.harness import setup_cache

setup_cache()

import jax
import jax.numpy as jnp

from fontrx.engine.atlas import pack_charset
from fontrx.font.font import Font
from fontrx.kernels.coverage_pallas import coverage_pallas_batch
from fontrx.kernels.grid import RasterGrid

DEJAVU = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"

font = Font.open(DEJAVU)
batch = pack_charset(font, list(range(33, 127)))
grids = [
    RasterGrid.fixed_tile(tuple(b), 256, font.info.units_per_em, 256)
    for b in np.asarray(batch.boxes)
]
d_segs = jnp.asarray(batch.segments)
min_x = np.array([g.min_x for g in grids], np.int32)
d_var = jnp.stack([jnp.asarray(min_x + i) for i in range(4)])
d_my = jnp.asarray(np.array([g.max_y for g in grids], np.int32))
scale = jnp.float32(grids[0].scale)
print(f"capacity {batch.capacity}", flush=True)
counter = [int(time.time()) % 100000]


def timed(sc, n=12, repeats=4):
    @partial(jax.jit, static_argnames="n")
    def chain(seed, n):
        def body(i, dep):
            bump = (jnp.abs(dep) >> 30)
            out = coverage_pallas_batch(
                d_segs, d_var[i % 4] + bump, d_my, scale,
                height=256, width=256, samples=2, exact=True,
                seg_chunk=sc,
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


ref = np.asarray(coverage_pallas_batch(
    d_segs, jnp.asarray(min_x), d_my, scale, height=256, width=256,
    samples=2, exact=True, seg_chunk=8))
for sc in (8, 16, 32):
    out = np.asarray(coverage_pallas_batch(
        d_segs, jnp.asarray(min_x), d_my, scale, height=256, width=256,
        samples=2, exact=True, seg_chunk=sc))
    mism = int((out != ref).sum())
    dt = timed(sc)
    print(f"256px 2x2 sc={sc:2d}: {dt*1e3:7.2f} ms/atlas "
          f"-> {len(grids)/dt:8.0f} g/s  mismatch={mism}", flush=True)
print("DONE", flush=True)
