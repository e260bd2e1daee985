"""Headline-batch kernel-variant sweep (94 ASCII glyphs @256px).

A/Bs the v2 winding kernel's phase-B elision strategies on the real
headline shapes with the chained-unique-seed protocol:

- guard=False (round-1 headline path: carry-free, every tile compares
  every crossing at/right of it),
- guard=True (carry sweep + per-(chunk, tile) any_in skip),
- guard=True + group_guard in {2, 4, 8} (per-segment-group skip),
- _detail=False (phase A only, WRONG results — isolates the phase
  split),
- seg_chunk sweep on the winner.

All variants are bit-identical (verified in interpret mode +
benchmarks/full_gate.py); this chooses the fastest.
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
        ("guard=False (r1 headline)", dict(guard=False)),
        ("guard=True", dict(guard=True)),
        ("guard=True gg=2", dict(guard=True, group_guard=2)),
        ("guard=True gg=4", dict(guard=True, group_guard=4)),
        ("guard=True gg=8", dict(guard=True, group_guard=8)),
        ("phaseA-only (timing)", dict(guard=True, _detail=False)),
    ]
    results = {}
    for name, kw in variants:
        dt = timed(kw)
        results[name] = dt
        print(f"{name:28s} {dt*1e3:8.3f} ms/batch -> {b/dt:9.0f} glyphs/s",
              flush=True)

    best = min((v for k, v in results.items() if "timing" not in k),
               default=None)
    winner_kw = None
    for name, kw in variants:
        if "timing" not in name and results[name] == best:
            winner_kw = kw
            print(f"winner: {name}", flush=True)
            break
    for sc in (8, 32):
        kw = dict(winner_kw, seg_chunk=sc)
        dt = timed(kw)
        print(f"winner + seg_chunk={sc:3d}      {dt*1e3:8.3f} ms/batch -> "
              f"{b/dt:9.0f} glyphs/s", flush=True)


if __name__ == "__main__":
    main()
