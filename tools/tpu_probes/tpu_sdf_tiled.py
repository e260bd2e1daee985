"""A/B the 2-D-tiled band-culled SDF kernel vs the shipped flat-pixel
mode on the CJK-regime workload (1000 glyphs x 288 segments, the
config-4 dense case VERDICT r3 flagged at ~20x its winding sibling).

Tile-shape sweep per size, chained unique-seed protocol (min_x jitter
covered by pack x_slack), plus a device bit-check of every tiled
candidate vs the flat raster at the jittered anchor.

Run: nohup python3 -u tools/tpu_probes/tpu_sdf_tiled.py > log 2>&1 &
"""

import sys

sys.path.insert(0, "/root/repo")

import time

import numpy as np

import jax
import jax.numpy as jnp

from benchmarks.cjk import UPEM, _chained_timer, make_batch
from fontrx.kernels.sdf_pallas import (
    pack_sdf_tiles,
    sdf_pallas_batch,
    sdf_pallas_tiled_batch,
)


def main():
    b, n_seg = 1000, 288
    segs = make_batch(b, n_seg)
    d_segs = jnp.asarray(segs)
    print("backend:", jax.default_backend(), flush=True)

    for size in (32, 64):
        scale = np.float32(size / UPEM)
        d_my = jnp.asarray(np.full(b, size - 1, np.int32))
        d_var = jnp.stack(
            [jnp.full(b, i, jnp.int32) for i in range(4)])

        def flat_fn(mx, size=size, scale=scale, d_my=d_my):
            return sdf_pallas_batch(
                d_segs, mx, d_my, jnp.float32(scale),
                height=size, width=size, flat=True)

        t0 = time.time()
        dt = _chained_timer(flat_fn, d_var, n_iter=6, repeats=4)
        print(f"[{size}px] flat: {dt*1e3:8.2f} ms/atlas "
              f"({b/dt:8.0f} g/s)  wall {time.time()-t0:.0f}s",
              flush=True)
        ref = np.asarray(flat_fn(d_var[3]))

        shapes = ((4, 32), (8, 16), (16, 16), (16, 32), (32, 32),
                  (8, 32))
        for th, tw in shapes:
            n_g = 1024 // (th * tw)
            if size % th or size % tw or n_g > 8:
                continue
            if ((size // th) * (size // tw)) % n_g:
                continue
            stream, cnts, cap = pack_sdf_tiles(
                segs, np.zeros(b, np.int32), np.asarray(d_my), scale,
                size, size, tile_h=th, tile_w=tw, x_slack_px=4.0)
            d_stream = jnp.asarray(stream)
            d_cnts = jnp.asarray(cnts)

            def tiled_fn(mx, size=size, scale=scale, d_my=d_my,
                         d_stream=d_stream, d_cnts=d_cnts, cap=cap,
                         th=th, tw=tw):
                return sdf_pallas_tiled_batch(
                    d_segs, d_stream, d_cnts, mx, d_my,
                    jnp.float32(scale), height=size, width=size,
                    cap=cap, tile_h=th, tile_w=tw)

            t0 = time.time()
            try:
                dt_t = _chained_timer(tiled_fn, d_var, n_iter=6,
                                      repeats=4)
            except Exception as e:  # noqa: BLE001
                print(f"[{size}px] tiled {th}x{tw}: FAILED {e!r}",
                      flush=True)
                continue
            out = np.asarray(tiled_fn(d_var[3]))
            mism = int((out != ref).sum())
            print(f"[{size}px] tiled {th}x{tw} cap={cap}: "
                  f"{dt_t*1e3:8.2f} ms/atlas ({b/dt_t:8.0f} g/s) "
                  f"x{dt/dt_t:4.2f} vs flat, mism={mism} "
                  f"wall {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
