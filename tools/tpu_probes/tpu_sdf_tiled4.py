"""Round-5 tiled-SDF select-elimination A/B: segment-major stream.

The shipped 8x16 c16 sorted kernel runs at 20% of the cmp/select/add
roofline (KERNELS.md); the accounted residual is the dynamic-loop +
per-chunk sublane-group select assembly (n_g x 6 = 48 (C,8,1) selects
per iteration).  The ``seg_major`` stream layout orders an iteration
block segment-major (j*n_g + g), so the chunk load reshapes
STATICALLY to (C, groups, params) and every param is a lane slice —
zero selects.  A/B on the CJK workload, plus unroll now that the
per-iteration body is lean, plus chunk re-sweep (the select cost
scaled with n_g, not chunk, so the old chunk optimum may move).

Run: nohup python3 -u tools/tpu_probes/tpu_sdf_tiled4.py > log 2>&1 &
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

    for size in (64, 32):
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

        th, tw = 8, 16  # n_g == 8 (seg_major requirement)
        combos = [(16, False, 1), (16, True, 1), (16, True, 2),
                  (16, True, 4), (8, True, 1), (32, True, 1)]
        if size == 32:
            combos = [(16, False, 1), (16, True, 1), (16, True, 2)]
        for chunk, sm, unroll in combos:
            stream, cnts, tids, cap = pack_sdf_tiles(
                segs, np.zeros(b, np.int32), np.asarray(d_my),
                scale, size, size, tile_h=th, tile_w=tw,
                seg_chunk=chunk, x_slack_px=4.0,
                sort_tiles=True, seg_major=sm)
            d_stream = jnp.asarray(stream)
            d_cnts = jnp.asarray(cnts)
            d_tids = jnp.asarray(tids)

            def tiled_fn(mx, size=size, scale=scale, d_my=d_my,
                         d_stream=d_stream, d_cnts=d_cnts,
                         d_tids=d_tids, cap=cap, chunk=chunk,
                         sm=sm, unroll=unroll):
                return sdf_pallas_tiled_batch(
                    d_segs, d_stream, d_cnts, d_tids, mx,
                    d_my, jnp.float32(scale), height=size,
                    width=size, cap=cap, tile_h=th, tile_w=tw,
                    seg_chunk=chunk, seg_major=sm, unroll=unroll)

            t0 = time.time()
            try:
                dt_t = _chained_timer(tiled_fn, d_var,
                                      n_iter=6, repeats=4)
            except Exception as e:  # noqa: BLE001
                print(f"[{size}px] c{chunk} sm={int(sm)} u{unroll}: "
                      f"FAILED {e!r}", flush=True)
                continue
            out = np.asarray(tiled_fn(d_var[3]))
            mism = int((out != ref).sum())
            print(f"[{size}px] {th}x{tw} c{chunk} sm={int(sm)} "
                  f"u{unroll} cap={cap}: {dt_t*1e3:8.2f} ms/atlas "
                  f"({b/dt_t:8.0f} g/s) x{dt/dt_t:4.2f} mism={mism} "
                  f"wall {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
