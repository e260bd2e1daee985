"""Round-5 tiled-SDF probe 3: chunk-loop UNROLL on the two best
shapes from tpu_sdf_tiled2 (@64px 8x16 c16 sorted 90.2 ms, 4x32 c16
sorted 92.1 ms vs flat 133).  Op accounting (tools/op_accounting.py)
puts the tiled kernel at 20% of the cmp/select/add roofline vs the
flat kernel's 47% — the dynamic short fori_loop is the suspect; the
unroll amortizes its scheduling overhead (over-run chunks clamp to
the last in-bounds chunk, min-idempotent, bit-exact).

Also runs @32px with the winning config to settle the 32px routing.

Run: nohup python3 -u tools/tpu_probes/tpu_sdf_tiled3.py > log 2>&1 &
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

    cases = [
        (64, 8, 16, 16, 1), (64, 8, 16, 16, 2), (64, 8, 16, 16, 4),
        (64, 4, 32, 16, 2), (64, 4, 32, 16, 4),
        (64, 8, 16, 8, 4), (64, 8, 16, 8, 8),
        (32, 8, 16, 16, 2), (32, 8, 16, 16, 4),
    ]
    flat_ms = {}
    for size in (64, 32):
        scale = np.float32(size / UPEM)
        d_my = jnp.asarray(np.full(b, size - 1, np.int32))
        d_var = jnp.stack([jnp.full(b, i, jnp.int32) for i in range(4)])

        def flat_fn(mx, size=size, scale=scale, d_my=d_my):
            return sdf_pallas_batch(
                d_segs, mx, d_my, jnp.float32(scale),
                height=size, width=size, flat=True)

        dt = _chained_timer(flat_fn, d_var, n_iter=6, repeats=4)
        flat_ms[size] = dt
        print(f"[{size}px] flat: {dt*1e3:8.2f} ms/atlas", flush=True)

    for size, th, tw, chunk, unroll in cases:
        scale = np.float32(size / UPEM)
        d_my = jnp.asarray(np.full(b, size - 1, np.int32))
        d_var = jnp.stack([jnp.full(b, i, jnp.int32) for i in range(4)])

        def flat_fn(mx, size=size, scale=scale, d_my=d_my):
            return sdf_pallas_batch(
                d_segs, mx, d_my, jnp.float32(scale),
                height=size, width=size, flat=True)

        ref = np.asarray(flat_fn(d_var[3]))
        stream, cnts, tids, cap = pack_sdf_tiles(
            segs, np.zeros(b, np.int32), np.asarray(d_my), scale,
            size, size, tile_h=th, tile_w=tw, seg_chunk=chunk,
            x_slack_px=4.0, sort_tiles=True)
        d_stream = jnp.asarray(stream)
        d_cnts = jnp.asarray(cnts)
        d_tids = jnp.asarray(tids)

        def tiled_fn(mx, size=size, scale=scale, d_my=d_my,
                     d_stream=d_stream, d_cnts=d_cnts, d_tids=d_tids,
                     cap=cap, th=th, tw=tw, chunk=chunk,
                     unroll=unroll):
            return sdf_pallas_tiled_batch(
                d_segs, d_stream, d_cnts, d_tids, mx, d_my,
                jnp.float32(scale), height=size, width=size, cap=cap,
                tile_h=th, tile_w=tw, seg_chunk=chunk, unroll=unroll)

        t0 = time.time()
        try:
            dt_t = _chained_timer(tiled_fn, d_var, n_iter=6, repeats=4)
        except Exception as e:  # noqa: BLE001
            print(f"[{size}px] {th}x{tw} c{chunk} u{unroll}: "
                  f"FAILED {e!r}", flush=True)
            continue
        out = np.asarray(tiled_fn(d_var[3]))
        mism = int((out != ref).sum())
        print(f"[{size}px] {th}x{tw} c{chunk} u{unroll} cap={cap}: "
              f"{dt_t*1e3:8.2f} ms/atlas x{flat_ms[size]/dt_t:4.2f} "
              f"mism={mism} wall {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
