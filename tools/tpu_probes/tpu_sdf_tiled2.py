"""Round-5 tiled-SDF knob sweep: count-sorted register binning x
seg_chunk, on the shapes round 4's tile sweep ranked best
(tpu_sdf_tiled.py: @64px 4x32 1.35x / 8x16 1.33x over flat; @32px
everything ~1.05x).  Host analysis says sorting cuts chunk iterations
~20% @64px (41 -> 32 for 8x16); seg_chunk was never swept and the
per-iteration overhead vs the flat kernel is the dominant term
(tiled runs 28% of flat's iterations but only 1.33x faster).

Run: nohup python3 -u tools/tpu_probes/tpu_sdf_tiled2.py > log 2>&1 &
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

        shapes = ((4, 32), (8, 16)) if size == 64 else ((8, 16),)
        for th, tw in shapes:
            for chunk in (8, 16, 32):
                for srt in (True, False):
                    if not srt and chunk == 8:
                        continue  # round-4 numbers already cover it
                    stream, cnts, tids, cap = pack_sdf_tiles(
                        segs, np.zeros(b, np.int32), np.asarray(d_my),
                        scale, size, size, tile_h=th, tile_w=tw,
                        seg_chunk=chunk, x_slack_px=4.0,
                        sort_tiles=srt)
                    d_stream = jnp.asarray(stream)
                    d_cnts = jnp.asarray(cnts)
                    d_tids = jnp.asarray(tids)

                    def tiled_fn(mx, size=size, scale=scale,
                                 d_my=d_my, d_stream=d_stream,
                                 d_cnts=d_cnts, d_tids=d_tids,
                                 cap=cap, th=th, tw=tw, chunk=chunk):
                        return sdf_pallas_tiled_batch(
                            d_segs, d_stream, d_cnts, d_tids, mx,
                            d_my, jnp.float32(scale), height=size,
                            width=size, cap=cap, tile_h=th, tile_w=tw,
                            seg_chunk=chunk)

                    t0 = time.time()
                    try:
                        dt_t = _chained_timer(tiled_fn, d_var,
                                              n_iter=6, repeats=4)
                    except Exception as e:  # noqa: BLE001
                        print(f"[{size}px] {th}x{tw} c{chunk} "
                              f"srt={int(srt)}: FAILED {e!r}",
                              flush=True)
                        continue
                    out = np.asarray(tiled_fn(d_var[3]))
                    mism = int((out != ref).sum())
                    print(f"[{size}px] {th}x{tw} c{chunk} "
                          f"srt={int(srt)} cap={cap}: "
                          f"{dt_t*1e3:8.2f} ms/atlas ({b/dt_t:8.0f} "
                          f"g/s) x{dt/dt_t:4.2f} mism={mism} "
                          f"wall {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
