"""Probe: window-packed dense kernel (per-chunk ROW culling — each
segment chunk evaluates phase A only on its 16/32-row window) vs the
shipped lane-packed path on the CJK atlas (288-seg x 1000 glyphs).
Device bit-exactness gate + chained timing."""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

from benchmarks.cjk import UPEM, _chained_timer, make_batch  # noqa: E402
from benchmarks.harness import setup_cache  # noqa: E402

setup_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fontrx.kernels.winding_dense import (  # noqa: E402
    dense_tuning,
    pack_dense_windows,
    winding_dense_batch,
    winding_dense_win_batch,
)
from fontrx.pack.segments import xsort_segments  # noqa: E402

B, NSEG = 1000, 288
segs = make_batch(B, NSEG)
xs = np.stack([xsort_segments(s) for s in segs])
d_x = jnp.asarray(xs)


def run(size, variants):
    scale = np.float32(size / UPEM)
    min_x = np.zeros(B, np.int32)
    max_y = np.full(B, size - 1, np.int32)
    d_my = jnp.asarray(max_y)
    d_var = jnp.stack([jnp.full(B, i, jnp.int32) for i in range(4)])

    lp, sc = dense_tuning(size)

    def base_fn(mx):
        return winding_dense_batch(
            d_x, mx, d_my, jnp.float32(scale), height=size,
            width=size, exact=True, seg_chunk=sc, col_block=8,
            lane_pack=lp,
        )

    ref = base_fn(d_var[1])
    dt = _chained_timer(base_fn, d_var, n_iter=12, repeats=4)
    print(json.dumps({"size": size,
                      "variant": f"shipped-lp{lp}-sc{sc}",
                      "ms": round(dt * 1e3, 2)}), flush=True)

    for wr, g, wsc in variants:
        win, nw, cap = pack_dense_windows(
            xs, min_x, max_y, float(scale), size,
            win_rows=wr, seg_chunk=wsc, groups=g)
        live = int((~(win == 0).all(axis=(2, 3))).sum())
        d_win = jnp.asarray(win)

        def fn(mx, wr=wr, g=g, wsc=wsc, d_win=d_win, nw=nw, cap=cap):
            return winding_dense_win_batch(
                d_win, mx, d_my, jnp.float32(scale), height=size,
                width=size, n_windows=nw, cap=cap, exact=True,
                seg_chunk=wsc, col_block=8, groups=g, win_rows=wr,
            )

        try:
            out = fn(d_var[1])
            mism = int(jnp.sum(
                out[:, :size, :size] != ref[:, :size, :size]))
            dt = _chained_timer(fn, d_var, n_iter=12, repeats=4)
        except Exception as e:  # noqa: BLE001
            print(json.dumps(
                {"size": size,
                 "variant": f"win{wr}-g{g}-sc{wsc}",
                 "error": str(e)[:200]}), flush=True)
            continue
        print(json.dumps(
            {"size": size, "variant": f"win{wr}-g{g}-sc{wsc}",
             "ms": round(dt * 1e3, 2), "mismatch": mism,
             "cap": cap, "n_windows": nw,
             "dup": round(live / (B * NSEG), 3),
             "padded": nw * cap}), flush=True)


run(64, [(16, 8, 16), (16, 8, 8), (32, 4, 32), (16, 8, 32)])
run(32, [(16, 8, 16), (16, 8, 8), (32, 4, 16)])
print("DONE", flush=True)
