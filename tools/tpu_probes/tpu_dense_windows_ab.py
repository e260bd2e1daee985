"""Interleaved A/B: window-packed dense kernel vs shipped, separating
the windowing effect from plain seg_chunk retuning.  Variants alternate
inside the same repeat loop so tunnel drift cancels."""

import json
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")

from benchmarks.cjk import UPEM, make_batch  # noqa: E402
from benchmarks.harness import setup_cache  # noqa: E402

setup_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fontrx.kernels.winding_dense import (  # noqa: E402
    pack_dense_windows,
    winding_dense_batch,
    winding_dense_win_batch,
)
from fontrx.pack.segments import xsort_segments  # noqa: E402

B, NSEG = 1000, 288
segs = make_batch(B, NSEG)
xs = np.stack([xsort_segments(s) for s in segs])
d_x = jnp.asarray(xs)

N_ITER, REPEATS = 12, 6


def make_chain(fn, d_var):
    @partial(jax.jit, static_argnames="n")
    def chain(seed, n):
        def body(i, dep):
            bump = jax.lax.convert_element_type(
                jnp.floor(jnp.abs(dep)), jnp.int32) >> 30
            out = fn(d_var[i % 4] + bump)
            return jnp.sum(out[:, 0, 0]).astype(jnp.float32) + jnp.float32(
                dep % 7.0)
        return jax.lax.fori_loop(0, n, body, jnp.float32(seed))
    return chain


def run(size, lp, shipped_sc, variants):
    scale = np.float32(size / UPEM)
    min_x = np.zeros(B, np.int32)
    max_y = np.full(B, size - 1, np.int32)
    d_my = jnp.asarray(max_y)
    d_var = jnp.stack([jnp.full(B, i, jnp.int32) for i in range(4)])

    chains = {}
    for sc in shipped_sc:
        def base_fn(mx, sc=sc):
            return winding_dense_batch(
                d_x, mx, d_my, jnp.float32(scale), height=size,
                width=size, exact=True, seg_chunk=sc, col_block=8,
                lane_pack=lp)
        chains[f"shipped-lp{lp}-sc{sc}"] = make_chain(base_fn, d_var)

    for wr, g, wsc in variants:
        win, nw, cap = pack_dense_windows(
            xs, min_x, max_y, float(scale), size,
            win_rows=wr, seg_chunk=wsc, groups=g)
        d_win = jnp.asarray(win)

        def fn(mx, d_win=d_win, nw=nw, cap=cap, wsc=wsc, g=g, wr=wr):
            return winding_dense_win_batch(
                d_win, mx, d_my, jnp.float32(scale), height=size,
                width=size, n_windows=nw, cap=cap, exact=True,
                seg_chunk=wsc, col_block=8, groups=g, win_rows=wr)
        chains[f"win{wr}-g{g}-sc{wsc}(nw{nw})"] = make_chain(fn, d_var)

    # warm every chain (compile) before timing
    counter = [int(time.time()) % 100000]

    def once(ch, k):
        counter[0] += 1
        t0 = time.perf_counter()
        float(ch(counter[0], k))
        return time.perf_counter() - t0

    for ch in chains.values():
        once(ch, 1), once(ch, N_ITER)

    best = {k: (1e9, 1e9) for k in chains}
    for _ in range(REPEATS):
        for k, ch in chains.items():
            rtt = once(ch, 1)
            tot = once(ch, N_ITER)
            br, bt = best[k]
            best[k] = (min(br, rtt), min(bt, tot))
    for k, (rtt, tot) in best.items():
        ms = (tot - rtt) / (N_ITER - 1) * 1e3
        print(json.dumps({"size": size, "variant": k,
                          "ms": round(ms, 3)}), flush=True)


run(64, 2, [64, 32], [(32, 4, 32), (32, 4, 16)])
run(32, 4, [32, 16], [(16, 8, 16), (32, 4, 16)])
print("DONE", flush=True)
