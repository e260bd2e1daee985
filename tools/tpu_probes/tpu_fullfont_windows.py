"""Interleaved A/B: does the window-packed dense path help the SPARSE
full-font small-tile atlas (DejaVu cap-64 bucket)?  Unlike the uniform
288-seg CJK batch, sparse glyphs have few segments and ragged
per-window counts — the pack's cap quantization (groups*seg_chunk)
may outweigh the row cull.  Decides `winding_packed*` routing."""

import json
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")

from benchmarks.harness import DEJAVU, setup_cache  # noqa: E402

setup_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fontrx.engine.raster import RasterEngine  # noqa: E402
from fontrx.font.font import Font  # noqa: E402
from fontrx.kernels.grid import RasterGrid  # noqa: E402
from fontrx.pack.segments import pack_glyphs  # noqa: E402

font = Font.open(DEJAVU)
glyphs = []
for gid in range(font.num_glyphs):
    g = font.load_glyph_safe(gid)
    if 0 < g.num_segments <= 64:
        glyphs.append(g)
print(f"cap-64 bucket: {len(glyphs)} glyphs", flush=True)

N_ITER, REPEATS = 6, 5


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


counter = [int(time.time()) % 100000]


def once(ch, k):
    counter[0] += 1
    t0 = time.perf_counter()
    float(ch(counter[0], k))
    return time.perf_counter() - t0


for tile in (64, 32):
    batch = pack_glyphs(glyphs, capacity=64, sort="x")
    grids = [
        RasterGrid.fixed_tile(tuple(b), float(tile),
                              font.info.units_per_em, tile)
        for b in np.asarray(batch.boxes)
    ]
    mx = jnp.asarray(np.array([g.min_x for g in grids], np.int32))
    my0 = np.array([g.max_y for g in grids], np.int32)
    scale = np.float32(grids[0].scale)
    d_var = jnp.stack([jnp.asarray(my0 + i) for i in range(4)])
    engine = RasterEngine()
    d_segs = jnp.asarray(batch.segments)

    def plain(my, tile=tile, d_segs=d_segs, mx=mx, scale=scale):
        return engine.winding_batch(
            d_segs, mx, my, jnp.float32(scale),
            height=tile, width=tile)

    wins = engine.pack_windows(
        np.asarray(batch.segments), np.asarray(mx), my0, float(scale),
        height=tile)
    print(json.dumps({"tile": tile, "cap": wins.cap,
                      "n_windows": wins.n_windows,
                      "padded": wins.n_windows * wins.cap,
                      "real_cap": int(batch.segments.shape[1])}),
          flush=True)

    def winfn(my, tile=tile, d_segs=d_segs, mx=mx, scale=scale,
              wins=wins):
        return engine.winding_batch(
            d_segs, mx, my, jnp.float32(scale),
            height=tile, width=tile, windows=wins)

    ref = plain(d_var[0])
    out = winfn(d_var[0])
    mism = int(jnp.sum(ref != out))

    chains = {"plain": make_chain(plain, d_var),
              "windows": make_chain(winfn, d_var)}
    for ch in chains.values():
        once(ch, 1), once(ch, N_ITER)
    best = {k: (1e9, 1e9) for k in chains}
    for _ in range(REPEATS):
        for k, ch in chains.items():
            rtt, tot = once(ch, 1), once(ch, N_ITER)
            br, bt = best[k]
            best[k] = (min(br, rtt), min(bt, tot))
    for k, (rtt, tot) in best.items():
        ms = (tot - rtt) / (N_ITER - 1) * 1e3
        print(json.dumps({"tile": tile, "variant": k,
                          "ms": round(ms, 2), "mismatch": mism}),
              flush=True)
print("DONE", flush=True)
