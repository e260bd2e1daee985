"""Page-scale group_guard sweep: does 8-segment group elision also win
at 1080p/4K page widths (the config-5 / stress regime)?

Synthesizes a page-shaped launch (1 instance-compacted 'glyph', many
thousand live segments spread over the page, scale 1.0 px/unit) like
``scene/page._direct_page_step`` issues, and times round-1 parameters
(guard=True, seg_chunk=16, no group elision) against round-2 variants.
"""

import sys

sys.path.insert(0, "/root/repo")

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from fontrx.kernels.winding_pallas_v2 import winding_pallas_v2_batch


def page_segments(rng, n_segments, w, h):
    """Closed diamond strokes in PAGE pixel space, y-sorted (the page
    compactor emits instances in layout order, which is y-coherent)."""
    n_shapes = n_segments // 4
    cx = rng.integers(10, w - 10, n_shapes)
    cy = np.sort(rng.integers(10, h - 10, n_shapes))
    r = rng.integers(3, 14, n_shapes)
    segs = np.zeros((n_shapes, 4, 3, 2), np.float32)
    for k in range(4):
        a0, a1 = k * np.pi / 2, (k + 1) * np.pi / 2
        p0 = np.stack([cx + r * np.cos(a0), cy + r * np.sin(a0)], axis=1)
        p2 = np.stack([cx + r * np.cos(a1), cy + r * np.sin(a1)], axis=1)
        segs[:, k, 0] = np.round(p0)
        segs[:, k, 1] = np.round((p0 + p2) / 2 + rng.integers(-3, 3, (n_shapes, 2)))
        segs[:, k, 2] = np.round(p2)
    for k in range(4):
        segs[:, (k + 1) % 4, 0] = segs[:, k, 2]
    return segs.reshape(-1, 3, 2)[:n_segments]


def main():
    rng = np.random.default_rng(3)
    counter = [int(time.time()) % 100000]

    for (w, h, n_seg) in ((1920, 1152, 12288), (3840, 2176, 49152)):
        segs = page_segments(rng, n_seg, w, h)[None]
        d_segs = jnp.asarray(segs)
        d_my = jnp.full(1, h - 1, jnp.int32)
        d_var = jnp.stack([jnp.full(1, -i, jnp.int32) for i in range(4)])

        def timed(kw, n=12, repeats=4):
            @partial(jax.jit, static_argnames="n")
            def chain(seed, n):
                def body(i, dep):
                    bump = (jnp.abs(dep) >> 30)
                    out = winding_pallas_v2_batch(
                        d_segs, d_var[i % 4] + bump, d_my, jnp.float32(1.0),
                        height=h, width=w, exact=True, **kw,
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

        for name, kw in (
            ("r1: gg=0 sc=16", dict(guard=True, seg_chunk=16)),
            ("r2: gg=8 sc=32", dict(guard=True, group_guard=8, seg_chunk=32)),
            ("r2: gg=16 sc=32", dict(guard=True, group_guard=16, seg_chunk=32)),
            ("r2: gg=8 sc=32 tw=256", dict(guard=True, group_guard=8,
                                           seg_chunk=32, tile_w=256)),
        ):
            if w % kw.get("tile_w", 128):
                continue
            dt = timed(kw)
            print(f"{w}x{h} S={n_seg}  {name:24s} {dt*1e3:8.2f} ms/frame",
                  flush=True)


if __name__ == "__main__":
    main()
