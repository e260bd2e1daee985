"""Confirm group_guard=16 (the post-y-sort headline winner) on the
other production workloads before making it the engine default:
the full-font cap-64 bucket @64px and a synthetic CJK 288-seg batch
@64px.  Chained-unique-seed protocol, per-glyph consumption."""

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
from fontrx.pack.segments import pack_glyphs_bucketed

FONT = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"


def timed_factory(counter):
    def timed(step_fn, n=20, repeats=5):
        @partial(jax.jit, static_argnames="n")
        def chain(seed, n):
            def body(i, dep):
                bump = (jnp.abs(dep) >> 30)
                out = step_fn(bump + (i % 4))
                return jnp.sum(out[:, 0, 0]) + dep % 1009
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
    return timed


def synth_cjk(n_glyphs=1000, segs=288, seed=3):
    """Multi-stroke closed-contour glyphs (same generator spirit as
    benchmarks/cjk.py): horizontal stroke boxes across the em."""
    rng = np.random.default_rng(seed)
    upem = 1000
    segments = np.zeros((n_glyphs, segs, 3, 2), np.float32)
    for g in range(n_glyphs):
        n_strokes = segs // 8
        for s in range(n_strokes):
            x0, y0 = rng.integers(0, upem - 120, 2)
            w, h = rng.integers(40, 120), rng.integers(10, 60)
            quad = []
            corners = [(x0, y0), (x0 + w, y0), (x0 + w, y0 + h), (x0, y0 + h)]
            for k in range(4):
                p0 = corners[k]
                p2 = corners[(k + 1) % 4]
                p1 = ((p0[0] + p2[0]) / 2, (p0[1] + p2[1]) / 2)
                quad.append((p0, p1, p2))
                # split each side into 2 quadratics to hit 8 per stroke
                quad.append((p2, p2, p2))
            segments[g, s * 8 : (s + 1) * 8] = np.asarray(quad, np.float32)
    # y-sort per glyph like the packer does
    from fontrx.pack.segments import ysort_segments

    for g in range(n_glyphs):
        segments[g] = ysort_segments(segments[g])
    return segments, upem


def main():
    font = Font.open(FONT)
    upem = font.info.units_per_em
    counter = [int(time.time()) % 100000]
    timed = timed_factory(counter)

    # full-font cap-64 bucket @64px
    glyphs = [font.load_glyph_safe(i) for i in range(font.num_glyphs)]
    buckets = pack_glyphs_bucketed(glyphs)
    batch, idxs = max(buckets, key=lambda t: len(t[1]))  # the cap-64 bucket
    grids = [
        RasterGrid.fixed_tile(tuple(b), 64, upem, 64)
        for b in np.asarray(batch.boxes)
    ]
    d_segs = jnp.asarray(batch.segments)
    d_mx = jnp.asarray(np.array([g.min_x for g in grids], np.int32))
    d_my = jnp.asarray(np.array([g.max_y for g in grids], np.int32))
    scale = jnp.float32(grids[0].scale)
    nb = len(batch)
    for gg in (8, 16):
        dt = timed(lambda bump, gg=gg: winding_pallas_v2_batch(
            d_segs, d_mx + bump, d_my, scale, height=128, width=128,
            exact=True, guard=True, group_guard=gg, seg_chunk=32,
        ))
        print(f"atlas64 cap64 n={nb} gg={gg}: {dt*1e3:7.2f} ms "
              f"-> {nb/dt:9.0f} g/s", flush=True)

    # synthetic CJK 288-seg @64px
    cs, cupem = synth_cjk()
    d_cs = jnp.asarray(cs)
    d_cmx = jnp.zeros(len(cs), jnp.int32)
    d_cmy = jnp.full(len(cs), 1000, jnp.int32)
    cscale = jnp.float32(64 / cupem)
    for gg in (8, 16):
        dt = timed(lambda bump, gg=gg: winding_pallas_v2_batch(
            d_cs, d_cmx + bump, d_cmy, cscale, height=128, width=128,
            exact=True, guard=True, group_guard=gg, seg_chunk=32,
        ))
        print(f"cjk288 n={len(cs)} gg={gg}: {dt*1e3:7.2f} ms "
              f"-> {len(cs)/dt:9.0f} g/s", flush=True)


if __name__ == "__main__":
    main()
