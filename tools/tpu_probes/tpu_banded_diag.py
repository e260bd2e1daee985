"""Diagnose the banded kernel's 5x per-chunk overhead vs per-glyph.

Ablations on the cap-64-bucket @64px banded atlas (6,086 glyphs):
exact on/off (is it div_cr on the (R,W) cx tensors?), guard modes,
group_guard off, and row_bands=1 through the SAME wrapper (isolates
the banded anchor/cx code from the wrapper)."""

import sys

sys.path.insert(0, "/root/repo")

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from fontrx.font.font import Font
from fontrx.kernels.grid import RasterGrid
from fontrx.kernels.winding_pallas_v2 import winding_pallas_banded_batch
sys.path.insert(0, "/root/repo/tools/tpu_probes")
from tpu_banded import build_banded

DEJAVU = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"


def main():
    font = Font.open(DEJAVU)
    glyphs = []
    for idx in range(font.num_glyphs):
        g = font.load_glyph_safe(idx)
        if g.num_segments <= 64:
            glyphs.append(g)
    tile, bands = 64, 2
    grids = [
        RasterGrid.fixed_tile(
            (g.box.x_min, g.box.y_min, g.box.x_max, g.box.y_max),
            tile, font.info.units_per_em, tile,
        )
        for g in glyphs
    ]
    segs, owners, mx, my, cap = build_banded(glyphs, grids, bands)
    d_segs = jnp.asarray(segs)
    d_own = jnp.asarray(owners)
    d_my = jnp.asarray(my)
    var_stack = jnp.stack([jnp.asarray(mx + i) for i in range(4)])
    scale = jnp.float32(grids[0].scale)
    counter = [int(time.time()) % 100000]

    # row_bands=1 control: one glyph per element, same wrapper
    grids1 = grids
    segs1, own1, mx1, my1, cap1 = build_banded(glyphs, grids1, 1)
    d_segs1 = jnp.asarray(segs1)
    d_own1 = jnp.asarray(own1)
    d_my1 = jnp.asarray(my1)
    var1 = jnp.stack([jnp.asarray(mx1 + i) for i in range(4)])

    def timed(fn, vstack, n=12, repeats=4):
        @partial(jax.jit, static_argnames="n")
        def chain(seed, n):
            def body(i, dep):
                bump = (jnp.abs(dep) >> 30)
                out = fn(vstack[i % 4] + bump)
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

    n = len(glyphs)
    variants = [
        ("x2 exact gg8 (baseline)", dict(row_bands=2, exact=True)),
        ("x2 NOexact gg8", dict(row_bands=2, exact=False)),
        ("x2 exact gg0", dict(row_bands=2, exact=True, group_guard=0)),
        ("x2 exact guard=False", dict(row_bands=2, exact=True, guard=False,
                                      group_guard=0)),
        ("x1 exact gg8 (control)", dict(row_bands=1, exact=True)),
    ]
    for name, kw in variants:
        rb = kw.pop("row_bands")
        if rb == 2:
            def fn(mxv, kw=kw):
                return winding_pallas_banded_batch(
                    d_segs, d_own, mxv, d_my, scale, width=128,
                    row_bands=2, **kw)
            dt = timed(fn, var_stack)
        else:
            def fn(mxv, kw=kw):
                return winding_pallas_banded_batch(
                    d_segs1, d_own1, mxv, d_my1, scale, width=128,
                    row_bands=1, **kw)
            dt = timed(fn, var1)
        print(f"{name:26s} {dt*1e3:8.2f} ms ({n/dt:9.0f} glyphs/s)",
              flush=True)




def split_variants():
    """Sub-launch splitting (the engine's MAX_KERNEL_BATCH rule)."""
    font = Font.open(DEJAVU)
    glyphs = [g for g in (font.load_glyph_safe(i) for i in range(font.num_glyphs))
              if g.num_segments <= 64]
    tile, bands = 64, 2
    grids = [RasterGrid.fixed_tile(
        (g.box.x_min, g.box.y_min, g.box.x_max, g.box.y_max),
        tile, font.info.units_per_em, tile) for g in glyphs]
    segs, owners, mx, my, cap = build_banded(glyphs, grids, bands)
    d_segs = jnp.asarray(segs)
    d_own = jnp.asarray(owners)
    d_my = jnp.asarray(my)
    var_stack = jnp.stack([jnp.asarray(mx + i) for i in range(4)])
    scale = jnp.float32(grids[0].scale)
    counter = [int(time.time()) % 100000]
    n = len(glyphs)
    b = segs.shape[0]

    def timed(fn, n_it=12, repeats=4):
        @partial(jax.jit, static_argnames="n")
        def chain(seed, n):
            def body(i, dep):
                bump = (jnp.abs(dep) >> 30)
                out = fn(var_stack[i % 4] + bump)
                return out[0, 0, 0] + dep % 1009
            return jax.lax.fori_loop(0, n, body, seed)

        def run(k):
            counter[0] += 1
            t0 = time.perf_counter()
            float(chain(jnp.int32(counter[0] << 8), k))
            return time.perf_counter() - t0

        run(1), run(n_it)
        rtt = min(run(1) for _ in range(repeats))
        tot = min(run(n_it) for _ in range(repeats))
        return max(tot - rtt, 1e-9) / (n_it - 1)

    for sub in (512, 1024, 2048):
        def fn(mxv, sub=sub):
            parts = []
            for lo in range(0, b, sub):
                hi = min(lo + sub, b)
                parts.append(winding_pallas_banded_batch(
                    d_segs[lo:hi], d_own[lo:hi], mxv[:, lo:hi],
                    d_my[:, lo:hi], scale, width=128, row_bands=2,
                    exact=True))
            return jnp.concatenate(parts, axis=0)
        dt = timed(fn)
        print(f"x2 exact split={sub:5d}       {dt*1e3:8.2f} ms "
              f"({n/dt:9.0f} glyphs/s)", flush=True)


if __name__ == "__main__":
    split_variants()
