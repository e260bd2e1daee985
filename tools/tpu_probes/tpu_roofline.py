"""Empirical VPU/HBM roofline for the winding kernel's op mix.

Measures, with saturating Pallas microkernels and the chained-timing
protocol:

- f32 mul+add (FMA-shaped) throughput,
- i32 add throughput,
- i16 add throughput (is a narrow winding accumulator worth it?),
- the detail-op pattern (f32 compare -> i32 select-add) throughput,
- HBM copy bandwidth,

then prints the winding kernel's modeled op counts per BASELINE
headline batch so docs/KERNELS.md can state "within Nx of roofline,
bound by X" with measurements behind it.
"""

import sys

sys.path.insert(0, "/root/repo")

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, W = 512, 128          # block shape per grid instance
K = 128                  # fori iterations
UNROLL = 8
GRID = 16


def _timed(run, n=24, repeats=4):
    @partial(jax.jit, static_argnames="n")
    def chain(seed, n):
        def body(i, dep):
            out = run(dep)
            return out + dep % 7.0
        return jax.lax.fori_loop(0, n, body, jnp.float32(seed))

    c = [int(time.time()) % 10000]

    def once(k):
        c[0] += 1
        t0 = time.perf_counter()
        float(chain(jnp.float32(c[0]), k))
        return time.perf_counter() - t0

    once(1), once(n)
    rtt = min(once(1) for _ in range(repeats))
    tot = min(once(n) for _ in range(repeats))
    return max(tot - rtt, 1e-9) / (n - 1)


def _bench_elementwise(name, dtype, op, ops_per_elem_iter):
    def kernel(s_ref, x_ref, o_ref):
        x = x_ref[...]
        seed = s_ref[0]

        def body(i, x):
            for _ in range(UNROLL):
                x = op(x, i)
            return x

        x = jax.lax.fori_loop(0, K + seed * 0, body, x)
        o_ref[...] = x

    @jax.jit
    def launch(seed):
        x = jnp.full((GRID, R, W), 1.000001, dtype) if dtype == jnp.float32 \
            else jnp.ones((GRID, R, W), dtype)
        s = jnp.full((1,), seed, jnp.int32)
        return pl.pallas_call(
            kernel,
            grid=(GRID,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, R, W), lambda g: (g, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, R, W), lambda g: (g, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((GRID, R, W), dtype),
        )(s, x)

    def run(dep):
        seed = jax.lax.convert_element_type(dep, jnp.int32)
        out = launch(seed)
        return out[0, 0, 0].astype(jnp.float32)

    dt = _timed(run)
    total_ops = GRID * R * W * K * UNROLL * ops_per_elem_iter
    print(f"{name:28s} {dt*1e3:8.3f} ms  -> {total_ops/dt/1e12:7.3f} Top/s",
          flush=True)
    return total_ops / dt


def bench_hbm():
    n_mb = 256
    elems = n_mb * 1024 * 1024 // 4
    base = jnp.arange(elems, dtype=jnp.float32)

    def run(dep):
        # x + dep forces a full HBM read of `base` and write of the
        # result (x*1 gets simplified away; a constant fill gets
        # folded); the middle-element fetch forces materialization
        y = base + dep
        return y[elems // 2]

    dt = _timed(run, n=8, repeats=3)
    bw = 2 * n_mb / 1024 / dt  # read + write GB
    print(f"{'HBM rw bandwidth':28s} {dt*1e3:8.3f} ms  -> {bw:7.1f} GB/s",
          flush=True)


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    # f32 FMA-shaped: x = x * a + b  (2 ops)
    _bench_elementwise(
        "f32 mul+add", jnp.float32,
        lambda x, i: x * jnp.float32(1.000001) + jnp.float32(1e-7), 2)
    # i32 add (1 op)
    _bench_elementwise(
        "i32 add", jnp.int32, lambda x, i: x + 3, 1)
    # i16 add (1 op) — measured SLOWER than i32 (1.47 vs 4.52 Top/s):
    # no sub-word packing win on this chip; i8 vectors are unsupported
    # by Mosaic ("Only vector<i16> and vector<i32> are supported")
    _bench_elementwise(
        "i16 add", jnp.int16, lambda x, i: x + jnp.int16(3), 1)
    # detail-op pattern: f32 compare -> i32 where-add, counted as 2 ops
    def detail_op(x, i):
        cond = x >= jnp.float32(0.5)
        return x + jnp.where(cond, jnp.float32(1e-7), jnp.float32(-1e-7))
    _bench_elementwise("f32 cmp+select+add", jnp.float32, detail_op, 3)
    bench_hbm()

    # ---- modeled op counts for the headline batch ------------------------
    b, s, seg_chunk, h, w = 94, 64, 16, 256, 256
    n_chunks = s // seg_chunk
    strips = h // 128
    # phase A per (chunk, strip): ~(C,R)-shaped f32 ops; with exact
    # div/sqrt: 3 div_cr (~9 ops each) + 1 sqrt_cr (~14) + ~30 arith
    phase_a_ops = b * n_chunks * strips * seg_chunk * 128 * (3 * 9 + 14 + 30)
    # phase B detail per (chunk, strip, in-tile tile): 2 slots x C x
    # (R x TILE_W) x (1 cmp + 1 select + 1 add)
    tiles = w // 128
    phase_b_ops = b * n_chunks * strips * tiles * 2 * seg_chunk * 128 * 128 * 3
    print(f"\nmodel: phase A ~{phase_a_ops/1e9:.2f} Gop, "
          f"phase B (all tiles live) ~{phase_b_ops/1e9:.2f} Gop "
          f"for the 94-glyph 256px headline batch", flush=True)


if __name__ == "__main__":
    main()
