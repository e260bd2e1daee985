"""A/B row-banded strips vs plain 128-row strips on the CJK-regime
winding atlas (1000 x 288-seg glyphs @64px/@32px)."""

import sys

sys.path.insert(0, "/root/repo")

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from benchmarks.cjk import make_batch, _chained_timer
from fontrx.kernels.winding_pallas_v2 import (
    winding_pallas_banded_batch,
    winding_pallas_v2_batch,
)

UPEM = 2048


def main():
    b = 1000
    segs = make_batch(b, 288)
    d_segs = jnp.asarray(segs)

    for size in (64, 32):
        scale = np.float32(size / UPEM)
        d_my = jnp.asarray(np.full(b, size - 1, np.int32))
        d_var = jnp.stack([jnp.full(b, i, jnp.int32) for i in range(4)])

        def fn_plain(mx, scale=scale, d_my=d_my):
            return winding_pallas_v2_batch(
                d_segs, mx, d_my, jnp.float32(scale), height=128,
                width=128, exact=True, guard=True,
            )

        dt = _chained_timer(fn_plain, d_var, n_iter=12, repeats=4)
        print(f"{size}px plain   {dt*1e3:8.2f} ms -> {b/dt:8.0f} g/s",
              flush=True)

        # banded: k glyphs share each strip, each with its own band
        k = 128 // size
        be = b // k
        n, s = segs.shape[0], segs.shape[1]
        bseg = segs.reshape(be, k * s, 3, 2)
        owners = np.repeat(np.arange(k, dtype=np.int32)[None, :], be, 0)
        owners = np.repeat(owners, s, axis=1)
        d_bseg = jnp.asarray(bseg)
        d_own = jnp.asarray(owners)
        bmy = jnp.asarray(np.full((k, be), size - 1, np.int32))

        def fn_band(mx, scale=scale, bmy=bmy):
            bmx = jnp.broadcast_to(mx[:be][None, :], (k, be))
            return winding_pallas_banded_batch(
                d_bseg, d_own, bmx, bmy, jnp.float32(scale),
                width=128, row_bands=k, exact=True, guard=True,
            )

        dtb = _chained_timer(fn_band, d_var, n_iter=12, repeats=4)
        print(f"{size}px banded  {dtb*1e3:8.2f} ms -> {b/dtb:8.0f} g/s "
              f"({dt/dtb:.2f}x)", flush=True)

        # equality check: band k of element e == plain glyph e*k+k
        plain = np.asarray(fn_plain(d_var[0]))[:, :size, :size]
        band = np.asarray(fn_band(d_var[0]))
        band = band.reshape(be * k, size, 128)[:, :, :size]
        print(f"  mismatch: {int((plain != band).sum())}", flush=True)


if __name__ == "__main__":
    main()
