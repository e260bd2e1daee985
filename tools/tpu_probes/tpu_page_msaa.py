"""Device A/B: 2x2-MSAA direct page via 4 single-sample passes
(shipped) vs 2 fused x-pair launches (winding_page_msaa_batch).

Checks bit parity of the final MSAA page (which requires every
per-sample winding plane to match), then times whole frames with the
page-probe zoom-loop protocol (numbers incl ~33 ms tunnel RTT, like
every page figure in docs/RESULTS.md)."""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from benchmarks.harness import setup_cache

setup_cache()

import jax
import jax.numpy as jnp

from fontrx.engine.raster import RasterEngine
from fontrx.font.font import Font
from fontrx.kernels.coverage import sample_offsets
from fontrx.kernels.winding_page import (
    winding_page_batch,
    winding_page_msaa_batch,
)
from fontrx.scene.layout import layout_text
from fontrx.scene.page import PageRenderer
from fontrx.scene.transform import ViewTransform

DEJAVU = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"
OFFS = sample_offsets(2)
OYS = sorted(set(float(o[1]) for o in OFFS))
OXS = {oy: tuple(sorted(float(o[0]) for o in OFFS if float(o[1]) == oy))
       for oy in OYS}


def run(w, h, instances, zoom):
    font = Font.open(DEJAVU)
    line = "The quick brown fox jumps over the lazy dog. 0123456789 "
    n_lines = max(1, instances // len(line))
    text = "\n".join(line for _ in range(n_lines))
    layout = layout_text(font, text)
    base_view = ViewTransform.init(font.info.units_per_em, w, h).zoomed(
        zoom, (0.0, 0.0))
    pr = PageRenderer(font, layout, w, h, RasterEngine())
    slots, _ = layout.instance_arrays()
    live = int(np.asarray(layout.batch.seg_counts)[slots].sum())
    print(f"--- {w}x{h}, {len(layout.instances)} inst, {live} live segs",
          flush=True)
    flat_segments, seg_inst_idx = pr._compact_instances(slots)
    ph = ((h + 127) // 128) * 128
    pw = ((w + 127) // 128) * 128
    tw = 256 if pw % 256 == 0 else 128

    @functools.partial(jax.jit, static_argnames=("fused",))
    def msaa_frame(xs, s_px, fused=False):
        o = xs[seg_inst_idx]
        flat = (flat_segments * s_px + o[:, None, :])[None]
        args = (flat, jnp.zeros(1, jnp.int32),
                jnp.full(1, h - 1, jnp.int32), jnp.float32(1.0))
        if fused:
            acc = None
            for oy in OYS:
                wd = winding_page_msaa_batch(
                    *args, height=ph, width=pw, exact=False,
                    sample_oy=oy, sample_oxs=OXS[oy],
                    seg_chunk=32, tile_w=tw)
                f = jnp.where(wd[0, :, :h, :w] != 0, 255, 0).astype(
                    jnp.uint16).sum(axis=0)
                acc = f if acc is None else acc + f
        else:
            acc = None
            for ox, oy in OFFS:
                wd = winding_page_batch(
                    *args, height=ph, width=pw, exact=False,
                    sample_offset=(float(ox), float(oy)),
                    seg_chunk=32, tile_w=tw, dynamic_tiles=True)
                f = jnp.where(wd[0, :h, :w] != 0, 255, 0).astype(
                    jnp.uint16)
                acc = f if acc is None else acc + f
        return (acc // 4).astype(jnp.uint8)

    def frame_xs(view):
        em = np.asarray(layout.instance_arrays()[1]).astype(np.float64)
        ndc_x = em[:, 0] * view.scale[0] + view.offset[0]
        ndc_y = (em[:, 1] * view.scale[1] + view.offset[1]) \
            * view.aspect_ratio
        xs = np.empty((len(slots), 2), np.float32)
        xs[:, 0] = (ndc_x + 1.0) / 2.0 * w
        xs[:, 1] = (ndc_y + 1.0) / 2.0 * h
        return jnp.asarray(xs), np.float32(view.scale[0] * (w / 2.0))

    xs, s_px = frame_xs(base_view)
    p4 = np.asarray(msaa_frame(xs, s_px, fused=False))
    p2 = np.asarray(msaa_frame(xs, s_px, fused=True))
    mism = int((p4 != p2).sum())
    print(f"  parity mismatch px: {mism}   ink {int((p4 != 0).sum())}",
          flush=True)

    n = 5
    for name, fused in (("4-pass", False), ("fused-pair", True)):
        best = None
        for _ in range(3):
            view = base_view
            t0 = time.perf_counter()
            for _ in range(n):
                view = view.zoomed(0.01, (0.0, 0.0))
                xs, s_px = frame_xs(view)
                p = msaa_frame(xs, s_px, fused=fused)
                float(p[0, 0])
            dt = (time.perf_counter() - t0) / n
            best = dt if best is None else min(best, dt)
        print(f"  {name:10s} {best*1e3:8.2f} ms/frame", flush=True)


run(1920, 1080, 1100, -4.0)
run(3840, 2160, 10000, -8.0)
print("DONE", flush=True)
