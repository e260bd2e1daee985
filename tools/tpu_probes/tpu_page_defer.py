"""A/B the deferred-carry page kernel (winding_page.py) against the
shipped v2 page path on the REAL 4K/1080p text pages; device
bit-compare included."""

import sys

sys.path.insert(0, "/root/repo")

import time

import numpy as np

from benchmarks.harness import setup_cache

setup_cache()

import jax.numpy as jnp

from fontrx.engine.raster import RasterEngine
from fontrx.font.font import Font
from fontrx.kernels.winding_page import winding_page_batch
from fontrx.scene.layout import layout_text
from fontrx.scene.page import PageRenderer
from fontrx.scene.transform import ViewTransform

DEJAVU = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"


def run(w, h, instances, zoom):
    font = Font.open(DEJAVU)
    line = "The quick brown fox jumps over the lazy dog. 0123456789 "
    n_lines = max(1, instances // len(line))
    text = "\n".join(line for _ in range(n_lines))
    layout = layout_text(font, text)
    base_view = ViewTransform.init(font.info.units_per_em, w, h).zoomed(
        zoom, (0.0, 0.0))
    pr = PageRenderer(font, layout, w, h, RasterEngine(),
                      kernel_tuning=(0, 16, 128, 8))
    slots, _ = layout.instance_arrays()
    live = int(np.asarray(layout.batch.seg_counts)[slots].sum())
    print(f"--- {w}x{h}, {len(layout.instances)} inst, {live} live segs",
          flush=True)

    # shipped path timing + reference page
    view = base_view
    ref = np.asarray(pr.render_direct(view))
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        view = view.zoomed(0.01, (0.0, 0.0))
        p = pr.render_direct(view)
        float(p[0, 0])
    print(f"  shipped rw8      {(time.perf_counter()-t0)/n*1e3:8.2f} ms",
          flush=True)

    # deferred-carry path: same transform, one launch
    import functools

    import jax

    @functools.partial(jax.jit,
                       static_argnames=("ph", "pw", "sc", "tw", "dyn"))
    def defer_step(flat_segments, seg_inst_idx, offs, s_px, ph, pw,
                   sc, tw, dyn=False):
        o = offs[seg_inst_idx]
        flat = (flat_segments * s_px + o[:, None, :])[None]
        wd = winding_page_batch(
            flat, jnp.zeros(1, jnp.int32),
            jnp.full(1, h - 1, jnp.int32), jnp.float32(1.0),
            height=ph, width=pw, exact=False, seg_chunk=sc, tile_w=tw,
            dynamic_tiles=dyn,
        )
        return jnp.where(wd[0, :h, :w] != 0, 255, 0).astype(jnp.uint8)

    flat_segments, seg_inst_idx = pr._compact_instances(slots)
    ph = ((h + 127) // 128) * 128
    pw = ((w + 127) // 128) * 128

    variants = [("dyn sc32 tw256", 32, 256, True),
                ("dyn sc32 tw128", 32, 128, True),
                ("dyn sc16 tw256", 16, 256, True),
                ("static sc32 tw256", 32, 256, False)]
    if pw % 256:
        variants = [(n_, s_, 128, d_) for n_, s_, _, d_ in variants]
    for name, sc, tw, dyn in variants:
        view = base_view
        em = np.asarray(layout.instance_arrays()[1]).astype(np.float64)
        ndc_x = em[:, 0] * view.scale[0] + view.offset[0]
        ndc_y = (em[:, 1] * view.scale[1] + view.offset[1]) * view.aspect_ratio
        xs = np.empty((len(slots), 2), np.float32)
        xs[:, 0] = (ndc_x + 1.0) / 2.0 * w
        xs[:, 1] = (ndc_y + 1.0) / 2.0 * h
        s_px = np.float32(view.scale[0] * (w / 2.0))
        p = defer_step(flat_segments, seg_inst_idx, jnp.asarray(xs),
                       s_px, ph, pw, sc, tw, dyn)
        mism = int((np.asarray(p) != ref).sum())
        t0 = time.perf_counter()
        for _ in range(n):
            view = view.zoomed(0.01, (0.0, 0.0))
            em = np.asarray(layout.instance_arrays()[1]).astype(np.float64)
            ndc_x = em[:, 0] * view.scale[0] + view.offset[0]
            ndc_y = (em[:, 1] * view.scale[1] + view.offset[1]) \
                * view.aspect_ratio
            xs = np.empty((len(slots), 2), np.float32)
            xs[:, 0] = (ndc_x + 1.0) / 2.0 * w
            xs[:, 1] = (ndc_y + 1.0) / 2.0 * h
            s_px = np.float32(view.scale[0] * (w / 2.0))
            p = defer_step(flat_segments, seg_inst_idx, jnp.asarray(xs),
                           s_px, ph, pw, sc, tw, dyn)
            float(p[0, 0])
        dt = (time.perf_counter() - t0) / n
        print(f"  {name:16s} {dt*1e3:8.2f} ms  mismatch={mism}",
              flush=True)


run(3840, 2160, 10000, -8.0)
run(1920, 1080, 1100, -4.0)
print("DONE", flush=True)
