"""Production-scale stress benchmark: the ENTIRE font as a bucketed
atlas, plus a 10k-instance page — the scales the framework is built
for.  Run: ``python -m benchmarks.stress``"""

from __future__ import annotations

import sys
import time

import numpy as np

from benchmarks.harness import DEJAVU, emit

_SEED = [700]  # unique chain seeds (see bench.py timing notes)


def full_font_atlas(size: int = 64):
    """Every glyph in DejaVu Sans (6k+), bucketed by segment capacity,
    rastered bucket-by-bucket."""
    import jax
    import jax.numpy as jnp

    from fontrx.engine.raster import RasterEngine
    from fontrx.font.font import Font
    from fontrx.kernels.grid import RasterGrid
    from fontrx.pack.segments import pack_glyphs_bucketed

    font = Font.open(DEJAVU)
    glyphs = [font.load_glyph_safe(i) for i in range(font.num_glyphs)]
    glyphs = [g for g in glyphs if g.num_segments]
    buckets = pack_glyphs_bucketed(glyphs)
    eng = RasterEngine()

    total = 0
    t_total = 0.0
    for batch, idxs in buckets:
        grids = [
            RasterGrid.fixed_tile(tuple(b), size, font.info.units_per_em, size)
            for b in np.asarray(batch.boxes)
        ]
        segs = jnp.asarray(batch.segments)
        my = jnp.array([g.max_y for g in grids], jnp.int32)
        mx0 = np.array([g.min_x for g in grids], np.int32)
        sc = jnp.float32(grids[0].scale)

        @jax.jit
        def chained_step(segs, mx, my, dep, _h=size):
            mx = mx + (jnp.abs(dep) >> 30)
            out = eng.winding_batch(segs, mx, my, sc, height=_h, width=_h)
            # dep%1009 threads the seed through every step so no step's
            # inputs ever repeat across chains — repeated identical
            # executions are memoized upstream of the device and read
            # as fake throughput (see bench.py).
            # sum over [:, 0, 0], NOT [0, 0, 0]: batches above
            # MAX_KERNEL_BATCH split into concatenated sub-launches and
            # a single-scalar read lets XLA dead-code-eliminate every
            # launch but the first (observed round 2: a fake 688k g/s
            # full-font figure — and round 1's 319k had the same hole)
            return jnp.sum(out[:, 0, 0]) + dep % 1009

        variants = [jnp.asarray(mx0 + i) for i in range(4)]

        def chained(n):
            _SEED[0] += 1
            prev = jnp.int32(_SEED[0] << 8)
            t0 = time.perf_counter()
            for i in range(n):
                prev = chained_step(segs, variants[(i + _SEED[0]) % 4], my, prev)
            float(prev)
            return time.perf_counter() - t0

        chained(2)  # compile + warm
        # tiny buckets run in ~tens of us — chain enough steps that the
        # measured delta clears host-timer + RTT-subtraction noise
        # (round-2 runs printed impossible 9e9 g/s for 3-glyph buckets)
        n = max(4, min(64, 4096 // max(len(batch), 1)))
        rtt = min(chained(1) for _ in range(2))
        t_chain = min(chained(n) for _ in range(2))
        dt = max(t_chain - rtt, 1e-9) / (n - 1)
        floored = dt < 20e-6
        dt = max(dt, 20e-6)
        t_total += dt
        total += len(batch)
        emit("stress-bucket", f"cap={batch.capacity} glyphs/s {size}px",
             len(batch) / dt, "glyphs/s", batch=len(batch),
             ms=round(dt * 1e3, 3),
             **({"floored_at_20us": True} if floored else {}))
    emit("stress-full-font", f"glyphs/s {size}px full-font atlas",
         total / t_total, "glyphs/s", glyphs=total,
         ms_total=round(t_total * 1e3, 1))


def big_page(instances: int = 10000):
    """A 10k-instance 4K page through the direct raster path."""
    from fontrx.engine.raster import RasterEngine
    from fontrx.font.font import Font
    from fontrx.scene.layout import layout_text
    from fontrx.scene.page import PageRenderer
    from fontrx.scene.transform import ViewTransform

    font = Font.open(DEJAVU)
    line = "The quick brown fox jumps over the lazy dog. 0123456789 "
    n_lines = max(1, instances // len(line))
    text = "\n".join(line for _ in range(n_lines))
    w, h = 3840, 2160
    layout = layout_text(font, text)
    pr = PageRenderer(font, layout, w, h, RasterEngine())
    view = ViewTransform.init(font.info.units_per_em, w, h)
    # zoom out to fit many lines
    view = view.zoomed(-8.0, (0.0, 0.0))

    page = pr.render_direct(view)
    float(page[0, 0])  # compile + first frame
    import jax
    import jax.numpy as jnp

    n = 5
    t0 = time.perf_counter()
    for i in range(n):
        # every frame's view is unique (accumulating zoom), so no
        # dispatch can be served from the tunnel's execution memo
        v = view.zoomed(0.01 * (i + 1), (0.0, 0.0))
        p = pr.render_direct(v)
        float(p[0, 0])
    dt = (time.perf_counter() - t0) / n
    # per-frame scalar-fetch RTT baseline (dev-tunnel artifact; a
    # colocated host pipelines frames and pays none of this)
    triv = jax.jit(lambda x: x * 2)
    float(triv(jnp.float32(1.0)))
    t0 = time.perf_counter()
    for i in range(10):
        float(triv(jnp.float32(100.0 + i)))
    rtt = (time.perf_counter() - t0) / 10
    slots, _ = layout.instance_arrays()
    live_segments = int(np.asarray(layout.batch.seg_counts)[slots].sum())
    emit("stress-4k-page", "ms/frame 4K page re-raster", dt * 1e3, "ms",
         instances=len(layout.instances), live_segments=live_segments,
         rtt_ms=round(rtt * 1e3, 2),
         device_ms_rtt_corrected=round(max(dt - rtt, 0.0) * 1e3, 2))


def main(argv):
    which = argv[1:] or ["atlas", "page"]
    if "atlas" in which:
        full_font_atlas()
    if "page" in which:
        big_page()


if __name__ == "__main__":
    main(sys.argv)
