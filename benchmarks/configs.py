"""The five BASELINE benchmark configs (see harness.py).

Run all: ``python -m benchmarks.configs``
Run one: ``python -m benchmarks.configs 3``
"""

from __future__ import annotations

import sys

import numpy as np

from benchmarks.harness import DEJAVU, emit, setup_cache, timeit


def config1_single_glyph():
    """Single glyph 'A' 256x256 nonzero-winding fill -> QOI, with
    CPU-oracle parity check."""
    import jax.numpy as jnp

    from fontrx.engine.raster import RasterEngine
    from fontrx.font.font import Font
    from fontrx.io.qoi import encode_rgb
    from fontrx.kernels import oracle
    from fontrx.kernels.grid import RasterGrid
    from fontrx.pack.segments import glyph_segments

    font = Font.open(DEJAVU)
    g, _ = font.get_glyph("A")
    segs = glyph_segments(g)
    grid = RasterGrid.for_glyph_box(
        (g.box.x_min, g.box.y_min, g.box.x_max, g.box.y_max),
        256, font.info.units_per_em,
    )
    eng = RasterEngine()
    from fontrx.kernels.grid import RasterGrid as RG

    def step(i=0):
        # vary the grid anchor to defeat upstream dispatch memoization
        g2 = RG(grid.width, grid.height, grid.min_x, grid.max_y + i,
                grid.scale)
        w = eng.winding_glyph(segs, g2)
        float(w[0, 0])  # force materialization
        return w

    for i in range(1, 4):
        step(i)
    w = np.asarray(step(0))
    wo = oracle.winding_map(segs, grid)
    mism = int((w != wo).sum())
    qoi = encode_rgb(np.repeat(
        np.where(w != 0, 255, 0).astype(np.uint8)[:, :, None], 3, axis=2))
    dt = timeit(step)
    emit("1-single-glyph", "ms per 256px glyph raster", dt * 1e3, "ms",
         mismatched_pixels=mism, total_pixels=int(wo.size), qoi_bytes=len(qoi))


def config2_hello_world_msaa(fused: bool | None = None):
    """'Hello, World!' 64px glyphs with 4x (2x2) supersampled coverage.

    Device time is measured with the bench.py chained-unique-seed
    protocol: n coverage rasters chained on-device inside ONE dispatch
    (each step's anchors depend on the previous step's output, so
    nothing can be elided/memoized), one scalar fetch at the end;
    RTT/dispatch is measured with a 1-step chain and subtracted.
    """
    import time
    from functools import partial

    import jax
    import jax.numpy as jnp

    from fontrx.engine.raster import RasterEngine
    from fontrx.font.font import Font
    from fontrx.kernels.grid import RasterGrid
    from fontrx.scene.layout import layout_text

    font = Font.open(DEJAVU)
    layout = layout_text(font, "Hello, World!")
    grids = [
        RasterGrid.fixed_tile(tuple(b), 64, font.info.units_per_em, 64)
        for b in np.asarray(layout.batch.boxes)
    ]
    d_segs = jnp.asarray(layout.batch.segments)
    min_x = np.array([g.min_x for g in grids], np.int32)
    d_var_stack = jnp.stack([jnp.asarray(min_x + i) for i in range(4)])
    d_max_y = jnp.asarray(np.array([g.max_y for g in grids], np.int32))
    scale = jnp.float32(grids[0].scale)
    eng = RasterEngine(
        backend="jnp" if jax.default_backend() != "tpu" else "auto"
    )

    @partial(jax.jit, static_argnames="n")
    def chain_n(segs, var_stack, my, seed, n):
        # dep is a float32 coverage scalar in [0, 1]; floor+cast keeps
        # the data dependence while contributing 0 to the anchors, and
        # + seed%1009 keeps every step's input distinct across runs
        def body(i, dep):
            bump = jax.lax.convert_element_type(
                jnp.floor(jnp.abs(dep)), jnp.int32
            ) >> 30
            mx = var_stack[i % 4] + bump
            c = eng.coverage_batch(
                segs, mx, my, scale, height=64, width=64, samples=2,
                fused=fused,
            )
            return c[0, 0, 0] + jnp.float32(dep % 7.0)

        return jax.lax.fori_loop(0, n, body, jnp.float32(seed))

    call_counter = [100]

    def chained(n):
        call_counter[0] += 1
        t0 = time.perf_counter()
        float(chain_n(d_segs, d_var_stack, d_max_y, call_counter[0], n))
        return time.perf_counter() - t0

    n_iter = 40
    chained(1), chained(n_iter)  # compile-warm both loop bounds
    rtt = min(chained(1) for _ in range(5))
    total = min(chained(n_iter) for _ in range(5))
    dt = max(total - rtt, 1e-9) / (n_iter - 1)
    n = len(layout.batch)
    emit("2-hello-msaa", "glyphs/s 64px 4xMSAA coverage (device)",
         n / dt, "glyphs/s",
         ms_per_line_device=round(dt * 1e3, 3),
         rtt_ms=round(rtt * 1e3, 2),
         # 64px tiles pad to one 128-wide strip -> the engine heuristic
         # engine auto-routing (round 3: dense multipass for small
         # tiles) when fused is None; explicit strategy otherwise
         kernel=("engine-auto" if fused is None
                 else "fused" if fused else "multipass-v2")
         if eng._resolve() == "pallas" else "jnp",
         unique_glyphs=n, instances=len(layout.instances))


def config3_ascii_atlas():
    """Full printable-ASCII atlas @128px, triangulation-equivalent fill."""
    import jax.numpy as jnp

    from fontrx.font.font import Font
    from fontrx.geometry import TriangulatedGlyph
    from fontrx.kernels.grid import RasterGrid
    from fontrx.kernels.loopblinn import (
        _pack_triangle_arrays,
        loopblinn_batch,
        loopblinn_pallas_batch,
        pad_triangles,
    )

    font = Font.open(DEJAVU)
    chars = [chr(c) for c in range(33, 127)]
    tgs = [TriangulatedGlyph.from_glyph(font.get_glyph(c)[0]) for c in chars]
    cap = max(len(t.triangles) for t in tgs)
    tris = np.zeros((len(tgs), cap, 3, 4), np.float32)
    cls = np.full((len(tgs), cap), 3, np.int32)
    boxes = []
    for i, (c, tg) in enumerate(zip(chars, tgs)):
        packed, pc = pad_triangles(_pack_triangle_arrays(tg), tg.classes, cap)
        tris[i] = packed
        cls[i] = pc
        g, _ = font.get_glyph(c)
        boxes.append((g.box.x_min, g.box.y_min, g.box.x_max, g.box.y_max))
    grids = [
        RasterGrid.fixed_tile(b, 128, font.info.units_per_em, 128)
        for b in boxes
    ]
    args = (
        jnp.asarray(tris), jnp.asarray(cls),
        jnp.array([g.min_x for g in grids], jnp.int32),
        jnp.array([g.max_y for g in grids], jnp.int32),
        jnp.float32(grids[0].scale),
    )

    import jax

    d_var = jnp.stack([args[2] + i for i in range(4)])
    use_pallas = jax.default_backend() == "tpu"

    # Pallas kernel with per-(chunk, tile) bbox culling on TPU
    # (coverage-identical to the jnp kernel: test_modes.py); chained
    # unique-seed RTT-corrected timing (the earlier per-step host fetch
    # charged every atlas a ~33 ms tunnel round trip)
    def fn(mx):
        kern = loopblinn_pallas_batch if use_pallas else loopblinn_batch
        return kern(
            args[0], args[1], mx, args[3], args[4], height=128, width=128,
        ).astype(jnp.int32)

    from benchmarks.cjk import _chained_timer

    dt = _chained_timer(fn, d_var, n_iter=12 if use_pallas else 2,
                        repeats=4 if use_pallas else 1)
    emit("3-ascii-triangulation", "glyphs/s 128px triangle fill",
         len(tgs) / dt, "glyphs/s", ms_per_atlas=round(dt * 1e3, 3),
         kernel="pallas-bbox-cull" if use_pallas else "jnp")


def config4_sdf_atlas(n_glyphs: int = 1000, size: int = 32):
    """SDF atlas for 1000 glyphs (CJK-scale batch; DejaVu has no CJK so
    the first 1000 non-empty glyph indices stand in — same shapes/work)."""
    import jax
    import jax.numpy as jnp

    from fontrx.font.font import Font
    from fontrx.kernels.grid import RasterGrid
    from fontrx.kernels.sdf import sdf_batch, sdf_to_u8
    from fontrx.kernels.sdf_pallas import sdf_pallas_batch
    from fontrx.pack.segments import pack_glyphs

    font = Font.open(DEJAVU)
    glyphs = []
    idx = 1
    while len(glyphs) < n_glyphs and idx < font.num_glyphs:
        g = font.load_glyph_safe(idx)
        if g.num_segments:
            glyphs.append(g)
        idx += 1
    batch = pack_glyphs(glyphs)
    grids = [
        RasterGrid.fixed_tile(tuple(b), size, font.info.units_per_em, size)
        for b in np.asarray(batch.boxes)
    ]
    args = (
        jnp.asarray(batch.segments),
        jnp.array([g.min_x for g in grids], jnp.int32),
        jnp.array([g.max_y for g in grids], jnp.int32),
        jnp.float32(grids[0].scale),
    )

    use_pallas = jax.default_backend() == "tpu"
    d_var = jnp.stack([args[1] + i for i in range(4)])
    if use_pallas:
        # PRODUCTION dispatch (engine.sdf_batch): tiled band-culled
        # kernel in the dense regime (capacity >= 128, size >= 64),
        # flat-pixel mode elsewhere — both bit-identical; x_slack
        # covers the chained protocol's jittered anchors so ONE host
        # packing serves every chained launch
        from fontrx.engine.raster import RasterEngine

        engine = RasterEngine()
        host_segs = np.asarray(batch.segments)
        host_mx = np.array([g.min_x for g in grids], np.int32)
        host_my = np.array([g.max_y for g in grids], np.int32)
        pack = engine.pack_sdf(
            host_segs, host_mx, host_my, float(grids[0].scale),
            height=size, width=size, x_slack_px=4.0,
        )

        def fn(mx):
            return sdf_to_u8(engine.sdf_batch(
                host_segs, mx, host_my, float(grids[0].scale),
                height=size, width=size, pack=pack,
            ))
    else:

        def fn(mx):
            return sdf_to_u8(sdf_batch(
                args[0], mx, args[2], args[3], height=size, width=size,
            ))

    # chained-unique-seed, RTT-corrected device time (bench.py protocol;
    # the earlier per-step host-fetch timing charged every atlas a
    # ~33 ms tunnel round trip)
    from benchmarks.cjk import _chained_timer

    dt = _chained_timer(fn, d_var, n_iter=12 if use_pallas else 2,
                        repeats=4 if use_pallas else 1)
    emit("4-sdf-atlas", f"glyphs/s {size}px SDF", len(glyphs) / dt,
         "glyphs/s", ms_per_atlas=round(dt * 1e3, 2),
         batch=len(glyphs), seg_capacity=batch.capacity,
         kernel="pallas-flat" if use_pallas else "jnp")


def config5_interactive_page():
    """Interactive 1920x1080 text page: per-frame zoom/pan re-raster."""
    from fontrx.engine.raster import RasterEngine
    from fontrx.font.font import Font
    from fontrx.scene.interactive import InteractiveSession

    font = Font.open(DEJAVU)
    text = "\n".join(
        "The quick brown fox jumps over the lazy dog 0123456789"
        for _ in range(20)
    )
    sess = InteractiveSession(font, text, 1920, 1080, RasterEngine())
    sess.frame()  # compile + first raster
    # alternating zoom/pan event stream, 30 frames
    for i in range(30):
        if i % 3 == 0:
            sess.scroll(0.5 if i % 2 else -0.5, (0.1, 0.1))
        else:
            sess.drag(0.01, 0.005)
        sess.frame()
    stats = sess.stats()
    # per-frame scalar-fetch RTT baseline (the dev tunnel adds ~30 ms
    # per forced materialization; production-local TPUs do not)
    import time

    import jax
    import jax.numpy as jnp

    triv = jax.jit(lambda x: x * 2)
    float(triv(jnp.float32(1.0)))
    t0 = time.perf_counter()
    for i in range(10):
        float(triv(jnp.float32(i)))
    rtt_ms = (time.perf_counter() - t0) / 10 * 1e3
    emit("5-interactive-1080p", "ms/frame 1080p zoom-pan (raster only)",
         stats["compute_ms"], "ms",
         compute_fps=round(stats["compute_fps"], 1),
         rtt_ms=round(rtt_ms, 2),
         device_ms_rtt_corrected=round(max(stats["compute_ms"] - rtt_ms, 0.0), 2),
         with_host_fetch_ms=round(stats["mean_ms"], 2),
         p99_ms=round(stats["p99_ms"], 2), frames=stats["frames"])


def config4_both_sizes():
    """BASELINE config 4 calls for 1000 CJK glyphs at 32px and 64px.
    DejaVu has no CJK, so this runs twice: DejaVu stand-ins (same
    shapes, 10-60 segs/glyph) and the synthetic CJK-regime batch
    (288 segs/glyph, ``benchmarks/cjk.py``)."""
    config4_sdf_atlas(n_glyphs=1000, size=32)
    config4_sdf_atlas(n_glyphs=1000, size=64)
    from benchmarks.cjk import sdf_atlas as cjk_sdf

    cjk_sdf(b=1000, n_segments=288)


ALL = {
    "1": config1_single_glyph,
    "2": config2_hello_world_msaa,
    "2f": lambda: config2_hello_world_msaa(fused=True),
    "3": config3_ascii_atlas,
    "4": config4_both_sizes,
    "5": config5_interactive_page,
}


def main(argv):
    setup_cache()
    which = argv[1:] or list(ALL)
    for k in which:
        ALL[k]()


if __name__ == "__main__":
    main(sys.argv)
