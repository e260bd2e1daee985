"""Kernel conformance: jnp and Pallas (interpret) backends vs the NumPy
oracle, bit-exact (SURVEY §4 items 2/4)."""

import numpy as np
import pytest

from fontrx.kernels import oracle
from fontrx.kernels.grid import RasterGrid
from fontrx.pack.segments import glyph_segments, pack_glyphs


def glyph_case(font, ch, size):
    g, _ = font.get_glyph(ch)
    segs = glyph_segments(g)
    grid = RasterGrid.for_glyph_box(
        (g.box.x_min, g.box.y_min, g.box.x_max, g.box.y_max),
        size, font.info.units_per_em,
    )
    return segs, grid


class TestJnpKernel:
    @pytest.mark.parametrize("ch", list("AQg@j&"))
    def test_bitexact_vs_oracle(self, dejavu, ch):
        from fontrx.kernels.winding_jnp import winding_grid

        segs, grid = glyph_case(dejavu, ch, 96)
        wo = oracle.winding_map(segs, grid)
        wj = np.asarray(winding_grid(segs, grid))
        np.testing.assert_array_equal(wo, wj)

    def test_batch_matches_singles(self, dejavu):
        from fontrx.kernels.winding_jnp import winding_batch

        import jax.numpy as jnp

        glyphs = [dejavu.get_glyph(c)[0] for c in "ABC"]
        batch = pack_glyphs(glyphs)
        grids = [
            RasterGrid.fixed_tile(tuple(b), 64, 2048, 64) for b in batch.boxes
        ]
        out = np.asarray(
            winding_batch(
                jnp.asarray(batch.segments),
                jnp.array([g.min_x for g in grids], jnp.int32),
                jnp.array([g.max_y for g in grids], jnp.int32),
                jnp.float32(grids[0].scale),
                height=64,
                width=64,
            )
        )
        for i, g in enumerate(grids):
            xs, ys = g.sample_coords()
            wo = oracle.winding_at(batch.segments[i], xs[None, :], ys[:, None])
            np.testing.assert_array_equal(out[i], wo)


class TestPallasInterpret:
    @pytest.mark.parametrize("ch", list("AQg"))
    def test_bitexact_vs_oracle(self, dejavu, ch):
        from fontrx.kernels.winding_pallas import winding_pallas_grid

        segs, grid = glyph_case(dejavu, ch, 64)
        wo = oracle.winding_map(segs, grid)
        wp = np.asarray(winding_pallas_grid(segs, grid, interpret=True))
        np.testing.assert_array_equal(wo, wp)

    def test_random_segment_soup(self, rng):
        """Pallas vs jnp on random quadratic soups (SURVEY §4 item 4)."""
        import jax.numpy as jnp

        from fontrx.kernels.winding_jnp import winding_batch
        from fontrx.kernels.winding_pallas import winding_pallas_batch

        b, s = 3, 16
        segs = rng.integers(-100, 100, (b, s, 3, 2)).astype(np.float32)
        min_x = rng.integers(-10, 10, b).astype(np.int32)
        max_y = rng.integers(50, 80, b).astype(np.int32)
        args = (jnp.asarray(segs), jnp.asarray(min_x), jnp.asarray(max_y),
                jnp.float32(0.7))
        wj = np.asarray(winding_batch(*args, height=64, width=128))
        wp = np.asarray(
            winding_pallas_batch(*args, height=64, width=128, interpret=True)
        )
        np.testing.assert_array_equal(wj, wp)


class TestEngine:
    def test_engine_dispatch_and_crop(self, dejavu):
        from fontrx.engine.raster import RasterEngine

        segs, grid = glyph_case(dejavu, "A", 48)
        eng = RasterEngine(backend="jnp")
        w = np.asarray(eng.winding_glyph(segs, grid))
        assert w.shape == (grid.height, grid.width)
        np.testing.assert_array_equal(w, oracle.winding_map(segs, grid))

    def test_fill_and_gray(self, dejavu):
        from fontrx.engine.raster import RasterEngine

        segs, grid = glyph_case(dejavu, "A", 48)
        eng = RasterEngine(backend="jnp")
        w = eng.winding_glyph(segs, grid)
        np.testing.assert_array_equal(
            np.asarray(eng.fill(w)), oracle.render_fill(segs, grid)
        )
        np.testing.assert_array_equal(
            np.asarray(eng.gray(w)), oracle.render_gray(segs, grid)
        )


class TestAtlas:
    def test_ascii_atlas(self, dejavu):
        from fontrx.engine.atlas import render_atlas
        from fontrx.engine.raster import RasterEngine

        sheet, layout = render_atlas(
            dejavu, "ABCDEFGHIJKLMNOP", 64, 64, RasterEngine(backend="jnp")
        )
        assert sheet.shape == (layout.height, layout.width)
        assert layout.cols * layout.rows >= 16
        # every glyph tile has ink
        for i in range(16):
            x0, y0 = layout.tile_origin(i)
            assert sheet[y0 : y0 + 64, x0 : x0 + 64].any(), chr(layout.chars[i])


class TestSharding:
    @pytest.mark.parametrize("use_pallas", [False, True])
    def test_virtual_8_device_mesh(self, dejavu, use_pallas):
        """Both the jnp kernel and the REAL pod composition —
        shard_map wrapping the Pallas kernel (interpret mode on the CPU
        mesh) — must produce oracle-exact shards."""
        import jax
        import jax.numpy as jnp

        from fontrx.engine.atlas import pack_charset
        from fontrx.engine.sharding import make_mesh, shard_batch, winding_sharded

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        batch = pack_charset(dejavu, "ABCDEFGH", pad_batch_to=8)
        grids = [
            RasterGrid.fixed_tile(tuple(b), 64, 2048, 64) for b in batch.boxes
        ]
        mesh = make_mesh()
        seg, mx, my = shard_batch(
            mesh,
            jnp.asarray(batch.segments),
            jnp.array([g.min_x for g in grids], jnp.int32),
            jnp.array([g.max_y for g in grids], jnp.int32),
        )
        out = winding_sharded(
            seg, mx, my, jnp.float32(grids[0].scale),
            height=64, width=128, mesh=mesh, use_pallas=use_pallas,
            interpret=use_pallas,
        )
        assert len(out.sharding.device_set) == 8
        out = np.asarray(out)
        for i, g in enumerate(grids):
            gg = RasterGrid(128, 64, g.min_x, g.max_y, g.scale)
            xs, ys = gg.sample_coords()
            wo = oracle.winding_at(batch.segments[i], xs[None, :], ys[:, None])
            np.testing.assert_array_equal(out[i], wo)


class TestGraftEntry:
    def test_entry_compiles(self):
        import jax
        import sys

        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge

        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert out.shape[0] == args[0].shape[0]

    def test_dryrun_multichip(self):
        import jax

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)


class TestSharding2D:
    @pytest.mark.parametrize("use_pallas", [False, True])
    def test_glyph_by_row_mesh(self, dejavu, use_pallas):
        import jax
        import jax.numpy as jnp

        from fontrx.engine.atlas import pack_charset
        from fontrx.engine.sharding import make_mesh_2d, winding_sharded_2d
        from fontrx.kernels import oracle

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        batch = pack_charset(dejavu, "ABCD")
        grids = [
            RasterGrid.fixed_tile(tuple(b), 128, 2048, 128) for b in batch.boxes
        ]
        mesh = make_mesh_2d(2, 4)
        out = winding_sharded_2d(
            jnp.asarray(batch.segments),
            jnp.array([g.min_x for g in grids], jnp.int32),
            jnp.array([g.max_y for g in grids], jnp.int32),
            jnp.float32(grids[0].scale),
            height=128, width=128, mesh=mesh, use_pallas=use_pallas,
            interpret=use_pallas,
        )
        assert len(out.sharding.device_set) == 8
        for i, g in enumerate(grids):
            xs, ys = g.sample_coords()
            np.testing.assert_array_equal(
                np.asarray(out[i]),
                oracle.winding_at(batch.segments[i], xs[None, :], ys[:, None]),
            )

    def test_page_raster_row_band_mesh(self, dejavu):
        """Config-5 scale-out shape: one page sharded over row bands."""
        import jax
        import jax.numpy as jnp

        from fontrx.engine.sharding import make_mesh_2d, winding_sharded_2d
        from fontrx.scene.layout import layout_text
        from fontrx.scene.transform import ViewTransform

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        layout = layout_text(dejavu, "ab")
        w, h = 256, 64
        view = ViewTransform.init(2048, w, h)
        slots, offs = layout.instance_arrays()
        s_px = np.float32(view.scale[0] * (w / 2.0))
        chunks = []
        for slot, (ex, ey) in zip(slots, offs):
            ndc = view.apply(float(ex), float(ey))
            off = np.array(
                [(ndc[0] + 1) / 2 * w, (ndc[1] + 1) / 2 * h], np.float32
            )
            n = layout.batch.seg_counts[slot]
            chunks.append(layout.batch.segments[slot][:n] * s_px + off)
        allsegs = np.concatenate(chunks).astype(np.float32)[None]
        mesh = make_mesh_2d(1, 8)
        out = winding_sharded_2d(
            jnp.asarray(allsegs), jnp.zeros(1, jnp.int32),
            jnp.full(1, h - 1, jnp.int32), jnp.float32(1.0),
            height=h, width=w, mesh=mesh, use_pallas=False,
        )
        assert len(out.sharding.device_set) == 8
        xs = np.arange(w, dtype=np.float32)
        ys = (h - 1 - np.arange(h)).astype(np.float32)
        wp = oracle.winding_at(allsegs[0], xs[None, :], ys[:, None])
        np.testing.assert_array_equal(np.asarray(out[0]), wp)


class TestBigBatchChunking:
    def test_batch_over_kernel_cap_matches(self, dejavu):
        """Batches beyond the SMEM-anchored kernel cap split into
        sub-launches transparently."""
        import jax.numpy as jnp

        from fontrx.engine import raster as raster_mod
        from fontrx.engine.raster import RasterEngine
        from fontrx.pack.segments import glyph_segments, pack_glyphs

        old = raster_mod.MAX_KERNEL_BATCH
        raster_mod.MAX_KERNEL_BATCH = 3
        try:
            glyphs = [dejavu.get_glyph(c)[0] for c in "ABCDEFG"]
            batch = pack_glyphs(glyphs)
            eng = RasterEngine(backend="jnp")
            w, grids = eng.winding_packed(batch, 48, 2048, 48)
            w = np.asarray(w)
            for i, g in enumerate(grids):
                xs, ys = g.sample_coords()
                np.testing.assert_array_equal(
                    w[i],
                    oracle.winding_at(batch.segments[i], xs[None, :], ys[:, None]),
                )
        finally:
            raster_mod.MAX_KERNEL_BATCH = old


class TestOtherFontsParity:
    @pytest.mark.parametrize("fixture", ["dejavu_serif"])
    def test_serif_kernel_parity(self, fixture, request):
        """Kernel == oracle on serif curves (heavier use of quadratics
        and hairline features than the sans)."""
        import jax.numpy as jnp

        from fontrx.kernels.winding_pallas_v2 import winding_pallas_v2_batch
        from fontrx.pack.segments import glyph_segments

        font = request.getfixturevalue(fixture)
        for ch in "SgQ&":
            g, _ = font.get_glyph(ch)
            segs = glyph_segments(g)
            grid = RasterGrid.for_glyph_box(
                (g.box.x_min, g.box.y_min, g.box.x_max, g.box.y_max),
                96, font.info.units_per_em,
            ).padded(128, 128)
            out = winding_pallas_v2_batch(
                jnp.asarray(segs)[None],
                jnp.array([grid.min_x], jnp.int32),
                jnp.array([grid.max_y], jnp.int32),
                jnp.float32(grid.scale),
                height=grid.height, width=grid.width, interpret=True,
            )
            xs, ys = grid.sample_coords()
            np.testing.assert_array_equal(
                np.asarray(out[0]),
                oracle.winding_at(segs, xs[None, :], ys[:, None]),
                err_msg=ch,
            )


class TestHighSegmentCounts:
    """CJK-regime correctness: the v2 kernel's segment streaming and
    strip y-cull must stay bit-exact at 200+ segments/glyph (the regime
    they were designed for, ``winding_pallas_v2.py:23-25``)."""

    @pytest.mark.parametrize("guard", [False, True])
    def test_synthetic_300seg_bitexact(self, guard):
        import jax.numpy as jnp

        from benchmarks.cjk import UPEM, synthetic_strokes
        from fontrx.kernels import oracle
        from fontrx.kernels.winding_pallas_v2 import winding_pallas_v2_batch

        rng = np.random.default_rng(5)
        segs = np.stack([synthetic_strokes(rng, 300) for _ in range(2)])
        size = 128
        scale = np.float32(size / UPEM)
        max_y = np.full(2, size - 1, np.int32)
        out = np.asarray(winding_pallas_v2_batch(
            jnp.asarray(segs),
            jnp.zeros(2, jnp.int32),
            jnp.asarray(max_y),
            jnp.float32(scale),
            height=128, width=128, exact=True, guard=guard, interpret=True,
        ))
        for i in range(2):
            xs = np.arange(size).astype(np.float32) / scale
            ys = (max_y[i] - np.arange(size)).astype(np.float32) / scale
            w = oracle.winding_at(segs[i], xs[None, :], ys[:, None])
            np.testing.assert_array_equal(out[i], w, err_msg=f"glyph {i}")

    @pytest.mark.parametrize("size,lane_pack,seg_chunk", [
        (64, 2, 64), (64, 2, 32), (32, 4, 32), (32, 2, 64),
    ])
    def test_dense_lane_pack_bitexact(self, size, lane_pack, seg_chunk):
        """Lane-packed dense kernel (segment chunk groups sharing the
        128 row lanes) vs lane_pack=1 and the oracle: every
        (segment, row) element runs the same float program and the
        cross-group fold is an integer winding sum, so rasters must be
        bit-identical (device A/B: tpu_dense_lanepack.py, 0
        mismatches)."""
        import jax.numpy as jnp

        from benchmarks.cjk import UPEM, synthetic_strokes
        from fontrx.kernels import oracle
        from fontrx.kernels.winding_dense import winding_dense_batch
        from fontrx.pack.segments import xsort_segments

        rng = np.random.default_rng(7)
        segs = np.stack(
            [xsort_segments(synthetic_strokes(rng, 280))
             for _ in range(3)])
        scale = np.float32(size / UPEM)
        max_y = np.full(3, size - 1, np.int32)
        kw = dict(height=size, width=size, exact=True, interpret=True)
        ref = np.asarray(winding_dense_batch(
            jnp.asarray(segs), jnp.zeros(3, jnp.int32),
            jnp.asarray(max_y), jnp.float32(scale), **kw))
        out = np.asarray(winding_dense_batch(
            jnp.asarray(segs), jnp.zeros(3, jnp.int32),
            jnp.asarray(max_y), jnp.float32(scale),
            lane_pack=lane_pack, seg_chunk=seg_chunk, **kw))
        np.testing.assert_array_equal(out, ref)
        for i in range(3):
            xs = np.arange(size).astype(np.float32) / scale
            ys = (max_y[i] - np.arange(size)).astype(np.float32) / scale
            w = oracle.winding_at(segs[i], xs[None, :], ys[:, None])
            np.testing.assert_array_equal(
                out[i, :size, :size], w, err_msg=f"glyph {i}")

    def test_winding_invariant_under_segment_order(self):
        """Winding is a sum of per-segment contributions — shuffling the
        segment stream (which changes chunk y-coherence and thus which
        chunks the strip cull skips) must not change a single pixel."""
        import jax.numpy as jnp

        from benchmarks.cjk import UPEM, synthetic_strokes
        from fontrx.kernels.winding_pallas_v2 import winding_pallas_v2_batch

        rng = np.random.default_rng(6)
        sorted_segs = synthetic_strokes(rng, 256, y_sorted=True)
        shuffled = sorted_segs[rng.permutation(len(sorted_segs))]
        size = 256
        scale = np.float32(size / UPEM)

        def run(s):
            return np.asarray(winding_pallas_v2_batch(
                jnp.asarray(s)[None],
                jnp.zeros(1, jnp.int32),
                jnp.asarray(np.full(1, size - 1, np.int32)),
                jnp.float32(scale),
                height=256, width=256, exact=True, guard=True,
                interpret=True,
            ))[0]

        np.testing.assert_array_equal(run(sorted_segs), run(shuffled))


class TestBandedAtlas:
    """Row-banded strip packing (128/tile glyphs per kernel strip with
    per-band anchors + owner-masked segments) must be bit-identical to
    the per-glyph kernel."""

    @pytest.mark.parametrize("tile,chars", [(64, "AgWo8@e!"), (32, "Hi,fj")])
    def test_matches_per_glyph(self, dejavu, tile, chars):
        from fontrx.engine.raster import RasterEngine
        from fontrx.pack.segments import pack_glyphs

        glyphs = [dejavu.get_glyph(c)[0] for c in chars]
        eng = RasterEngine(backend="interpret")
        ref, ref_grids = eng.winding_packed(
            pack_glyphs(glyphs), tile, 2048, tile
        )
        banded, grids = eng.winding_packed_banded(glyphs, tile, 2048, tile)
        assert banded.shape == (len(glyphs), tile, tile)
        for i in range(len(glyphs)):
            assert (grids[i].min_x, grids[i].max_y) == (
                ref_grids[i].min_x, ref_grids[i].max_y)
            np.testing.assert_array_equal(
                np.asarray(banded[i]), np.asarray(ref[i]),
                err_msg=f"glyph {chars[i]}",
            )

    def test_jnp_backend_falls_back(self, dejavu):
        from fontrx.engine.raster import RasterEngine

        glyphs = [dejavu.get_glyph(c)[0] for c in "AB"]
        eng = RasterEngine(backend="jnp")
        out, grids = eng.winding_packed_banded(glyphs, 64, 2048, 64)
        assert np.asarray(out).shape[1:] == (64, 64)


class TestShardedSdfLoopBlinn:
    """Glyph-axis sharding for the SDF and triangle-fill atlas kernels
    (`engine/sharding.py::sdf_sharded/loopblinn_sharded`) — each shard
    must equal the unsharded kernel's slice on the virtual 8-device
    mesh, through the REAL pod composition (shard_map + Pallas in
    interpret mode)."""

    @pytest.mark.parametrize("use_pallas", [False, True])
    def test_sdf_sharded_matches_unsharded(self, dejavu, use_pallas):
        import jax
        import jax.numpy as jnp

        from fontrx.engine.atlas import pack_charset
        from fontrx.engine.sharding import (
            make_mesh, sdf_sharded, shard_batch,
        )
        from fontrx.kernels.sdf import sdf_batch

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        batch = pack_charset(dejavu, "ABCDEFGH", pad_batch_to=8)
        grids = [
            RasterGrid.fixed_tile(tuple(b), 32, 2048, 32)
            for b in batch.boxes
        ]
        mesh = make_mesh()
        args = (
            jnp.asarray(batch.segments),
            jnp.array([g.min_x for g in grids], jnp.int32),
            jnp.array([g.max_y for g in grids], jnp.int32),
        )
        seg, mx, my = shard_batch(mesh, *args)
        out = sdf_sharded(
            seg, mx, my, jnp.float32(grids[0].scale),
            height=32, width=32, mesh=mesh, use_pallas=use_pallas,
            interpret=use_pallas, flat=use_pallas,
        )
        assert len(out.sharding.device_set) == 8
        ref = np.clip(
            np.asarray(sdf_batch(
                *args, jnp.float32(grids[0].scale), height=32, width=32
            )), -8.0, 8.0,
        )
        got = np.clip(np.asarray(out), -8.0, 8.0)
        assert np.abs(got - ref).max() < 8.0 / 127

    @pytest.mark.parametrize("use_pallas", [False, True])
    def test_loopblinn_sharded_matches_unsharded(self, dejavu, use_pallas):
        import jax
        import jax.numpy as jnp

        from fontrx.engine.sharding import loopblinn_sharded, make_mesh
        from fontrx.geometry import TriangulatedGlyph
        from fontrx.kernels.loopblinn import (
            _pack_triangle_arrays,
            loopblinn_batch,
            pad_triangles,
        )

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        chars = "ABCDEFGH"
        tgs = [
            TriangulatedGlyph.from_glyph(dejavu.get_glyph(c)[0])
            for c in chars
        ]
        cap = max(len(t.triangles) for t in tgs)
        tris = np.zeros((len(tgs), cap, 3, 4), np.float32)
        cls = np.full((len(tgs), cap), 3, np.int32)
        boxes = []
        for i, (c, tg) in enumerate(zip(chars, tgs)):
            p, pc = pad_triangles(
                _pack_triangle_arrays(tg), tg.classes, cap
            )
            tris[i] = p
            cls[i] = pc
            g, _ = dejavu.get_glyph(c)
            boxes.append(
                (g.box.x_min, g.box.y_min, g.box.x_max, g.box.y_max)
            )
        grids = [
            RasterGrid.fixed_tile(b, 128, 2048, 128) for b in boxes
        ]
        mesh = make_mesh()
        args = (
            jnp.asarray(tris), jnp.asarray(cls),
            jnp.array([g.min_x for g in grids], jnp.int32),
            jnp.array([g.max_y for g in grids], jnp.int32),
        )
        out = loopblinn_sharded(
            *args, jnp.float32(grids[0].scale),
            height=128, width=128, mesh=mesh, use_pallas=use_pallas,
            interpret=use_pallas,
        )
        assert len(out.sharding.device_set) == 8
        ref = np.asarray(loopblinn_batch(
            *args, jnp.float32(grids[0].scale), height=128, width=128
        ))
        np.testing.assert_array_equal(np.asarray(out), ref)


class TestDeferredCarryPageKernel:
    def test_matches_v2_bitexact_wide_page(self, rng):
        """The deferred-carry page kernel (x-hull tile windows +
        bucketed carries) vs the v2 carry sweep on a 2048px-wide
        strip: bit-identical (winding sums commute under the carry
        regrouping)."""
        import jax.numpy as jnp

        from fontrx.kernels.winding_page import winding_page_batch
        from fontrx.kernels.winding_pallas_v2 import (
            winding_pallas_v2_batch,
        )

        n = 300
        p0 = rng.uniform(0, [2048, 128], (n, 2))
        p1 = p0 + rng.uniform(-60, 60, (n, 2))
        p2 = p0 + rng.uniform(-60, 60, (n, 2))
        seg = np.stack([p0, p1, p2], 1).astype(np.float32)[None]
        mx = jnp.zeros(1, jnp.int32)
        my = jnp.full(1, 127, jnp.int32)
        ref = winding_pallas_v2_batch(
            jnp.asarray(seg), mx, my, jnp.float32(1.0),
            height=128, width=2048, exact=False, guard=True,
            seg_chunk=16, interpret=True,
        )
        out = winding_page_batch(
            jnp.asarray(seg), mx, my, jnp.float32(1.0),
            height=128, width=2048, exact=False, seg_chunk=32,
            interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
        assert int((np.asarray(ref) != 0).sum()) > 1000

    def test_direct_page_step_uses_deferred_kernel_wide(self, dejavu):
        """The page pipeline routes >=2048px-wide pages through the
        deferred kernel; narrow pages keep the banded v2 path — both
        produce identical fills on the same content."""
        from fontrx.engine.raster import RasterEngine
        from fontrx.scene.layout import layout_text
        from fontrx.scene.page import PageRenderer
        from fontrx.scene.transform import ViewTransform

        layout = layout_text(dejavu, "Wide page check")
        wide = PageRenderer(
            dejavu, layout, 2048, 128,
            RasterEngine(backend="interpret"))
        view = ViewTransform.init(
            dejavu.info.units_per_em, 2048, 128)
        page = np.asarray(wide.render_direct(view))
        assert page.shape == (128, 2048)
        assert int((page != 0).sum()) > 100

    def test_msaa_fused_pair_matches_single_sample(self, rng):
        """The fused x-pair MSAA kernel: each output plane is
        bit-identical to winding_page_batch at (ox_s, oy) — phase A is
        shared across the pair, classification/details per sample."""
        import jax.numpy as jnp

        from fontrx.kernels.coverage import sample_offsets
        from fontrx.kernels.winding_page import (
            winding_page_batch,
            winding_page_msaa_batch,
        )

        n = 300
        p0 = rng.uniform(0, [2048, 128], (n, 2))
        p1 = p0 + rng.uniform(-60, 60, (n, 2))
        p2 = p0 + rng.uniform(-60, 60, (n, 2))
        seg = np.stack([p0, p1, p2], 1).astype(np.float32)[None]
        mx = jnp.zeros(1, jnp.int32)
        my = jnp.full(1, 127, jnp.int32)
        offs = sample_offsets(2)
        for oy in sorted(set(float(o[1]) for o in offs)):
            oxs = tuple(sorted(
                float(o[0]) for o in offs if float(o[1]) == oy))
            fused = winding_page_msaa_batch(
                jnp.asarray(seg), mx, my, jnp.float32(1.0),
                height=128, width=2048, exact=True, seg_chunk=32,
                sample_oy=oy, sample_oxs=oxs, interpret=True,
            )
            for s, ox in enumerate(oxs):
                ref = winding_page_batch(
                    jnp.asarray(seg), mx, my, jnp.float32(1.0),
                    height=128, width=2048, exact=True, seg_chunk=32,
                    sample_offset=(ox, oy), dynamic_tiles=True,
                    interpret=True,
                )
                np.testing.assert_array_equal(
                    np.asarray(fused[0, s]), np.asarray(ref[0]))
            assert int((np.asarray(fused) != 0).sum()) > 1000

    def test_render_direct_msaa_fused_equals_four_pass(self, dejavu):
        """Wide-page MSAA routes through the fused x-pair kernel; the
        result equals the 4-pass single-sample sum exactly."""
        import jax.numpy as jnp

        from fontrx.engine.raster import RasterEngine
        from fontrx.kernels.coverage import sample_offsets
        from fontrx.scene.layout import layout_text
        from fontrx.scene.page import PageRenderer, _direct_page_step
        from fontrx.scene.transform import ViewTransform

        layout = layout_text(dejavu, "MSAA page pair")
        pr = PageRenderer(
            dejavu, layout, 1024, 128, RasterEngine(backend="interpret"))
        view = ViewTransform.init(dejavu.info.units_per_em, 1024, 128)
        page = np.asarray(pr.render_direct(view, msaa=True))
        assert page.shape == (128, 1024)
        assert len(np.unique(page)) > 2  # actually antialiased

        slots, _ = layout.instance_arrays()
        flat_segments, seg_inst_idx = pr._compact_instances(slots)
        em = layout.instance_arrays()[1].astype(np.float64)
        ndc_x = em[:, 0] * view.scale[0] + view.offset[0]
        ndc_y = (em[:, 1] * view.scale[1] + view.offset[1]) \
            * view.aspect_ratio
        xs = np.empty((len(slots), 2), np.float32)
        xs[:, 0] = (ndc_x + 1.0) / 2.0 * 1024
        xs[:, 1] = (ndc_y + 1.0) / 2.0 * 128
        s_px = np.float32(view.scale[0] * 512.0)
        acc = None
        for ox, oy in sample_offsets(2):
            f = np.asarray(_direct_page_step(
                flat_segments, seg_inst_idx, jnp.asarray(xs), s_px,
                page_h=128, page_w=1024, interpret=True,
                sample_offset=(float(ox), float(oy)),
            )).astype(np.uint16)
            acc = f if acc is None else acc + f
        np.testing.assert_array_equal(page, (acc // 4).astype(np.uint8))


class TestScalarSegmentSdf:
    def test_matches_chunk_kernel_within_tolerance(self, rng):
        """The scalar-segment flat SDF kernel (2-D pixel tiles, SMEM
        segment scalars) vs the 3-D chunk kernel: same float program
        per (segment, pixel) — agreement far inside the 0.063 px u8
        quantization step (tiny fusion-order noise only)."""
        import jax.numpy as jnp

        from fontrx.kernels.sdf_pallas import sdf_pallas_batch

        n = 96
        p0 = rng.uniform(100, 1900, (n, 2))
        p1 = p0 + rng.uniform(-80, 80, (n, 2))
        p2 = p0 + rng.uniform(-80, 80, (n, 2))
        seg = np.stack([p0, p1, p2], 1).astype(np.float32)[None]
        mx = jnp.zeros(1, jnp.int32)
        my = jnp.full(1, 31, jnp.int32)
        scale = jnp.float32(32.0 / 2048.0)
        a = sdf_pallas_batch(
            jnp.asarray(seg), mx, my, scale, height=32, width=32,
            flat=True, interpret=True)
        b = sdf_pallas_batch(
            jnp.asarray(seg), mx, my, scale, height=32, width=32,
            flat=True, scalar_segments=True, interpret=True)
        assert float(jnp.max(jnp.abs(a - b))) < 1e-4


class TestTiledSdf:
    """2-D-tiled band-culled SDF kernel (round 4): pack-time per-tile
    segment lists (hull-box distance vs the spread band), sublane-group
    register layout, dynamic per-(glyph, register-tile) chunk counts.
    Exactness argument: kept (segment, pixel) pairs run the identical
    float program; a dropped pair's distance provably exceeds
    ``spread`` (distance-to-curve >= distance-to-hull-box > spread +
    guard), so post-clamp output is BIT-IDENTICAL to the flat kernel —
    including under the min_x jitter covered by ``x_slack_px``."""

    @pytest.mark.parametrize("size,th,tw,sort_tiles", [
        (32, 8, 16, False), (32, 32, 32, False), (64, 8, 16, False),
        (64, 16, 16, False), (64, 32, 32, False),
        (64, 8, 16, True), (64, 4, 32, True), (32, 8, 16, True),
    ])
    def test_bitexact_vs_flat_kernel(self, rng, size, th, tw,
                                     sort_tiles):
        import jax.numpy as jnp

        from fontrx.kernels.sdf_pallas import (
            pack_sdf_tiles,
            sdf_pallas_batch,
            sdf_pallas_tiled_batch,
        )

        b, n = 3, 96
        p0 = rng.uniform(100, 1900, (b, n, 2))
        p1 = p0 + rng.uniform(-80, 80, (b, n, 2))
        p2 = p0 + rng.uniform(-80, 80, (b, n, 2))
        seg = np.stack([p0, p1, p2], 2).astype(np.float32)
        # a couple of all-zero padding rows (dead-slot handling)
        seg[:, -5:] = 0.0
        mx = np.full(b, 3, np.int32)  # jittered anchor
        my = np.full(b, size - 1, np.int32)
        scale = np.float32(size / 2048.0)
        ref = sdf_pallas_batch(
            jnp.asarray(seg), jnp.asarray(mx), jnp.asarray(my),
            jnp.float32(scale), height=size, width=size, flat=True,
            interpret=True)
        stream, cnts, tids, cap = pack_sdf_tiles(
            seg, np.zeros(b, np.int32), my, scale, size, size,
            tile_h=th, tile_w=tw, x_slack_px=4.0,
            sort_tiles=sort_tiles)
        out = sdf_pallas_tiled_batch(
            jnp.asarray(seg), jnp.asarray(stream), cnts, tids,
            jnp.asarray(mx), jnp.asarray(my), jnp.float32(scale),
            height=size, width=size, cap=cap, tile_h=th, tile_w=tw,
            interpret=True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    @pytest.mark.parametrize("size,chunk,unroll", [
        (64, 16, 1), (64, 16, 2), (64, 8, 1), (32, 16, 1),
    ])
    def test_seg_major_bitexact(self, rng, size, chunk, unroll):
        """Segment-major stream (round 5): the iteration block orders
        rows j*n_g + g so params assemble as static lane slices with
        zero per-group selects — output must stay bit-identical to
        the flat kernel (and hence to the group-major layout)."""
        import jax.numpy as jnp

        from fontrx.kernels.sdf_pallas import (
            pack_sdf_tiles,
            sdf_pallas_batch,
            sdf_pallas_tiled_batch,
        )

        b, n = 3, 96
        p0 = rng.uniform(100, 1900, (b, n, 2))
        p1 = p0 + rng.uniform(-80, 80, (b, n, 2))
        p2 = p0 + rng.uniform(-80, 80, (b, n, 2))
        seg = np.stack([p0, p1, p2], 2).astype(np.float32)
        seg[:, -5:] = 0.0
        mx = np.full(b, 3, np.int32)
        my = np.full(b, size - 1, np.int32)
        scale = np.float32(size / 2048.0)
        ref = sdf_pallas_batch(
            jnp.asarray(seg), jnp.asarray(mx), jnp.asarray(my),
            jnp.float32(scale), height=size, width=size, flat=True,
            interpret=True)
        stream, cnts, tids, cap = pack_sdf_tiles(
            seg, np.zeros(b, np.int32), my, scale, size, size,
            tile_h=8, tile_w=16, seg_chunk=chunk, x_slack_px=4.0,
            sort_tiles=True, seg_major=True)
        out = sdf_pallas_tiled_batch(
            jnp.asarray(seg), jnp.asarray(stream), cnts, tids,
            jnp.asarray(mx), jnp.asarray(my), jnp.float32(scale),
            height=size, width=size, cap=cap, tile_h=8, tile_w=16,
            seg_chunk=chunk, seg_major=True, unroll=unroll,
            interpret=True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


class TestDenseWindows:
    """Window-packed dense kernel (`pack_dense_windows` +
    `winding_dense_win_batch`): per-chunk ROW culling via 16/32-row
    windows.  Exactness argument: crossings only exist on rows inside
    a segment's control hull (+-1 guard), windows partition the rows,
    and winding sums commute — every raster must be bit-identical to
    the plain dense kernel and the oracle."""

    def _run(self, size, win_rows, groups, seg_chunk, n=3, segn=280,
             seed=11):
        import jax.numpy as jnp

        from benchmarks.cjk import UPEM, synthetic_strokes
        from fontrx.kernels.winding_dense import (
            pack_dense_windows,
            winding_dense_batch,
            winding_dense_win_batch,
        )

        rng = np.random.default_rng(seed)
        segs = np.stack([synthetic_strokes(rng, segn)
                         for _ in range(n)])
        scale = np.float32(size / UPEM)
        min_x = np.zeros(n, np.int32)
        max_y = np.full(n, size - 1, np.int32)
        ref = np.asarray(winding_dense_batch(
            jnp.asarray(segs), jnp.asarray(min_x), jnp.asarray(max_y),
            jnp.float32(scale), height=size, width=size, exact=True,
            interpret=True))
        win, nw, cap = pack_dense_windows(
            segs, min_x, max_y, float(scale), size,
            win_rows=win_rows, seg_chunk=seg_chunk, groups=groups)
        out = np.asarray(winding_dense_win_batch(
            jnp.asarray(win), jnp.asarray(min_x), jnp.asarray(max_y),
            jnp.float32(scale), height=size, width=size, n_windows=nw,
            cap=cap, exact=True, interpret=True, win_rows=win_rows,
            groups=groups, seg_chunk=seg_chunk))
        np.testing.assert_array_equal(out, ref)
        return segs, scale, max_y, out

    @pytest.mark.parametrize("size,win_rows,groups,seg_chunk", [
        (64, 16, 8, 16), (64, 16, 8, 8), (64, 32, 4, 32),
        (32, 16, 8, 16), (128, 16, 8, 16),
    ])
    def test_bitexact_vs_dense_and_oracle(self, size, win_rows,
                                          groups, seg_chunk):
        from fontrx.kernels import oracle

        segs, scale, max_y, out = self._run(
            size, win_rows, groups, seg_chunk)
        for i in range(len(segs)):
            xs = np.arange(size).astype(np.float32) / scale
            ys = (max_y[i] - np.arange(size)).astype(np.float32) / scale
            w = oracle.winding_at(segs[i], xs[None, :], ys[:, None])
            np.testing.assert_array_equal(
                out[i, :size, :size], w, err_msg=f"glyph {i}")

    def test_sample_offset_within_margin(self):
        """One packing serves every MSAA sample offset in [-1, 1]
        (the pack's sample_margin): offset rasters stay bit-identical
        to the plain dense kernel at the same offset."""
        import jax.numpy as jnp

        from benchmarks.cjk import UPEM, synthetic_strokes
        from fontrx.kernels.winding_dense import (
            pack_dense_windows,
            winding_dense_batch,
            winding_dense_win_batch,
        )

        rng = np.random.default_rng(12)
        segs = np.stack([synthetic_strokes(rng, 200) for _ in range(2)])
        size = 64
        scale = np.float32(size / UPEM)
        min_x = np.zeros(2, np.int32)
        max_y = np.full(2, size - 1, np.int32)
        win, nw, cap = pack_dense_windows(
            segs, min_x, max_y, float(scale), size)
        for off in ((0.25, 0.75), (-0.5, 0.5), (0.0, -1.0)):
            ref = np.asarray(winding_dense_batch(
                jnp.asarray(segs), jnp.asarray(min_x),
                jnp.asarray(max_y), jnp.float32(scale), height=size,
                width=size, exact=True, interpret=True,
                sample_offset=off))
            out = np.asarray(winding_dense_win_batch(
                jnp.asarray(win), jnp.asarray(min_x),
                jnp.asarray(max_y), jnp.float32(scale), height=size,
                width=size, n_windows=nw, cap=cap, exact=True,
                interpret=True, sample_offset=off))
            np.testing.assert_array_equal(out, ref, err_msg=str(off))

    def test_engine_windows_route(self):
        """`RasterEngine.pack_windows` + `winding_batch(windows=)` —
        the shipped atlas routing — matches the plain engine path
        bit-for-bit at the shipped `dense_win_tuning` knobs."""
        import jax.numpy as jnp

        from benchmarks.cjk import UPEM, synthetic_strokes
        from fontrx.engine.raster import RasterEngine

        rng = np.random.default_rng(14)
        segs = np.stack([synthetic_strokes(rng, 280) for _ in range(3)])
        engine = RasterEngine(exact=True, backend="interpret")
        min_x = np.zeros(3, np.int32)
        for size in (64, 32):
            scale = float(size / UPEM)
            max_y = np.full(3, size - 1, np.int32)
            wins = engine.pack_windows(
                segs, min_x, max_y, scale, height=size)
            assert wins is not None
            ref = np.asarray(engine.winding_batch(
                jnp.asarray(segs), min_x, max_y, scale,
                height=size, width=size))
            out = np.asarray(engine.winding_batch(
                jnp.asarray(segs), min_x, max_y, scale,
                height=size, width=size, windows=wins))
            np.testing.assert_array_equal(out, ref)
        # non-Pallas backends decline the pack
        assert RasterEngine(backend="jnp").pack_windows(
            segs, min_x, np.full(3, 63, np.int32), 64 / UPEM,
            height=64) is None

    def test_pack_duplication_is_bounded(self):
        """The window assignment duplicates a segment only into
        windows its hull can touch — for stroke-like dense content
        the duplication factor stays small."""
        from benchmarks.cjk import UPEM, synthetic_strokes
        from fontrx.kernels.winding_dense import pack_dense_windows

        rng = np.random.default_rng(13)
        segs = np.stack([synthetic_strokes(rng, 288) for _ in range(4)])
        win, nw, cap = pack_dense_windows(
            segs, np.zeros(4, np.int32), np.full(4, 63, np.int32),
            64.0 / UPEM, 64)
        live = int((~(win == 0).all(axis=(2, 3))).sum())
        total = int((~(segs == 0).all(axis=(2, 3))).sum())
        assert live / total < 3.0  # duplication factor sanity bound


class TestSdfEngineDispatch:
    """RasterEngine.pack_sdf/sdf_batch routing: the dense regime
    (capacity >= 128, size >= 64) takes the tiled band-culled kernel,
    bit-identical to flat mode; 32px and sparse batches keep flat."""

    def _batch(self, rng, b=2, n=160):
        p0 = rng.uniform(100, 1900, (b, n, 2))
        p1 = p0 + rng.uniform(-80, 80, (b, n, 2))
        p2 = p0 + rng.uniform(-80, 80, (b, n, 2))
        return np.stack([p0, p1, p2], 2).astype(np.float32)

    def test_dense_routes_tiled_and_matches_flat(self, rng):
        from fontrx.engine.raster import RasterEngine

        seg = self._batch(rng)
        b = len(seg)
        mx = np.zeros(b, np.int32)
        my = np.full(b, 63, np.int32)
        scale = np.float32(64 / 2048)
        eng = RasterEngine(backend="interpret")
        pack = eng.pack_sdf(seg, mx, my, scale, height=64, width=64)
        assert pack is not None
        tiled = np.asarray(eng.sdf_batch(
            seg, mx, my, scale, height=64, width=64, pack=pack))
        flat = np.asarray(eng.sdf_batch(
            seg, mx, my, scale, height=64, width=64))
        np.testing.assert_array_equal(tiled, flat)

    def test_sparse_and_small_keep_flat(self, rng):
        from fontrx.engine.raster import RasterEngine

        seg = self._batch(rng)
        mx = np.zeros(2, np.int32)
        my = np.full(2, 63, np.int32)
        eng = RasterEngine(backend="interpret")
        assert eng.pack_sdf(seg, mx, my, np.float32(32 / 2048),
                            height=32, width=32) is None
        assert eng.pack_sdf(seg[:, :100], mx, my,
                            np.float32(64 / 2048),
                            height=64, width=64) is None

    def test_jnp_backend_falls_through(self, rng):
        from fontrx.engine.raster import RasterEngine
        from fontrx.kernels.sdf import sdf_batch as sdf_jnp

        import jax.numpy as jnp

        seg = self._batch(rng)
        mx = np.zeros(2, np.int32)
        my = np.full(2, 63, np.int32)
        scale = np.float32(64 / 2048)
        eng = RasterEngine(backend="jnp")
        assert eng.pack_sdf(seg, mx, my, scale,
                            height=64, width=64) is None
        out = eng.sdf_batch(seg, mx, my, scale, height=64, width=64)
        ref = sdf_jnp(jnp.asarray(seg), jnp.asarray(mx),
                      jnp.asarray(my), jnp.float32(scale),
                      height=64, width=64)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
