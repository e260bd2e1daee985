"""QOI codec tests: roundtrip, format conformance, reference-convention
cases (``src/tools/qoi.zig`` semantics)."""

import struct

import numpy as np
import pytest

from fontrx.io.qoi import MAGIC, decode, encode_rgb


class TestHeader:
    def test_header_fields(self):
        img = np.zeros((3, 5, 3), np.uint8)
        data = encode_rgb(img)
        assert data[:4] == MAGIC
        w, h, ch, cs = struct.unpack(">IIBB", data[4:14])
        assert (w, h, ch, cs) == (5, 3, 3, 0)

    def test_end_marker(self):
        data = encode_rgb(np.zeros((2, 2, 3), np.uint8))
        assert data[-8:] == struct.pack(">Q", 1)


class TestOps:
    def test_all_black_is_runs(self):
        # 4x4 black: 16 pixels -> one RUN op of 16
        data = encode_rgb(np.zeros((4, 4, 3), np.uint8))
        body = data[14:-8]
        assert body == bytes([0xC0 | 15])

    def test_long_run_splits_at_62(self):
        img = np.full((1, 130, 3), 9, np.uint8)
        data = encode_rgb(img)
        body = data[14:-8]
        # first pixel is an RGB/LUMA op, then runs of <=62
        runs = [b for b in body if (b & 0xC0) == 0xC0 and b < 0xFE]
        assert all((b & 0x3F) <= 61 for b in runs)
        assert sum((b & 0x3F) + 1 for b in runs) == 129

    def test_diff_op(self):
        img = np.array([[[10, 10, 10], [11, 11, 9]]], np.uint8)
        data = encode_rgb(img)
        body = data[14:-8]
        # second pixel: dr=+1 dg=+1 db=-1 -> DIFF
        assert (body[-1] & 0xC0) == 0x40

    def test_index_op(self):
        px = np.array([50, 100, 150], np.uint8)
        img = np.array([[px, [0, 0, 0], px]], np.uint8)
        data = encode_rgb(img)
        # third pixel should hit the index (same value seen 2 ops ago)
        body = data[14:-8]
        assert (body[-1] & 0xC0) == 0x00

    def test_zero_table_matches_black(self):
        # reference's zeroed running table: a black pixel after a
        # non-black one can INDEX-match any untouched entry
        img = np.array([[[50, 60, 70], [0, 0, 0], [0, 0, 0]]], np.uint8)
        data = encode_rgb(img)
        assert np.array_equal(decode(data), img)


class TestRoundtrip:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_random(self, seed):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (24, 31, 3)).astype(np.uint8)
        assert np.array_equal(decode(encode_rgb(img)), img)

    def test_smooth_gradient(self):
        x = np.arange(64, dtype=np.uint8)
        img = np.stack(np.broadcast_arrays(x[None, :], x[:, None], x[None, :]), -1)
        img = np.ascontiguousarray(img).astype(np.uint8)
        assert np.array_equal(decode(encode_rgb(img)), img)

    def test_glyph_raster(self, dejavu):
        from fontrx.kernels import oracle
        from fontrx.kernels.grid import RasterGrid
        from fontrx.pack.segments import glyph_segments

        g, _ = dejavu.get_glyph("A")
        grid = RasterGrid.for_glyph_box(
            (g.box.x_min, g.box.y_min, g.box.x_max, g.box.y_max), 64, 2048
        )
        gray = oracle.render_gray(glyph_segments(g), grid)
        img = np.repeat(gray[:, :, None], 3, axis=2)
        assert np.array_equal(decode(encode_rgb(img)), img)


class TestImages:
    def test_winding_colormap(self):
        from fontrx.io.image import Winding

        w = np.array([[0, 1, -1, 20]], np.int16)
        rgb = Winding(w, scaler=20, overflow_color=150).rgb()
        assert tuple(rgb[0, 0]) == (0, 0, 0)
        assert tuple(rgb[0, 1]) == (0, 0, 20)      # positive -> blue
        assert tuple(rgb[0, 2]) == (20, 0, 0)      # negative -> red
        assert tuple(rgb[0, 3]) == (150, 150, 255)  # saturated + overflow marker

    def test_glyph_debug_render(self, dejavu):
        from fontrx.io.image import GlyphDebug

        g, _ = dejavu.get_glyph("I")
        im = GlyphDebug.render(g)
        h, w, _ = im.rgb().shape
        assert w == g.box.x_max - g.box.x_min + 3
        assert h == g.box.y_max - g.box.y_min + 3
        # control-point overlay present
        assert (im.rgb() == np.array([255, 255, 0], np.uint8)).all(-1).any()


class TestRGBA:
    def test_rgba_roundtrip_random(self, rng):
        from fontrx.io.qoi import decode, encode_rgba

        img = rng.integers(0, 256, (13, 17, 4)).astype(np.uint8)
        out = decode(encode_rgba(img))
        assert out.shape == (13, 17, 4)
        np.testing.assert_array_equal(out, img)

    def test_rgba_header_channels(self):
        from fontrx.io.qoi import encode_rgba

        img = np.zeros((2, 2, 4), np.uint8)
        data = encode_rgba(img)
        assert data[12] == 4  # channels field

    def test_rgba_constant_alpha_matches_rgb_payload(self, rng):
        """With alpha pinned at 255 the RGBA stream decodes to the same
        pixels as the RGB encoder's (alpha-extended)."""
        from fontrx.io.qoi import decode, encode_rgb, encode_rgba

        rgb = rng.integers(0, 256, (9, 11, 3)).astype(np.uint8)
        rgba = np.concatenate(
            [rgb, np.full((9, 11, 1), 255, np.uint8)], axis=2
        )
        out4 = decode(encode_rgba(rgba))
        out3 = decode(encode_rgb(rgb))
        np.testing.assert_array_equal(out4[:, :, :3], out3)
        np.testing.assert_array_equal(out4[:, :, 3], 255)

    def test_transparent_page_roundtrip(self):
        from fontrx.io.qoi import decode, encode_rgba
        from fontrx.scene.page import PageRenderer

        page = np.zeros((8, 8), np.uint8)
        page[2:5, 3:6] = 255
        rgba = PageRenderer.to_rgba(page, transparent=True)
        out = decode(encode_rgba(rgba))
        np.testing.assert_array_equal(out, rgba)
        assert out[0, 0, 3] == 0 and out[3, 4, 3] == 255
