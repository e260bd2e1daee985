"""Image containers.

Behavioral equivalent of the reference's vtable-based image interface
(``src/tools/Image.zig``), NumPy-idiomatic: each type wraps an ndarray
and exposes ``rgb()`` -> ``uint8 [H, W, 3]`` (the analog of
``getRGBLinear`` feeding the QOI encoder).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(slots=True)
class Gray:
    """8-bit grayscale (``Image.zig:44-83``)."""

    data: np.ndarray  # uint8 [H, W]

    @classmethod
    def zeros(cls, width: int, height: int) -> "Gray":
        return cls(np.zeros((height, width), np.uint8))

    @property
    def width(self) -> int:
        return self.data.shape[1]

    @property
    def height(self) -> int:
        return self.data.shape[0]

    def rgb(self) -> np.ndarray:
        return np.repeat(self.data[:, :, None], 3, axis=2)


def _winding_rgb(w: np.ndarray, scaler: int, overflow_color: int) -> np.ndarray:
    """Winding -> RGB color map (``Image.Winding.implGetRGBLinear``,
    ``Image.zig:121-129``): positive winding is blue, negative red,
    saturated magnitudes get ``overflow_color`` in the other channels;
    winding 0 is black."""
    c = np.abs(w.astype(np.int64)) * scaler
    main = np.clip(c, 0, 255).astype(np.uint8)
    sub = np.where(c == main, 0, overflow_color).astype(np.uint8)
    out = np.zeros(w.shape + (3,), np.uint8)
    pos = w > 0
    neg = w < 0
    out[pos] = np.stack([sub[pos], sub[pos], main[pos]], axis=-1)
    out[neg] = np.stack([main[neg], sub[neg], sub[neg]], axis=-1)
    return out


@dataclass(slots=True)
class Winding:
    """Signed winding-number image with the blue/red visualization
    (``Image.zig:85-130``)."""

    data: np.ndarray  # int16/int32 [H, W]
    scaler: int = 20
    overflow_color: int = 150

    @property
    def width(self) -> int:
        return self.data.shape[1]

    @property
    def height(self) -> int:
        return self.data.shape[0]

    def rgb(self) -> np.ndarray:
        return _winding_rgb(self.data, self.scaler, self.overflow_color)


@dataclass(slots=True)
class RGB:
    """24-bit RGB (``Image.zig:132-170``)."""

    data: np.ndarray  # uint8 [H, W, 3]

    @classmethod
    def zeros(cls, width: int, height: int) -> "RGB":
        return cls(np.zeros((height, width, 3), np.uint8))

    @property
    def width(self) -> int:
        return self.data.shape[1]

    @property
    def height(self) -> int:
        return self.data.shape[0]

    def rgb(self) -> np.ndarray:
        return self.data


@dataclass(slots=True)
class GlyphDebug:
    """Debug winding map at 1 font-unit per pixel with control-point
    overlay (``Image.GlyphDebug``, ``Image.zig:173-241``): winding via
    the blue/red map, on-curve points painted yellow, off-curve controls
    cyan; one-unit border around the glyph box."""

    rgb_image: RGB
    glyph_box: tuple[int, int, int, int]
    winding_scale: int = 20
    overflow_color: int = 150
    on_curve_color: tuple[int, int, int] = (255, 255, 0)
    off_curve_color: tuple[int, int, int] = (0, 255, 255)

    @classmethod
    def render(cls, glyph, winding_scale: int = 20) -> "GlyphDebug":
        """Render the full winding map of a glyph at 1 font-unit per
        pixel (uses the float winding oracle; the reference uses its
        exact-integer path here, which it marks broken —
        ``render_glyph.zig:157-159``)."""
        from fontrx.kernels import oracle
        from fontrx.pack.segments import glyph_segments

        box = (glyph.box.x_min, glyph.box.y_min, glyph.box.x_max, glyph.box.y_max)
        x_min, y_min, x_max, y_max = box
        width = x_max - x_min + 3
        height = y_max - y_min + 3
        segs = glyph_segments(glyph)
        # sample at integer font-unit coords with a 1-unit border
        xs = (x_min + np.arange(width) - 1).astype(np.float32)
        ys = (y_max - np.arange(height) + 1).astype(np.float32)
        w = oracle.winding_at(segs, cx=xs[None, :], cy=ys[:, None])

        im = cls(RGB(_winding_rgb(w, winding_scale, 150)), box, winding_scale)
        im._paint_points(glyph)
        return im

    def _paint_points(self, glyph) -> None:
        """Overlay control points (``setGlyphPoints``,
        ``Image.zig:199-215``)."""
        x_min, _, _, y_max = (
            self.glyph_box[0], self.glyph_box[1], self.glyph_box[2], self.glyph_box[3],
        )
        data = self.rgb_image.data
        for contour in glyph.contours:
            pts = contour.points
            for k in range(len(pts) // 2):
                on_pt = pts[2 * k]
                off_pt = pts[2 * k + 1]
                data[y_max - on_pt[1] + 1, on_pt[0] - x_min + 1] = self.on_curve_color
                data[y_max - off_pt[1] + 1, off_pt[0] - x_min + 1] = self.off_curve_color

    def rgb(self) -> np.ndarray:
        return self.rgb_image.data
