"""A/B the direct-page kernel tuning on REAL text pages.

The synthetic page sweep (`tpu_page_gg.py`, uniformly spread strokes)
said 256-wide column tiles win at 4K — but the real 10k-instance text
page regressed (107.7 -> 139.8 ms): real pages are tile-SPARSE (glyph
ink clusters), and wide tiles halve the any_in-skip win.  This probe
times the real stress page and the real 1080p interactive page under
each tuning so the default is set by representative content.
"""

import sys

sys.path.insert(0, "/root/repo")

import time

import numpy as np

from fontrx.engine.raster import RasterEngine
from fontrx.font.font import Font
from fontrx.scene.layout import layout_text
from fontrx.scene.page import PageRenderer
from fontrx.scene.transform import ViewTransform

DEJAVU = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"

TUNINGS = [
    ("r1: gg=0 sc=16 tw=128", (0, 16, 128)),
    ("gg=8 sc=32 tw=128", (8, 32, 128)),
    ("gg=8 sc=32 tw=256|pad", (8, 32, None)),
]


def time_page(w, h, instances, zoom):
    font = Font.open(DEJAVU)
    line = "The quick brown fox jumps over the lazy dog. 0123456789 "
    n_lines = max(1, instances // len(line))
    text = "\n".join(line for _ in range(n_lines))
    layout = layout_text(font, text)
    base_view = ViewTransform.init(font.info.units_per_em, w, h).zoomed(
        zoom, (0.0, 0.0)
    )
    slots, _ = layout.instance_arrays()
    live = int(np.asarray(layout.batch.seg_counts)[slots].sum())
    print(f"--- {w}x{h}, {len(layout.instances)} instances, {live} live segs",
          flush=True)
    for name, tuning in TUNINGS:
        pr = PageRenderer(font, layout, w, h, RasterEngine(),
                          kernel_tuning=tuning)
        view = base_view
        p = pr.render_direct(view)
        float(p[0, 0])  # compile
        n = 5
        t0 = time.perf_counter()
        for i in range(n):
            view = view.zoomed(0.01, (0.0, 0.0))  # unique every frame
            p = pr.render_direct(view)
            float(p[0, 0])
        dt = (time.perf_counter() - t0) / n
        print(f"  {name:24s} {dt*1e3:8.2f} ms/frame (incl. ~33ms RTT)",
              flush=True)


def main():
    time_page(3840, 2160, 10000, -8.0)
    time_page(1920, 1080, 1100, -4.0)


if __name__ == "__main__":
    main()
