"""A/B row-window page tuning on the REAL 4K/1080p text pages (the
round-3 dense-regime fix applied at page scale), bit-compare included.
"""

import sys

sys.path.insert(0, "/root/repo")

import time

import numpy as np

from benchmarks.harness import setup_cache

setup_cache()

from fontrx.engine.raster import RasterEngine
from fontrx.font.font import Font
from fontrx.scene.layout import layout_text
from fontrx.scene.page import PageRenderer
from fontrx.scene.transform import ViewTransform

DEJAVU = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"

TUNINGS = [
    ("shipped r2: gg=0 sc=16 tw=128", (0, 16, 128)),
    ("rw8: gg=0 sc=16 tw=128", (0, 16, 128, 8)),
    ("rw8 sc=32", (0, 32, 128, 8)),
    ("rw16 sc=16", (0, 16, 128, 16)),
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
    base_page = None
    for name, tuning in TUNINGS:
        pr = PageRenderer(font, layout, w, h, RasterEngine(),
                          kernel_tuning=tuning)
        view = base_view
        p = pr.render_direct(view)
        if base_page is None:
            base_page = np.asarray(p)
            mism = 0
        else:
            mism = int((np.asarray(p) != base_page).sum())
        n = 5
        t0 = time.perf_counter()
        for i in range(n):
            view = view.zoomed(0.01, (0.0, 0.0))  # unique every frame
            p = pr.render_direct(view)
            float(p[0, 0])
        dt = (time.perf_counter() - t0) / n
        print(f"  {name:30s} {dt*1e3:8.2f} ms/frame (incl ~33ms RTT) "
              f"mismatch={mism}", flush=True)


def main():
    time_page(3840, 2160, 10000, -8.0)
    time_page(1920, 1080, 1100, -4.0)


if __name__ == "__main__":
    main()
