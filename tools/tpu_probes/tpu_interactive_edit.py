"""Interactive edit-loop latency at page scale (VERDICT r4 item 9).

10k-char page, 1080p direct mode, full GPOS positioning.  Measures the
ms/frame split for EDIT frames (typed char / cluster backspace -> host
re-layout -> device re-raster) against zoom/pan frames (re-raster
only), with the incremental paragraph-cached layout engine on and off.

Per-frame host fetches are inherent to an interactive loop, so frames
are timed wall-clock and the tunnel RTT is measured and reported
separately (the config-5 protocol, benchmarks/configs.py:300-310).
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from fontrx.engine.raster import RasterEngine
from fontrx.font.font import Font
from fontrx.scene.interactive import InteractiveSession

import os

DEJAVU = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"
PARA = "The quick brown fox jumps over the lazy dog, flying off 0123456789."
N_PARA = int(os.environ.get("N_PARA", "150"))  # 150 ~= 10.2k chars
EDIT_FRAMES = int(os.environ.get("EDIT_FRAMES", "24"))


def rtt_ms() -> float:
    triv = jax.jit(lambda x: x * 2)
    float(triv(jnp.float32(1.0)))
    t0 = time.perf_counter()
    for i in range(10):
        float(triv(jnp.float32(i)))
    return (time.perf_counter() - t0) / 10 * 1e3


def run(incremental: bool, mode: str = "direct") -> dict:
    font = Font.open(DEJAVU)
    text = "\n".join(PARA for _ in range(N_PARA))
    sess = InteractiveSession(
        font, text, 1920, 1080, RasterEngine(), mode=mode,
        kern=True, ligatures=True, marks=True,
        positioning=(b"kern", b"mark", b"mkmk"),
    )
    if not incremental:
        sess._layout_engine._mergeable = False  # force full layout_text
    sess.frame()  # compile + first raster
    sess.frame()

    host_ms, frame_ms = [], []
    for i in range(EDIT_FRAMES):
        t0 = time.perf_counter()
        if i % 4 == 3:
            sess.backspace()
        else:
            sess.char_input("abcdefgh"[i % 8])
        t1 = time.perf_counter()
        sess.frame()
        t2 = time.perf_counter()
        host_ms.append((t1 - t0) * 1e3)
        frame_ms.append((t2 - t1) * 1e3)

    # zoom/pan baseline on the same session
    zp_ms = []
    for i in range(12):
        t0 = time.perf_counter()
        if i % 3 == 0:
            sess.scroll(0.5 if i % 2 else -0.5, (0.1, 0.1))
        else:
            sess.drag(0.01, 0.005)
        sess.frame()
        zp_ms.append((time.perf_counter() - t0) * 1e3)

    return {
        "incremental": incremental,
        "mode": mode,
        "chars": len(sess.text),
        "edit_host_relayout_ms": round(float(np.median(host_ms)), 2),
        "edit_frame_ms": round(float(np.median(frame_ms)), 2),
        "edit_total_ms": round(float(np.median(
            [h + f for h, f in zip(host_ms, frame_ms)])), 2),
        "zoom_pan_ms": round(float(np.median(zp_ms)), 2),
        "rtt_ms": round(rtt_ms(), 2),
    }


def main():
    modes = os.environ.get("MODES", "direct").split(",")
    for mode in modes:
        for incremental in (True, False):
            r = run(incremental, mode)
            print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
