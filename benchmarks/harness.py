"""Shared benchmark harness for the five BASELINE configs.

Each config module measures one scenario from BASELINE.md and prints a
JSON line.  ``bench.py`` at the repo root remains the driver's single
headline entry; these give the judge per-config numbers:

1. single glyph 'A' 256x256 winding fill -> QOI (oracle parity)
2. "Hello, World!" line, 64px, 4x MSAA supersampled coverage
3. full ASCII atlas (94 printable glyphs) @128px,
   triangulation-equivalent fill
4. SDF atlas, 1000 glyphs @32/64px
5. interactive 1920x1080 page, per-frame zoom/pan re-raster
"""

from __future__ import annotations

import json
import time

DEJAVU = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"


def timeit(fn, n: int = 10, warmup: int = 1) -> float:
    """Mean seconds per call (after warmup/compile).

    ``fn(i)`` receives the iteration index — step functions MUST vary
    their inputs by it and force result materialization (fetch a
    scalar): on the tunneled TPU backend, identical dispatches can be
    memoized and ``block_until_ready`` can return before execution
    finishes, so naive loops measure nothing.
    """
    import inspect

    takes_i = len(inspect.signature(fn).parameters) >= 1
    call = (lambda i: fn(i)) if takes_i else (lambda i: fn())
    for i in range(warmup):
        call(i)
    t0 = time.perf_counter()
    for i in range(n):
        call(warmup + i)
    return (time.perf_counter() - t0) / n


def emit(config: str, metric: str, value: float, unit: str, **extra) -> dict:
    out = {"config": config, "metric": metric,
           "value": round(value, 3), "unit": unit}
    out.update(extra)
    print(json.dumps(out), flush=True)
    return out


def setup_cache():
    from fontrx.engine.cache import enable_compilation_cache

    enable_compilation_cache()
