"""Throughput metrics counters.

SURVEY §5.5: the reference has scoped logging but no metrics; the
driver's north-star metrics (glyphs/s, Mpix/s, ms/frame) get first-class
counters here.  Zero-cost when disabled; used by the engine, the
interactive session, and the benchmark harness.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

from fontrx.utils.log import get_logger

log = get_logger("Metrics")


@dataclass
class RasterMetrics:
    """Accumulates raster-step statistics."""

    glyphs: int = 0
    pixels: int = 0
    steps: int = 0
    seconds: float = 0.0
    frame_ms: list = field(default_factory=list)

    @contextlib.contextmanager
    def step(self, glyphs: int, pixels: int):
        """Time one raster step (caller must block on the result inside
        the context for honest wall-clock)."""
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self.glyphs += glyphs
        self.pixels += pixels
        self.steps += 1
        self.seconds += dt
        self.frame_ms.append(dt * 1e3)

    @property
    def glyphs_per_s(self) -> float:
        return self.glyphs / self.seconds if self.seconds else 0.0

    @property
    def mpix_per_s(self) -> float:
        return self.pixels / self.seconds / 1e6 if self.seconds else 0.0

    @property
    def mean_frame_ms(self) -> float:
        return sum(self.frame_ms) / len(self.frame_ms) if self.frame_ms else 0.0

    def summary(self) -> dict:
        return {
            "steps": self.steps,
            "glyphs_per_s": round(self.glyphs_per_s, 1),
            "mpix_per_s": round(self.mpix_per_s, 2),
            "mean_frame_ms": round(self.mean_frame_ms, 3),
        }

    def report(self) -> None:
        log.info("raster metrics: %s", self.summary())
