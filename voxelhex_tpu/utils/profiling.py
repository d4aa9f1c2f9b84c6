"""Observability: frame timing, rays/sec meters and JAX profiler traces.

The reference exposes FPS via the whisp overlay (reference:
whisp/src/ui/behavior.rs:47-81); here the equivalents are programmatic.
"""

from __future__ import annotations

import contextlib
import time


class FrameStats:
    """Rolling rays/sec + frame-time statistics."""

    def __init__(self, window: int = 60):
        self.window = window
        self.times: list[float] = []
        self.rays: list[int] = []

    def record(self, seconds: float, n_rays: int):
        self.times.append(seconds)
        self.rays.append(n_rays)
        if len(self.times) > self.window:
            self.times.pop(0)
            self.rays.pop(0)

    @property
    def fps(self) -> float:
        if not self.times:
            return 0.0
        return len(self.times) / sum(self.times)

    @property
    def rays_per_sec(self) -> float:
        if not self.times:
            return 0.0
        return sum(self.rays) / sum(self.times)

    def summary(self) -> str:
        if not self.times:
            return "no frames recorded"
        avg = sum(self.times) / len(self.times)
        return (
            f"{avg*1000:.1f} ms/frame ({self.fps:.2f} FPS, "
            f"{self.rays_per_sec/1e6:.2f} Mrays/s over {len(self.times)} frames)"
        )


@contextlib.contextmanager
def timed_frame(stats: FrameStats, n_rays: int):
    """Context manager recording one frame into ``stats``."""
    t0 = time.time()
    yield
    stats.record(time.time() - t0, n_rays)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a JAX profiler trace (viewable in XProf/TensorBoard)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
