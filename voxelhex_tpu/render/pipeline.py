"""Frame pipelining: overlap frame downloads with the next frame's compute.

The remote-TPU tunnel moves ~30 MB/s; a 1080p uint8 frame costs ~0.2 s to
fetch — a fixed tax on every sequentially-fetched frame (PERF.md).  The
reference never pays it: its output lives in a GPU texture consumed by the
presentation pass (reference: src/raytracing/bevy/pipeline/mod.rs:96-154).
For hosts that DO need pixels back, this helper hides the fetch behind the
next frame's host-driven trace rounds: ``render`` enqueues the device
render and hands the download to a background thread, returning a future.

    pipe = FramePipeline(renderer)
    futs = [pipe.render(cam_i, out_u8=True) for cam_i in cams]
    frames = [f.result() for f in futs]   # downloads overlapped compute
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import numpy as np


class FramePipeline:
    """Double-buffered frame fetches over any renderer that supports
    ``render(..., out_device=True)`` (one fetch thread: the tunnel is a
    single serial link, more threads just contend)."""

    def __init__(self, renderer, max_in_flight: int = 2):
        self.renderer = renderer
        self._pool = ThreadPoolExecutor(max_workers=1)
        self._max_in_flight = int(max_in_flight)
        self._in_flight: list = []

    def render(self, camera, **kwargs):
        """Enqueue a frame; returns a future of the fetched ndarray."""
        # bound device-side frame buffers: wait for the oldest fetch when
        # too many frames are in flight
        while len(self._in_flight) >= self._max_in_flight:
            self._in_flight.pop(0).result()
        kwargs["out_device"] = True
        # NOTE: deferring the fused path's plan-validity counts read to
        # the fetch worker (render(defer_validation=True) + the
        # DeferredFrame resolve) measured NEUTRAL-to-NEGATIVE through the
        # axon tunnel — the blocking read on this thread already overlaps
        # the worker's previous-frame transfer, and moving it onto the
        # single fetch thread serializes it behind the 6 MB frame
        # (PERF.md "Deferred counts").  Kept opt-in on the renderer.
        dev = self.renderer.render(camera, **kwargs)
        fut = self._pool.submit(self._fetch, dev)
        self._in_flight.append(fut)
        return fut

    @staticmethod
    def _fetch(dev):
        resolve = getattr(dev, "resolve", None)
        if resolve is not None:
            return resolve(fetch=True)  # counts + pixels: one transfer
        return np.asarray(dev)

    def drain(self):
        """Wait for all outstanding fetches."""
        while self._in_flight:
            self._in_flight.pop(0).result()

    def close(self):
        self.drain()
        self._pool.shutdown()
