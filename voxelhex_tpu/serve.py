"""Headless render/edit server: the serving runtime around the renderer.

The reference ships a windowed viewer (whisp: bevy app with camera controls
and live edit signals, whisp/src/main.rs); in a TPU deployment the chip
lives in a datacenter, so the equivalent is a render SERVICE: scene resident
on device, clients post camera poses and edits over HTTP, frames come back
as PNG.  One process owns the chip (see CLAUDE.md); the server serializes
device work onto a single lock.

Endpoints
---------
- ``GET /`` — the interactive viewer UI (viewer.html: drag-to-orbit camera,
  fov/resolution sliders, camera lock, FPS graph, drag-drop .vox upload,
  prefs persisted in localStorage — the whisp feature set,
  whisp/src/main.rs:14-128, served to a browser instead of a window).
- ``GET /frame?ox=&oy=&oz=&tx=&ty=&tz=&w=&h=[&fov=]`` — render a frame for
  the given origin/target camera; returns ``image/png``.
- ``POST /edit`` — JSON ``{"op": "insert"|"clear", "pos": [x,y,z],
  "color": [r,g,b,a]}`` (or a list of such ops); applies to the live tree
  and invalidates device state (delta uploads through the streaming view's
  edit triggers).
- ``POST /load?name=`` — body is raw .vox bytes; parses, builds and swaps
  the served scene, with a content-addressed bencode disk cache (whisp's
  drag-drop loader + ``.cache_<name>`` workflow, whisp/src/loader.rs:51-96).
- ``GET /stats`` — JSON: scene info + last trace profile (rounds,
  iterations, seconds — the whisp fps-overlay analog).

Usage::

    python -m voxelhex_tpu.serve model.vox --port 8745          # serve
    curl 'localhost:8745/frame?ox=-40&oy=90&oz=-40&tx=64&ty=20&tz=64&w=640&h=360' > f.png
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np


class RenderService:
    """Device-owning render/edit core shared by the HTTP layer and tests."""

    def __init__(self, tree, view_size: int | None = None,
                 fuse_plan: bool = False, async_far: bool = True):
        from voxelhex_tpu.render.bitgrid import BitGridRenderer
        from voxelhex_tpu.render.streaming import StreamingView
        from voxelhex_tpu.tree.flat import flatten

        self.tree = tree
        self._lock = threading.Lock()
        self.frames_served = 0
        # frames that rode a validate-once fast path (no blocking counts
        # read: the fused frame's pose-skip, a delta-stream digest, or
        # the streaming idle-pose cache)
        self.pose_validated_frames = 0
        self.stream_cache_hits = 0  # idle-pose cache hits (streaming)
        self._stream_cache = None  # (key, content_version, frame)
        # fuse_plan: repeat frames replay their compaction schedule as one
        # fused dispatch (local-TPU serving; through the slow-compile
        # tunnel a NEW plan signature stalls minutes, so off by default)
        self.fuse_plan = bool(fuse_plan)
        # async_far: far-ring rebuilds run off the render path (measured
        # win on moving cameras, PERF.md "Fly-over round 4"); old rings
        # serve until the worker's swap, so a flying viewer never stalls
        # on a re-anchor
        self.async_far = bool(async_far)
        if view_size is not None and view_size < tree.size:
            self.view = StreamingView(tree, view_size=view_size,
                                      fuse_plan=self.fuse_plan,
                                      async_far=self.async_far)
            self.renderer = None
        else:
            self.view = None
            self.renderer = BitGridRenderer(flatten(tree),
                                            fuse_plan=self.fuse_plan)

    def render(self, origin, target, resolution, fov_y_deg=50.0, bg=(0, 0, 0)):
        from voxelhex_tpu.render.camera import Camera

        cam = Camera(
            origin=np.asarray(origin, dtype=np.float64),
            target=np.asarray(target, dtype=np.float64),
            resolution=tuple(resolution),
            fov_y_deg=float(fov_y_deg),
        )
        with self._lock:
            if self.view is not None:
                # idle-pose cache: once the view is SETTLED (no pending
                # paging/async work), a repeated pose at the same content
                # version reproduces the frame exactly — serve it with
                # ZERO dispatches (the streaming-path analog of the dense
                # path's delta stream).  While unsettled we always render
                # so the budgeted paging keeps making progress.
                key = (
                    tuple(np.asarray(origin, dtype=np.float32)),
                    tuple(np.asarray(target, dtype=np.float32)),
                    tuple(resolution), float(fov_y_deg), tuple(bg),
                )
                cache = self._stream_cache
                if (cache is not None and cache[0] == key
                        and self.view.settled()
                        and self.view.content_version() == cache[1]):
                    self.pose_validated_frames += 1
                    self.stream_cache_hits += 1
                    self.frames_served += 1
                    # copy: callers may draw into the returned frame, and
                    # the cache's own array must stay pristine
                    return cache[2].copy()
                rgb = self.view.render(cam, bg=bg, out_u8=True)
                if self.view.settled():
                    self._stream_cache = (
                        key, self.view.content_version(), np.asarray(rgb)
                    )
                else:
                    self._stream_cache = None
                r = self.view.renderer
            else:
                r = self.renderer
                # delta-stream serving: an idle viewer re-requesting the
                # same pose costs one dispatch + a 4-byte digest instead
                # of the full u8 payload (render_delta_many; falls back
                # to the standard path until a plan is recorded)
                frames = r.render_delta_many([cam], bg=bg)
                rgb = (frames[0] if frames is not None
                       else r.render(cam, bg=bg, out_u8=True))
            if r is not None and (getattr(r, "last_stats", None) or
                                  {}).get("pose_validated"):
                self.pose_validated_frames += 1
            self.frames_served += 1
            # always hand out a COPY: the delta stream returns its own
            # host baseline array (render_delta_many documents it as
            # read-only) and a caller drawing an overlay in place would
            # otherwise corrupt every future reconstructed frame
            return np.array(rgb, copy=True)

    def apply_edits(self, ops) -> int:
        """Apply a list of edit dicts; returns the number applied.  Edits go
        through the live tree's update path, so streaming views pick them up
        via update triggers (delta uploads)."""
        from voxelhex_tpu.tree.boxtree import Albedo

        if isinstance(ops, dict):
            ops = [ops]
        n = 0
        with self._lock:
            for op in ops:
                pos = tuple(int(v) for v in op["pos"])
                kind = op.get("op", "insert")
                if kind == "insert":
                    c = op.get("color", [255, 255, 255, 255])
                    size = int(op.get("size", 1))
                    if size > 1:
                        self.tree.insert_at_lod(pos, size, Albedo(*(int(v) for v in c)))
                    else:
                        self.tree.insert(pos, Albedo(*(int(v) for v in c)))
                elif kind == "clear":
                    size = int(op.get("size", 1))
                    if size > 1:
                        self.tree.clear_at_lod(pos, size)
                    else:
                        self.tree.clear(pos)
                else:
                    raise ValueError(f"unknown op {kind!r}")
                n += 1
            if self.view is None:
                # whole-scene renderer: refresh the DEVICE CONTENT in
                # place (same-size tree -> same pyramid shape constants,
                # so the jitted programs and recorded plans survive; plan
                # validity re-checks against the new tree and overflowed
                # plans re-record).  invalidate_beam voids the beam grids
                # and the validated-pose/delta baselines — the same
                # content-change hook streaming uses.
                from voxelhex_tpu.render.bitgrid import (
                    build_bitgrid,
                    device_bitgrid,
                )
                from voxelhex_tpu.tree.flat import flatten

                r = self.renderer
                bg = build_bitgrid(flatten(self.tree))
                r.bitgrid = bg
                r.tree = device_bitgrid(
                    bg, color_u8=r.color_u8,
                    skip_rows=(r.tracer_kind == "skip"),
                )
                r.invalidate_beam()
        return n

    def load_scene(self, tree, view_size: int | None = None) -> None:
        """Swap the served scene (drag-drop load in the viewer UI)."""
        from voxelhex_tpu.render.bitgrid import BitGridRenderer
        from voxelhex_tpu.render.streaming import StreamingView
        from voxelhex_tpu.tree.flat import flatten

        with self._lock:
            self.tree = tree
            self._stream_cache = None
            if view_size is not None and view_size < tree.size:
                self.view = StreamingView(tree, view_size=view_size,
                                          fuse_plan=self.fuse_plan,
                                          async_far=self.async_far)
                self.renderer = None
            else:
                self.view = None
                self.renderer = BitGridRenderer(flatten(tree),
                                                fuse_plan=self.fuse_plan)

    def set_view_size(self, view_size: int | None) -> None:
        """Live view-distance control (whisp's view-distance knob,
        whisp/src/ui/mod.rs:10-22): rebuild the render path around the
        current tree with a new streaming window size.  ``None``/0 or a
        size >= the scene renders the whole scene dense (max distance);
        smaller powers of two stream a camera-following window with
        far-field LOD rings behind it."""
        if view_size is not None:
            view_size = int(view_size)
            if view_size <= 0 or view_size >= int(self.tree.size):
                view_size = None
            else:
                from voxelhex_tpu.render.streaming import REGION

                if view_size % REGION:
                    raise ValueError(
                        f"view_size must be a multiple of {REGION}"
                    )
        self.load_scene(self.tree, view_size=view_size)

    def load_vox_bytes(self, data: bytes, name: str = "model.vox",
                       brick_dim: int = 4, cache_dir=None) -> None:
        """Load an uploaded .vox, with a bencode disk cache — the whisp
        loader workflow (whisp/src/loader.rs:51-96: drag-drop -> async
        parse -> versioned ``.cache_<name>`` bencode file; incompatible
        cache versions silently re-parse the source)."""
        import hashlib
        import os
        import tempfile

        from voxelhex_tpu.io import bencode

        safe = "".join(c for c in name if c.isalnum() or c in "._-")
        digest = hashlib.sha1(data).hexdigest()[:16]
        cache = os.path.join(cache_dir or tempfile.gettempdir(),
                             f".vhx_cache_{safe}_{digest}")
        tree = None
        if os.path.exists(cache):
            try:
                tree = bencode.load(cache)
            except Exception:
                tree = None  # version gate failed: re-parse the source
        if tree is None:
            from voxelhex_tpu.io.vox import load_vox_tree

            with tempfile.NamedTemporaryFile(suffix=".vox", delete=False) as f:
                f.write(data)
                path = f.name
            try:
                tree = load_vox_tree(path, brick_dim=brick_dim)
            finally:
                os.unlink(path)
            try:
                bencode.save(tree, cache)
            except Exception:
                pass  # cache is best-effort
        self.load_scene(tree)

    def stats(self) -> dict:
        r = self.view.renderer if self.view is not None else self.renderer
        out = {
            "size": int(self.tree.size),
            "brick_dim": int(self.tree.brick_dim),
            "node_count": int(self.tree.node_count),
            "frames_served": self.frames_served,
            "pose_validated_frames": self.pose_validated_frames,
            "stream_cache_hits": self.stream_cache_hits,
            "streaming": self.view is not None,
            "view_size": (int(self.view.view_size)
                          if self.view is not None else None),
        }
        if self.view is not None and self.view.far is not None:
            out["far_tiers"] = [
                {"factor": t.factor, "cells": t.cells}
                for t in self.view.far.tiers
            ]
        if r is not None and getattr(r, "last_stats", None):
            out["last_trace"] = r.last_stats
        return out


def _png_bytes(rgb_u8: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(rgb_u8).save(buf, format="PNG")
    return buf.getvalue()


def make_server(service: RenderService, host: str = "127.0.0.1",
                port: int = 8745) -> ThreadingHTTPServer:
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def _send(self, code, body, ctype):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            url = urlparse(self.path)
            try:
                if url.path in ("/", "/viewer"):
                    import os

                    page = open(
                        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                     "viewer.html"), "rb"
                    ).read()
                    self._send(200, page, "text/html; charset=utf-8")
                elif url.path == "/frame":
                    q = {k: v[0] for k, v in parse_qs(url.query).items()}
                    origin = [float(q["ox"]), float(q["oy"]), float(q["oz"])]
                    target = [float(q["tx"]), float(q["ty"]), float(q["tz"])]
                    res = (int(q.get("w", 640)), int(q.get("h", 360)))
                    fov = float(q.get("fov", 50.0))
                    rgb = service.render(origin, target, res, fov)
                    self._send(200, _png_bytes(rgb), "image/png")
                elif url.path == "/stats":
                    body = json.dumps(service.stats()).encode()
                    self._send(200, body, "application/json")
                else:
                    self._send(404, b"not found", "text/plain")
            except Exception as e:  # noqa: BLE001 — report to the client
                self._send(500, str(e).encode(), "text/plain")

        def do_POST(self):
            url = urlparse(self.path)
            try:
                if url.path == "/edit":
                    n = int(self.headers.get("Content-Length", 0))
                    ops = json.loads(self.rfile.read(n) or b"{}")
                    applied = service.apply_edits(ops)
                    self._send(200, json.dumps({"applied": applied}).encode(),
                               "application/json")
                elif url.path == "/load":
                    n = int(self.headers.get("Content-Length", 0))
                    data = self.rfile.read(n)
                    q = {k: v[0] for k, v in parse_qs(url.query).items()}
                    service.load_vox_bytes(data, name=q.get("name", "model.vox"))
                    self._send(200, json.dumps(
                        {"loaded": True, "size": int(service.tree.size)}
                    ).encode(), "application/json")
                elif url.path == "/view":
                    # view-distance control (whisp's slider,
                    # whisp/src/ui/mod.rs:10-22): {"view_size": N} streams
                    # an N^3 window (+far-field rings); 0/null = dense
                    n = int(self.headers.get("Content-Length", 0))
                    body = json.loads(self.rfile.read(n) or b"{}")
                    service.set_view_size(body.get("view_size"))
                    self._send(200, json.dumps(service.stats()).encode(),
                               "application/json")
                else:
                    self._send(404, b"not found", "text/plain")
            except Exception as e:  # noqa: BLE001
                self._send(500, str(e).encode(), "text/plain")

    return ThreadingHTTPServer((host, port), Handler)


def main():
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("model", nargs="?", help=".vox file (procedural demo scene if omitted)")
    ap.add_argument("--port", type=int, default=8745)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--view", type=int, default=None,
                    help="streaming view window size (out-of-core scenes)")
    ap.add_argument("--terrain", type=int, default=0, metavar="WORLD",
                    help="serve a procedural WORLD^3 terrain through a "
                         "streaming window (browser fly-through demo; "
                         "default window 256 unless --view given)")
    ap.add_argument("--brick", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--fuse-plan", action="store_true",
                    help="replay frame schedules as one fused dispatch "
                         "(best on local TPU; new shapes compile slowly "
                         "through a remote tunnel)")
    args = ap.parse_args()

    import jax

    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    if args.terrain:
        import importlib.util
        import sys as _sys

        spec = importlib.util.spec_from_file_location(
            "terrain_demo", os.path.join(repo, "examples", "terrain.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        tree = mod.build_terrain(int(args.terrain), brick_dim=args.brick)
        if args.view is None:
            args.view = min(256, int(args.terrain))
    elif args.model:
        from voxelhex_tpu.io.vox import load_vox_tree_cached

        tree = load_vox_tree_cached(args.model, brick_dim=args.brick)
    else:
        from voxelhex_tpu.tree.boxtree import Albedo, BoxTree

        tree = BoxTree(64, 4)
        rng = np.random.default_rng(0)
        for _ in range(500):
            p = tuple(int(v) for v in rng.integers(0, 64, 3))
            tree.insert(p, Albedo(*(int(v) for v in rng.integers(64, 255, 3)), 255))

    service = RenderService(tree, view_size=args.view,
                            fuse_plan=args.fuse_plan)
    srv = make_server(service, args.host, args.port)
    print(f"serving {tree.size}^3 scene on http://{args.host}:{args.port} "
          f"(streaming={service.view is not None})")
    srv.serve_forever()


if __name__ == "__main__":
    main()
