"""Viewport / camera math.

Equivalent of the reference Viewport (reference:
src/raytracing/bevy/types.rs:61-88, view.rs:211-239): a pinhole camera in the
tree's left-handed Y-up world.  Ray generation is vectorized NumPy producing
[H, W, 3] origin/direction arrays the device renderers consume directly.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


def _normalize(v):
    v = np.asarray(v, dtype=np.float32)
    return v / np.linalg.norm(v)


@dataclass
class Camera:
    origin: np.ndarray
    target: np.ndarray
    up: np.ndarray = field(default_factory=lambda: np.array([0.0, 1.0, 0.0]))
    fov_y_deg: float = 50.0
    resolution: tuple[int, int] = (1280, 720)  # (width, height)

    def basis(self):
        forward = _normalize(np.asarray(self.target) - np.asarray(self.origin))
        up_hint = _normalize(np.asarray(self.up, dtype=np.float32))
        # Near-degenerate look-at (view direction almost parallel to the up
        # hint): orthogonalize the SUPPLIED up against forward (Gram-Schmidt)
        # so an orbiting camera crossing straight-down/up keeps a continuous
        # roll instead of snapping ~90° to a world axis; only when the
        # residual truly vanishes (exactly parallel — no roll information
        # left in the hint) fall back to a fixed non-parallel axis.
        resid = up_hint - float(np.dot(up_hint, forward)) * forward
        rn = float(np.linalg.norm(resid))
        if rn > 1e-6:
            up_hint = resid / rn
        else:
            up_hint = np.array(
                [0.0, 0.0, 1.0] if abs(forward[2]) < 0.9 else [1.0, 0.0, 0.0],
                dtype=np.float32,
            )
        right = _normalize(np.cross(up_hint, forward))
        up = np.cross(forward, right)
        return forward, right, up

    def view_matrix(self) -> np.ndarray:
        """Right-handed look-at view matrix (reference:
        src/raytracing/bevy/view.rs:211-239)."""
        forward, right, up = self.basis()
        eye = np.asarray(self.origin, dtype=np.float32)
        m = np.eye(4, dtype=np.float32)
        m[0, :3], m[1, :3], m[2, :3] = right, up, -forward
        m[0, 3] = -float(np.dot(right, eye))
        m[1, 3] = -float(np.dot(up, eye))
        m[2, 3] = float(np.dot(forward, eye))
        return m

    def projection_matrix(self, near: float = 0.1, far: float = 4096.0) -> np.ndarray:
        """Perspective projection from fov/aspect (reference: view.rs:211-239)."""
        w, h = self.resolution
        aspect = w / h
        f = 1.0 / np.tan(np.radians(self.fov_y_deg) / 2.0)
        m = np.zeros((4, 4), dtype=np.float32)
        m[0, 0] = f / aspect
        m[1, 1] = f
        m[2, 2] = (far + near) / (near - far)
        m[2, 3] = 2.0 * far * near / (near - far)
        m[3, 2] = -1.0
        return m

    def rays(self):
        """Returns (origins [H,W,3] f32, directions [H,W,3] f32, normalized).

        Pixel (0, 0) is the top-left of the image.
        """
        w, h = self.resolution
        forward, right, up = self.basis()
        aspect = w / h
        tan_half = np.tan(np.radians(self.fov_y_deg) / 2.0)
        px = (np.arange(w) + 0.5) / w * 2.0 - 1.0  # [-1, 1] left -> right
        py = 1.0 - (np.arange(h) + 0.5) / h * 2.0  # [1, -1] top -> bottom
        dirs = (
            forward[None, None, :]
            + px[None, :, None] * tan_half * aspect * right[None, None, :]
            + py[:, None, None] * tan_half * up[None, None, :]
        )
        dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
        origins = np.broadcast_to(
            np.asarray(self.origin, dtype=np.float32), dirs.shape
        )
        return origins.astype(np.float32), dirs.astype(np.float32)


@dataclass
class Viewport:
    """Reference-parity viewport state around a :class:`Camera` (reference:
    src/raytracing/bevy/types.rs:61-88 ``Viewport`` and view.rs:247-256
    ``move_viewport``/``set_viewport_origin``).

    Accumulates ``origin_delta`` between render updates; the streaming layer
    re-pages when the origin leaves its brick-aligned slot (reference:
    bevy/mod.rs:93-161 ``handle_viewport_position_updates``)."""

    camera: Camera
    frustum: np.ndarray = field(
        default_factory=lambda: np.array([2.0, 2.0, 4096.0], dtype=np.float32)
    )
    origin_delta: np.ndarray = field(
        default_factory=lambda: np.zeros(3, dtype=np.float32)
    )

    @property
    def origin(self) -> np.ndarray:
        return np.asarray(self.camera.origin, dtype=np.float32)

    @property
    def direction(self) -> np.ndarray:
        f, _r, _u = self.camera.basis()
        return f

    def move_viewport(self, delta) -> None:
        d = np.asarray(delta, dtype=np.float32)
        self.camera.origin = np.asarray(self.camera.origin) + d
        self.camera.target = np.asarray(self.camera.target) + d
        self.origin_delta = self.origin_delta + d

    def set_viewport_origin(self, origin) -> None:
        o = np.asarray(origin, dtype=np.float32)
        self.origin_delta = self.origin_delta + (o - self.origin)
        self.camera.target = (
            np.asarray(self.camera.target) + o - np.asarray(self.camera.origin)
        )
        self.camera.origin = o

    def take_origin_delta(self) -> np.ndarray:
        """Consume the accumulated origin movement (the per-frame check in
        the reference clears origin_delta after handling it)."""
        d = self.origin_delta
        self.origin_delta = np.zeros(3, dtype=np.float32)
        return d

    def left_brick_slot(self, brick_dim: int) -> bool:
        """Has the accumulated movement left the brick-aligned cube the
        viewport started in? (the reference's re-page trigger)"""
        from voxelhex_tpu.spatial.math import brick_slot_for, cube_contains

        prev = self.origin - self.origin_delta
        slot_min, slot_size = brick_slot_for(prev, brick_dim)
        return not cube_contains(slot_min, slot_size, self.origin)

    def update_matrices(self):
        """(view, projection, inverse view-projection) — the uniform block
        the reference uploads per frame (view.rs:211-239)."""
        view = self.camera.view_matrix()
        proj = self.camera.projection_matrix(far=float(self.frustum[2]))
        vp = proj @ view
        return view, proj, np.linalg.inv(vp)


def orbit_camera(
    scene_size: float,
    yaw_deg: float = 40.0,
    pitch_deg: float = 30.0,
    distance_factor: float = 1.8,
    resolution=(1280, 720),
    fov_y_deg: float = 50.0,
) -> Camera:
    """Camera orbiting the scene center — the gpu_render example's pan-orbit
    setup (reference: examples/gpu_render.rs:101-121)."""
    center = np.array([scene_size / 2.0] * 3, dtype=np.float32)
    r = scene_size * distance_factor
    yaw, pitch = np.radians(yaw_deg), np.radians(pitch_deg)
    offset = np.array(
        [
            r * np.cos(pitch) * np.sin(yaw),
            r * np.sin(pitch),
            -r * np.cos(pitch) * np.cos(yaw),
        ],
        dtype=np.float32,
    )
    return Camera(
        origin=center + offset,
        target=center,
        resolution=resolution,
        fov_y_deg=fov_y_deg,
    )


# ---------------------------------------------------------------------------
# device-side ray generation
# ---------------------------------------------------------------------------

_raygen_cache: dict = {}


def raygen_body(w: int, h: int):
    """TRACEABLE ray generator: ``gen(origin, right, up, forward, scale) ->
    (o [w*h,3], d [w*h,3])``.  Composable into larger jitted programs (the
    fused frame program traces raygen in, so a frame costs ONE dispatch);
    :func:`device_rays` jits it standalone."""
    import jax.numpy as jnp

    def gen(origin, right, up, forward, scale):
        px = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w * 2.0 - 1.0
        py = 1.0 - (jnp.arange(h, dtype=jnp.float32) + 0.5) / h * 2.0
        d = (
            forward[None, None, :]
            + px[None, :, None] * scale[0] * right[None, None, :]
            + py[:, None, None] * scale[1] * up[None, None, :]
        )
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        o = jnp.broadcast_to(origin, d.shape)
        return o.reshape(-1, 3), d.reshape(-1, 3)

    return gen


def raygen_rows_body(w: int, h: int, rows: int):
    """TRACEABLE ray generator for a horizontal BAND of the frame:
    ``gen(origin, right, up, forward, scale, row0) -> (o [rows*w, 3],
    d [rows*w, 3])`` — rows ``[row0, row0+rows)`` of the full ``w x h``
    pixel grid, bit-identical to the same rows of :func:`raygen_body`.

    This is the per-shard generator for mesh-sharded renderers: rays are
    row-major, so sharding a frame over a ``rays`` mesh axis gives each
    shard a contiguous row band — each shard derives ITS OWN rays from
    ~60 B of (replicated) camera params and ``row0 = axis_index * rows``,
    so nothing per-ray ever crosses host->device (the PERF.md transfer
    discipline; the reference likewise derives rays in-shader,
    viewport_render.wgsl:689-700)."""
    import jax.numpy as jnp

    def gen(origin, right, up, forward, scale, row0):
        px = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w * 2.0 - 1.0
        py = 1.0 - (row0 + jnp.arange(rows, dtype=jnp.float32) + 0.5) / h * 2.0
        d = (
            forward[None, None, :]
            + px[None, :, None] * scale[0] * right[None, None, :]
            + py[:, None, None] * scale[1] * up[None, None, :]
        )
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        o = jnp.broadcast_to(origin, d.shape)
        return o.reshape(-1, 3), d.reshape(-1, 3)

    return gen


def camera_params(camera: "Camera"):
    """The ~60 bytes of host->device camera state raygen_body consumes."""
    import jax.numpy as jnp

    w, h = camera.resolution
    forward, right, up = camera.basis()
    tan_half = float(np.tan(np.radians(camera.fov_y_deg) / 2.0))
    aspect = w / h
    return (
        jnp.asarray(np.asarray(camera.origin, dtype=np.float32)),
        jnp.asarray(right.astype(np.float32)),
        jnp.asarray(up.astype(np.float32)),
        jnp.asarray(forward.astype(np.float32)),
        jnp.asarray(
            np.array([tan_half * aspect, tan_half], dtype=np.float32)
        ),
    )


def device_rays(camera: "Camera"):
    """Generate the camera's rays ON DEVICE: ``(origins, dirs)`` as
    ``[(h*w), 3]`` f32 device arrays.

    Only ~60 bytes of camera parameters cross host->device instead of
    ``2 * H * W * 3`` floats — through a remote-TPU tunnel the per-frame ray
    upload otherwise dominates frame time.  One tiny program compiles per
    resolution.  Math mirrors :meth:`Camera.rays` exactly (the reference
    derives rays from the inverse view-projection per pixel,
    viewport_render.wgsl:689-700; same pinhole geometry).
    """
    import jax
    import jax.numpy as jnp

    w, h = camera.resolution
    fn = _raygen_cache.get((w, h))
    if fn is None:
        fn = jax.jit(raygen_body(w, h))
        _raygen_cache[(w, h)] = fn

    import jax.numpy as jnp

    forward, right, up = camera.basis()
    tan_half = float(np.tan(np.radians(camera.fov_y_deg) / 2.0))
    aspect = w / h
    return fn(
        jnp.asarray(np.asarray(camera.origin, dtype=np.float32)),
        jnp.asarray(right),
        jnp.asarray(up),
        jnp.asarray(forward),
        jnp.asarray([tan_half * aspect, tan_half], dtype=np.float32),
    )
