"""Mesh-sharded BitGrid rendering: rays data-parallel, scene replicated.

The forward render needs no collectives (each shard traces its rays against
the replicated pyramid); the differentiable paths reuse
:mod:`voxelhex_tpu.parallel.render` for gradient all-reduce.  This module is
the multi-chip forward path and the scaling-efficiency measurement harness.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from voxelhex_tpu.render.bitgrid import BitGridRenderer
from voxelhex_tpu.render.jax_renderer import _shade

shard_map = jax.shard_map


def sharded_render_fn(renderer: BitGridRenderer, mesh: Mesh, axis: str = "rays"):
    """Jitted ``render(tree, origins, dirs, bg) -> rgb`` with rays sharded
    over the mesh and the BitGrid replicated."""
    trace = renderer._trace

    def local(tree, o, d, bg):
        hit, voxel, _hv, _hp, hnormal = trace(tree, o, d)
        return _shade(tree, hit, voxel, hnormal, bg)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    return jax.jit(fn)


def shard_rays(mesh: Mesh, *arrays, axis: str = "rays"):
    n = arrays[0].shape[0]
    per = mesh.shape[axis]
    padded = ((n + per - 1) // per) * per
    out = []
    for a in arrays:
        a = np.asarray(a)
        if padded != n:
            a = np.concatenate(
                [a, np.zeros((padded - n,) + a.shape[1:], dtype=a.dtype)]
            )
        out.append(jax.device_put(a, NamedSharding(mesh, P(axis))))
    return out, n


def measure_scaling(renderer: BitGridRenderer, origins, dirs, device_counts=None):
    """Rays/sec at different mesh sizes (weak scaling per device).

    Returns {n_devices: rays_per_sec}; efficiency(n) =
    rate(n) / (n * rate(1)).
    """
    devices = jax.devices()
    if device_counts is None:
        device_counts = [n for n in (1, 2, 4, 8) if n <= len(devices)]
    origins = np.asarray(origins, dtype=np.float32).reshape(-1, 3)
    dirs = np.asarray(dirs, dtype=np.float32).reshape(-1, 3)
    bg = jnp.zeros(3, dtype=jnp.float32)

    results = {}
    for n in device_counts:
        mesh = Mesh(np.array(devices[:n]), ("rays",))
        fn = sharded_render_fn(renderer, mesh)
        # weak scaling: each device gets the full per-device batch
        o_n = np.tile(origins, (n, 1))
        d_n = np.tile(dirs, (n, 1))
        (o_sh, d_sh), _ = shard_rays(mesh, o_n, d_n)
        out = fn(renderer.tree, o_sh, d_sh, bg)
        jax.block_until_ready(out)
        t0 = time.time()
        out = fn(renderer.tree, o_sh, d_sh, bg)
        jax.block_until_ready(out)
        dt = time.time() - t0
        results[n] = o_n.shape[0] / dt
    return results
