"""Sharded rendering and training over a device mesh.

* forward rendering: rays sharded along the ``rays`` mesh axis, scene
  replicated — embarrassingly parallel, no collectives;
* training step: per-shard gradients all-reduced with ``psum`` across the
  mesh (the gradient of a mean over sharded rays), parameters replicated.

Run on real chips as-is; tests exercise the same code on an 8-device
virtual CPU mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

shard_map = jax.shard_map

from voxelhex_tpu.diff.render import DiffRenderer, shade_diff


def make_ray_mesh(devices=None, axis_name: str = "rays") -> Mesh:
    """A 1-D mesh over all (or the given) devices for ray data-parallelism."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def sharded_render_fn(diff: DiffRenderer, mesh: Mesh, axis_name: str = "rays"):
    """Jitted forward render with rays sharded over the mesh.

    Returns ``render(params, origins, dirs) -> rgb`` where origins/dirs/rgb
    are sharded on axis 0 and params are replicated.
    """
    tree = diff.tree

    def local_render(params, origins, dirs):
        return diff.render(params, origins, dirs)

    sharded = shard_map(
        local_render,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name)),
        out_specs=P(axis_name),
        check_vma=False,
    )
    return jax.jit(sharded)


def sharded_train_step(
    diff: DiffRenderer, mesh: Mesh, optimizer, axis_name: str = "rays"
):
    """One optimizer step with rays sharded and gradients psum-reduced.

    Returns ``step(params, opt_state, origins, dirs, targets) ->
    (params, opt_state, loss)``; the returned function is jitted over the
    mesh.  Gradients are averaged across shards with ``jax.lax.pmean`` so the
    update equals the single-device full-batch step.
    """

    def local_loss(params, origins, dirs, targets):
        rgb = diff.render(params, origins, dirs)
        return jnp.mean((rgb - targets) ** 2)

    def shard_step(params, opt_state, origins, dirs, targets):
        loss, grads = jax.value_and_grad(local_loss)(params, origins, dirs, targets)
        grads = jax.lax.pmean(grads, axis_name)  # all-reduce over ICI
        loss = jax.lax.pmean(loss, axis_name)
        updates, opt_state = optimizer.update(grads, opt_state)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        params = jnp.clip(params, 0.0, 1.0)
        return params, opt_state, loss

    sharded = shard_map(
        shard_step,
        mesh=mesh,
        in_specs=(P(), P(), P(axis_name), P(axis_name), P(axis_name)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def shard_rays(mesh: Mesh, *arrays, axis_name: str = "rays"):
    """Pad ray arrays to a multiple of the mesh size and device_put them with
    the sharded layout.  Returns (padded_arrays, original_count)."""
    n = arrays[0].shape[0]
    per = mesh.shape[axis_name]
    padded_n = ((n + per - 1) // per) * per
    out = []
    for a in arrays:
        a = np.asarray(a)
        if padded_n != n:
            pad = np.zeros((padded_n - n,) + a.shape[1:], dtype=a.dtype)
            a = np.concatenate([a, pad], axis=0)
        sharding = NamedSharding(mesh, P(axis_name))
        out.append(jax.device_put(a, sharding))
    return out, n
