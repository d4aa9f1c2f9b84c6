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


def sharded_train_step_pipelined(
    diff: DiffRenderer,
    mesh: Mesh,
    optimizer,
    axis_name: str = "rays",
    microbatches: int = 4,
):
    """Train step with the gradient all-reduce PIPELINED against the
    backward march: rays split into ``microbatches``; each microbatch's
    gradients are ``psum``-reduced immediately, and since that collective
    has no data dependency on the next microbatch's compute, XLA's
    latency-hiding scheduler overlaps it with the next backward pass.  The
    plain step (:func:`sharded_train_step`) leaves one big all-reduce as a
    serial tail after ALL compute instead.

    Numerically identical to the plain step (psum is linear): gradients sum
    over microbatches and divide by ``microbatches * n_devices``.
    """
    n_dev = mesh.devices.size

    def local_loss(params, origins, dirs, targets):
        rgb = diff.render(params, origins, dirs)
        return jnp.mean((rgb - targets) ** 2)

    def shard_step(params, opt_state, origins, dirs, targets):
        K = microbatches
        o = origins.reshape(K, -1, origins.shape[-1])
        d = dirs.reshape(K, -1, dirs.shape[-1])
        t = targets.reshape(K, -1, targets.shape[-1])

        def mb(gsum, xs):
            ok, dk, tk = xs
            loss_k, g = jax.value_and_grad(local_loss)(params, ok, dk, tk)
            # per-microbatch all-reduce: independent of the next microbatch,
            # so it can ride ICI while the next backward march runs
            g = jax.lax.psum(g, axis_name)
            loss_k = jax.lax.psum(loss_k, axis_name)
            return jax.tree.map(jnp.add, gsum, g), loss_k

        g0 = jax.tree.map(jnp.zeros_like, params)
        gsum, losses = jax.lax.scan(mb, g0, (o, d, t))
        grads = jax.tree.map(lambda g: g / (K * n_dev), gsum)
        loss = jnp.mean(losses) / n_dev
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
