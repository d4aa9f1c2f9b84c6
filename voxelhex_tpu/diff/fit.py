"""Albedo fitting: optimize per-voxel colors from target images.

The BASELINE "differentiable fit" configuration: render a scene from several
viewpoints, perturb / reinitialize the albedo, and recover the original colors
by gradient descent through the renderer.  Supports single-device and
mesh-sharded (rays data-parallel, params replicated, grads all-reduced)
execution — see :mod:`voxelhex_tpu.parallel`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from voxelhex_tpu.diff.render import DiffRenderer


def fit_albedo(
    diff: DiffRenderer,
    origins,
    dirs,
    targets,
    steps: int = 200,
    lr: float = 0.05,
    params0=None,
    precompute_hits: bool = True,
    checkpoint_path=None,
    checkpoint_every: int = 0,
    chain: int = 8,
):
    """Fit per-voxel albedo to target pixels.

    * ``origins/dirs`` — [R, 3] ray batch (all viewpoints concatenated)
    * ``targets`` — [R, 3] target pixel colors
    * ``precompute_hits`` — trace once and train on cached (brick, cell)
      indices (the structure is static; this is the fast path)
    * ``checkpoint_path`` / ``checkpoint_every`` — save (step, params,
      optimizer state) periodically; a restarted fit with the same path
      resumes where it stopped (identical results to an uninterrupted run)
    * ``chain`` — grad steps per dispatch: full blocks run as one
      scanned program with one blocking loss fetch (the per-step loop
      pays a dispatch + host round-trip per step); remainder blocks run
      per-step, results bit-identical (same policy as
      :func:`voxelhex_tpu.diff.soft.fit_soft`)

    Returns (params, losses).
    """
    origins = jnp.asarray(origins).reshape(-1, 3)
    dirs = jnp.asarray(dirs).reshape(-1, 3)
    targets = jnp.asarray(targets).reshape(-1, 3)

    params = diff.init_params() if params0 is None else jnp.asarray(params0)
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    start = 0
    if checkpoint_path:
        import os

        from voxelhex_tpu.io.checkpoint import load_train_state, save_train_state

        if os.path.exists(checkpoint_path):
            start, params, opt_state = load_train_state(
                checkpoint_path, params, opt_state
            )

    if precompute_hits:
        hit, _voxel, brick, cell, _point, normal = jax.jit(diff.trace_rays)(
            origins, dirs
        )
        from voxelhex_tpu.diff.render import shade_diff

        def loss_fn(p):
            brick_c = jnp.clip(brick, 0, p.shape[0] - 1)
            cell_c = jnp.clip(cell, 0, p.shape[1] - 1)
            albedo = p[brick_c, cell_c]
            albedo = jnp.where((hit & (brick >= 0))[:, None], albedo, 0.0)
            rgb = shade_diff(albedo, hit, normal, jnp.zeros(3))
            return jnp.mean((rgb - targets) ** 2)

    else:

        def loss_fn(p):
            return diff.loss(p, origins, dirs, targets)

    def step_math(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        params = jnp.clip(params, 0.0, 1.0)
        return params, opt_state, loss

    step = jax.jit(step_math)
    chain = max(1, int(chain))

    @jax.jit
    def step_block(params, opt_state):
        def one(carry, _):
            p, s, loss = step_math(*carry)
            return (p, s), loss

        (p, s), ls = jax.lax.scan(
            one, (params, opt_state), None, length=chain
        )
        return p, s, ls

    losses = []
    i = start
    while i < steps:
        stop = steps
        if checkpoint_path and checkpoint_every:
            stop = min(stop, ((i // checkpoint_every) + 1) * checkpoint_every)
        if chain > 1 and stop - i >= chain:
            params, opt_state, ls = step_block(params, opt_state)
            losses.extend(float(l) for l in np.asarray(ls))
            i += chain
        else:
            params, opt_state, loss = step(params, opt_state)
            losses.append(float(loss))
            i += 1
        if checkpoint_path and checkpoint_every and i % checkpoint_every == 0:
            save_train_state(checkpoint_path, i, params, opt_state)
    if checkpoint_path and start < steps:
        save_train_state(checkpoint_path, steps, params, opt_state)
    return params, losses
