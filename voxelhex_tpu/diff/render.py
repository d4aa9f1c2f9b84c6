"""Differentiable renderer over a flat boxtree.

Structure (occupancy, tree topology) is treated as fixed; per-voxel albedo is
the trainable parameter:

* ``densify`` rewrites solid brick descriptors into real bricks so every
  potential hit addresses a trainable voxel;
* the ray-march (non-differentiable, int outputs) produces per-ray
  ``(brick, cell)`` hit coordinates;
* shading gathers ``albedo[brick, cell]`` — a linear op whose VJP scatters
  pixel gradients back into the albedo tensor.

Gradients w.r.t. geometry (occupancy) need a soft-transmittance forward pass
and are provided separately (see ROADMAP).
"""

from __future__ import annotations

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np

from voxelhex_tpu.constants import BOX_NODE_CHILDREN_COUNT
from voxelhex_tpu.render.jax_renderer import (
    F32,
    I32,
    _make_trace_ray,
    device_tree,
)
from voxelhex_tpu.tree.flat import EMPTY_DESC, NO_COLOR_HIT, SOLID_FLAG, FlatTree

LIGHT = np.array([-0.5, 0.5, -0.5], dtype=np.float32)


def densify(flat: FlatTree) -> FlatTree:
    """Expand solid brick descriptors into parted bricks (one brick per
    descriptor slot group) so hits always carry (brick, cell) indices."""
    d3 = flat.brick_dim**3
    children = flat.node_children.copy()
    mips = flat.node_mips.copy()
    new_bricks = [flat.bricks]
    next_idx = flat.bricks.shape[0]

    def expand(desc: int) -> int:
        nonlocal next_idx
        value = desc & ~SOLID_FLAG
        new_bricks.append(np.full((1, d3), value, dtype=np.int32))
        idx = next_idx
        next_idx += 1
        return idx

    for key in range(flat.n_nodes):
        meta = int(flat.node_meta[key])
        if not meta & 1:  # internal: children are node keys
            continue
        if meta & 2:  # uniform: one descriptor replicated
            desc = int(children[key, 0])
            if desc != EMPTY_DESC and desc & SOLID_FLAG:
                children[key, :] = expand(desc)
        else:
            for s in range(BOX_NODE_CHILDREN_COUNT):
                desc = int(children[key, s])
                if desc != EMPTY_DESC and desc & SOLID_FLAG:
                    children[key, s] = expand(desc)
    for key in range(flat.n_nodes):
        desc = int(mips[key])
        if desc != EMPTY_DESC and desc & SOLID_FLAG:
            mips[key] = expand(desc)

    bricks = np.concatenate(new_bricks, axis=0) if len(new_bricks) > 1 else flat.bricks
    return replace(flat, node_children=children, node_mips=mips, bricks=bricks)


def albedo_params_from_flat(flat: FlatTree) -> jnp.ndarray:
    """Initial per-voxel albedo [B, d^3, 3] from the palette colors."""
    vox = np.maximum(flat.bricks, 0)
    vox = np.minimum(vox, flat.palette.shape[0] - 1)
    alb = flat.palette[vox][:, :, :3].astype(np.float32)
    alb[flat.bricks < 0] = 0.0
    alb[flat.bricks == NO_COLOR_HIT] = 0.0
    return jnp.asarray(alb)


def shade_diff(albedo_rgb, hit, normal, bg):
    """Reference shading, differentiable in albedo."""
    light = jnp.asarray(LIGHT)
    lambert = jnp.sum(normal * light[None, :], axis=-1) / 2.0 + 0.5
    lit = albedo_rgb * lambert[:, None]
    return jnp.where(hit[:, None], lit, jnp.broadcast_to(bg, lit.shape))


class DiffRenderer:
    """Differentiable forward renderer + loss/grad helpers.

    ``render(params, origins, dirs)`` is fully jittable and differentiable
    w.r.t. ``params`` (the [B, d^3, 3] per-voxel albedo).
    """

    def __init__(self, flat: FlatTree, max_inner: int = 2048):
        self.flat = densify(flat)
        self.tree = device_tree(self.flat)
        self.brick_dim = self.flat.brick_dim
        self._trace = _make_trace_ray(self.flat.brick_dim, max_inner=max_inner)

    def init_params(self) -> jnp.ndarray:
        return albedo_params_from_flat(self.flat)

    def trace_rays(self, origins, dirs):
        """Non-differentiable geometry pass: per-ray hit data."""
        return jax.vmap(lambda o, d: self._trace(self.tree, o, d))(origins, dirs)

    def render(self, params, origins, dirs, bg=jnp.zeros(3, dtype=F32)):
        hit, _voxel, brick, cell, _point, normal = self.trace_rays(origins, dirs)
        brick_c = jnp.clip(brick, 0, params.shape[0] - 1)
        cell_c = jnp.clip(cell, 0, params.shape[1] - 1)
        albedo = params[brick_c, cell_c]
        albedo = jnp.where((hit & (brick >= 0))[:, None], albedo, 0.0)
        normal = jax.lax.stop_gradient(normal)
        return shade_diff(albedo, hit, normal, jnp.asarray(bg, dtype=F32))

    def loss(self, params, origins, dirs, target, bg=jnp.zeros(3, dtype=F32)):
        rgb = self.render(params, origins, dirs, bg)
        return jnp.mean((rgb - target) ** 2)
