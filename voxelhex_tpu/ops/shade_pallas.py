"""Fused shading kernel: palette lookup on the MXU + lambert + background.

Color resolution is a per-ray gather ``palette[voxel_index]``; on TPU that
gather runs on the scalar core (~6 ns/ray — see PERF.md).  For the palette
sizes real scenes use (tens to a few thousand colors) the lookup is cheaper
as a one-hot matmul on the MXU: ``onehot(idx, P) @ palette`` is exact (0/1
weights) and fully vector-unit work.  The kernel fuses the lookup with the
reference shading model (albedo * (dot(n, L)/2 + 0.5), background on miss —
reference: viewport_render.wgsl:749-753).

Grid: one program per tile of ``TILE`` rays; palette resident in VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from voxelhex_tpu.tree.flat import EMPTY_DESC

TILE = 1024
LIGHT = np.array([-0.5, 0.5, -0.5], dtype=np.float32)


def shade_reference(hit, voxel, normal, palette, bg):
    """XLA reference implementation (gather-based)."""
    has_color = hit & (voxel >= 0) & (voxel < palette.shape[0])
    albedo = palette[jnp.clip(voxel, 0, palette.shape[0] - 1), :3]
    albedo = jnp.where(has_color[:, None], albedo, 0.0)
    lambert = jnp.sum(normal * jnp.asarray(LIGHT)[None, :], axis=-1) / 2.0 + 0.5
    lit = albedo * lambert[:, None]
    return jnp.where(hit[:, None], lit, jnp.broadcast_to(bg, lit.shape))


def _shade_kernel(hit_ref, voxel_ref, normal_ref, bg_ref, palette_ref, out_ref):
    P = palette_ref.shape[0]
    voxel = voxel_ref[:]  # [TILE]
    hit_f = (hit_ref[:] != 0).astype(jnp.float32)  # keep masks 32-bit:
    # Mosaic cannot insert a minor dim on packed bool vectors
    normal = normal_ref[:]  # [TILE, 3]

    # one-hot palette lookup on the MXU (exact: weights are 0/1)
    idx = jnp.clip(voxel, 0, P - 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (TILE, P), 1)
    onehot = (cols == idx[:, None]).astype(jnp.float32)
    albedo = jnp.dot(
        onehot, palette_ref[:, :3], preferred_element_type=jnp.float32
    )  # [TILE, 3]

    has_color = hit_f * ((voxel >= 0) & (voxel < P)).astype(jnp.float32)
    albedo = albedo * has_color[:, None]
    # LIGHT inlined as literals (kernels cannot capture array constants)
    lambert = (
        normal[:, 0] * (-0.5) + normal[:, 1] * 0.5 + normal[:, 2] * (-0.5)
    ) / 2.0 + 0.5
    lit = albedo * lambert[:, None]
    bg = bg_ref[0, :]
    out_ref[:] = lit * hit_f[:, None] + bg[None, :] * (1.0 - hit_f)[:, None]


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_shade(hit, voxel, normal, palette, bg, interpret=False):
    """Shade rays with the fused Pallas kernel.

    * hit bool[R], voxel int32[R], normal f32[R,3], palette f32[P,4],
      bg f32[3] -> rgb f32[R,3]

    R pads up to a TILE multiple internally.
    """
    R = hit.shape[0]
    padded = ((R + TILE - 1) // TILE) * TILE
    if padded != R:
        pad = padded - R
        hit = jnp.concatenate([hit, jnp.zeros(pad, dtype=hit.dtype)])
        voxel = jnp.concatenate([voxel, jnp.full(pad, EMPTY_DESC, dtype=voxel.dtype)])
        normal = jnp.concatenate([normal, jnp.zeros((pad, 3), dtype=normal.dtype)])

    grid = padded // TILE
    out = pl.pallas_call(
        _shade_kernel,
        out_shape=jax.ShapeDtypeStruct((padded, 3), jnp.float32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full palette each tile
        ],
        out_specs=pl.BlockSpec((TILE, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(hit.astype(jnp.int32), voxel, normal, bg.reshape(1, 3), palette)
    return out[:R]
