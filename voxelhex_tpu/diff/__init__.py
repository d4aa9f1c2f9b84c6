"""Differentiable rendering: pixel gradients flow back into voxel albedo.

New capability relative to the reference (which is forward-only); design per
the TPU-native plan: the discrete ray traversal finds per-pixel (brick, voxel)
hit indices, and the shading is expressed as differentiable gathers from a
per-voxel albedo parameter so the VJP scatters pixel gradients into the brick
pool.
"""

from voxelhex_tpu.diff.render import DiffRenderer, albedo_params_from_flat, densify
from voxelhex_tpu.diff.fit import fit_albedo

__all__ = ["DiffRenderer", "albedo_params_from_flat", "densify", "fit_albedo"]
