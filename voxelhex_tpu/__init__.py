"""voxelhex_tpu — a TPU-native differentiable sparse-voxel renderer.

A from-scratch JAX/XLA framework with the capabilities of the VoxelHex
sparse voxel-brick 64-tree raytracer (Rust/WGPU), redesigned for TPU
hardware.  See ARCHITECTURE.md for the design and PERF.md for the hardware
model that shaped it.

Quick start::

    from voxelhex_tpu import BoxTree, Albedo, fastest_renderer, orbit_camera

    tree = BoxTree(size=64, brick_dim=4)
    tree.insert((1, 2, 3), Albedo.from_u32(0xFF0000FF))
    image = fastest_renderer(tree).render(orbit_camera(64))
"""

__version__ = "0.1.0"

from voxelhex_tpu.constants import (
    BOX_NODE_CHILDREN_COUNT,
    BOX_NODE_DIMENSION,
    EMPTY_U16,
    EMPTY_U32,
    EMPTY_VOXEL,
)


def __getattr__(name):
    # Lazy re-exports keep `import voxelhex_tpu` light (no JAX import until a
    # renderer is actually requested).
    if name in ("BoxTree", "Albedo", "Entry"):
        from voxelhex_tpu.tree import boxtree

        return getattr(boxtree, name)
    if name == "flatten":
        from voxelhex_tpu.tree.flat import flatten

        return flatten
    if name == "fastest_renderer":
        from voxelhex_tpu.render import fastest_renderer

        return fastest_renderer
    if name in ("Camera", "orbit_camera"):
        from voxelhex_tpu.render import camera

        return getattr(camera, name)
    if name in ("load_vox_tree", "load_vox_tree_cached", "load_vox_scene"):
        from voxelhex_tpu.io import vox

        return getattr(vox, name)
    if name in ("save_tree", "load_tree", "save_flat", "load_flat"):
        from voxelhex_tpu.io import checkpoint

        return getattr(checkpoint, name)
    if name == "bencode":
        import importlib

        return importlib.import_module("voxelhex_tpu.io.bencode")
    if name == "NativeEditTree":
        from voxelhex_tpu.tree.native_edit import NativeEditTree

        return NativeEditTree
    if name == "StreamingView":
        from voxelhex_tpu.render.streaming import StreamingView

        return StreamingView
    if name == "SoftRenderer":
        from voxelhex_tpu.diff.soft import SoftRenderer

        return SoftRenderer
    if name == "RenderService":
        from voxelhex_tpu.serve import RenderService

        return RenderService
    raise AttributeError(f"module 'voxelhex_tpu' has no attribute '{name}'")


__all__ = [
    "Albedo",
    "BOX_NODE_CHILDREN_COUNT",
    "BOX_NODE_DIMENSION",
    "bencode",
    "BoxTree",
    "Camera",
    "EMPTY_U16",
    "EMPTY_U32",
    "EMPTY_VOXEL",
    "Entry",
    "fastest_renderer",
    "flatten",
    "load_flat",
    "load_tree",
    "load_vox_scene",
    "load_vox_tree",
    "load_vox_tree_cached",
    "NativeEditTree",
    "orbit_camera",
    "RenderService",
    "save_flat",
    "save_tree",
    "SoftRenderer",
    "StreamingView",
    "__version__",
]
