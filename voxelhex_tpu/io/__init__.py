"""Scene I/O: MagicaVoxel import, flat-array checkpoints, and the
reference-compatible bencode interchange format."""

from voxelhex_tpu.io.vox import load_vox_scene, load_vox_tree, parse_vox

__all__ = ["bencode", "load_vox_scene", "load_vox_tree", "parse_vox"]


def __getattr__(name):
    if name == "bencode":
        import importlib

        return importlib.import_module("voxelhex_tpu.io.bencode")
    raise AttributeError(f"module 'voxelhex_tpu.io' has no attribute '{name}'")
