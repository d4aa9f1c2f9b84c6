"""Scene I/O: MagicaVoxel import and flat-array checkpoints."""

from voxelhex_tpu.io.vox import load_vox_scene, load_vox_tree, parse_vox

__all__ = ["load_vox_scene", "load_vox_tree", "parse_vox"]
