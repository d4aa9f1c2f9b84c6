"""Flat SoA snapshot of a boxtree — the device-side scene representation.

The pointer tree flattens into the same layout the reference streams to its
GPU (reference: src/raytracing/bevy/types.rs:205-255 `BoxTreeRenderData`),
redesigned for JAX:

* ``node_meta    uint32[N]``   — bit0: is-leaf, bit1: is-uniform
* ``node_children int32[N,64]``— internal: child node key (-1 = none);
                                 leaf: per-sectant brick descriptor;
                                 uniform: the descriptor replicated in all 64
                                 slots (so gathers need no special case)
* ``node_ocbits  uint32[N,2]`` — 64-bit sectant occupancy as (lo, hi) words
* ``node_mips    int32[N]``    — MIP brick descriptor (-1 = none)
* ``bricks       int32[B,d^3]``— brick pool; each voxel is -1 (empty),
                                 a color palette index, or NO_COLOR_HIT for
                                 data-only voxels (hit but colorless);
                                 voxel emptiness is resolved at flatten time
                                 so the kernel needs a single gather
* ``palette      float32[P,4]``— RGBA in [0,1]

Brick descriptor encoding (int32): ``-1`` empty; bit 30 set = solid with the
voxel value in the low 30 bits; otherwise an index into the brick pool.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import numpy as np

from voxelhex_tpu.constants import BOX_NODE_CHILDREN_COUNT, EMPTY_U16
from voxelhex_tpu.tree.boxtree import (
    INTERNAL,
    LEAF,
    UNIFORM,
    BoxTree,
    pix_color_index,
    pix_data_index,
)

EMPTY_DESC = -1
SOLID_FLAG = 1 << 30
META_LEAF = 1
META_UNIFORM = 2

# Voxel sentinel: occupied voxel that carries no color (data-only).
NO_COLOR_HIT = 0x3FFFFFFE


@dataclass
class FlatTree:
    """Immutable flat snapshot; all arrays are NumPy and upload verbatim."""

    size: int
    brick_dim: int
    node_meta: np.ndarray  # uint32[N]
    node_children: np.ndarray  # int32[N, 64]
    node_ocbits: np.ndarray  # uint32[N, 2]
    node_mips: np.ndarray  # int32[N]
    bricks: np.ndarray  # int32[B, d^3]
    palette: np.ndarray  # float32[P, 4]
    # Per-brick 64-bit occupancy (4x4x4 downsample) as (lo, hi) u32 words.
    # For brick_dim <= 4 the bitmap IS the full-resolution voxel occupancy,
    # letting renderers march bricks with zero voxel fetches.
    brick_ocbits: np.ndarray = None  # uint32[B, 2]

    @property
    def n_nodes(self) -> int:
        return int(self.node_meta.shape[0])

    @property
    def n_bricks(self) -> int:
        return int(self.bricks.shape[0])

    def is_leaf(self, key: int) -> bool:
        return bool(self.node_meta[key] & META_LEAF)

    def is_uniform(self, key: int) -> bool:
        return bool(self.node_meta[key] & META_UNIFORM)

    def occupied64(self, key: int) -> int:
        return int(self.node_ocbits[key, 0]) | (int(self.node_ocbits[key, 1]) << 32)

    def with_padding(self, node_multiple: int = 8, brick_multiple: int = 8) -> "FlatTree":
        """Pad pools to multiples for stable jit shapes across small edits."""

        def pad(arr, n, fill):
            if arr.shape[0] % n == 0 and arr.shape[0] > 0:
                return arr
            target = max(n, ((arr.shape[0] + n - 1) // n) * n)
            out = np.full((target,) + arr.shape[1:], fill, dtype=arr.dtype)
            out[: arr.shape[0]] = arr
            return out

        return replace(
            self,
            node_meta=pad(self.node_meta, node_multiple, 0),
            node_children=pad(self.node_children, node_multiple, EMPTY_DESC),
            node_ocbits=pad(self.node_ocbits, node_multiple, 0),
            node_mips=pad(self.node_mips, node_multiple, EMPTY_DESC),
            bricks=pad(self.bricks, brick_multiple, -1),
            brick_ocbits=(
                pad(self.brick_ocbits, brick_multiple, 0)
                if self.brick_ocbits is not None
                else None
            ),
        )


def _voxelize_packed(tree: BoxTree, packed_arr: np.ndarray) -> np.ndarray:
    """Map packed palette values to flat voxel values (emptiness resolved)."""
    empty = tree._brick_empty_mask(packed_arr.astype(np.uint32))
    ci = (packed_arr & 0xFFFF).astype(np.int64)
    out = np.where(ci == EMPTY_U16, NO_COLOR_HIT, ci).astype(np.int32)
    out[empty] = EMPTY_DESC
    return out


def _solid_value(tree: BoxTree, packed: int) -> int:
    """Flat voxel value of a solid brick's packed voxel."""
    if tree.pix_points_to_empty(packed):
        return EMPTY_DESC
    ci = pix_color_index(packed)
    return NO_COLOR_HIT if ci == EMPTY_U16 else ci


def flatten(tree: BoxTree) -> FlatTree:
    """Snapshot a host boxtree into flat SoA arrays.

    Node keys are remapped to a dense range (the host pool may have holes
    from freed nodes); the root is always index 0.
    """
    # dense remap of live nodes, root first
    keymap: dict[int, int] = {}
    order: list[int] = []

    def discover(key):
        if key in keymap:
            return
        keymap[key] = len(order)
        order.append(key)
        node = tree.node(key)
        if node.ntype == INTERNAL and node.children is not None:
            for child in node.children:
                if tree.key_is_valid(child):
                    discover(child)

    discover(tree.ROOT)

    n = len(order)
    d = tree.brick_dim
    node_meta = np.zeros(n, dtype=np.uint32)
    node_children = np.full((n, BOX_NODE_CHILDREN_COUNT), EMPTY_DESC, dtype=np.int32)
    node_ocbits = np.zeros((n, 2), dtype=np.uint32)
    node_mips = np.full(n, EMPTY_DESC, dtype=np.int32)
    brick_list: list[np.ndarray] = []

    def brick_descriptor(brick) -> int:
        if brick is None:
            return EMPTY_DESC
        if isinstance(brick, (int, np.integer)):
            sv = _solid_value(tree, int(brick))
            if sv == EMPTY_DESC:
                return EMPTY_DESC
            return SOLID_FLAG | sv
        idx = len(brick_list)
        brick_list.append(_voxelize_packed(tree, brick))
        return idx

    for host_key in order:
        key = keymap[host_key]
        node = tree.node(host_key)
        node_ocbits[key, 0] = node.occupied & 0xFFFFFFFF
        node_ocbits[key, 1] = (node.occupied >> 32) & 0xFFFFFFFF
        if node.mip is not None:
            node_mips[key] = brick_descriptor(node.mip)
        if node.ntype == INTERNAL:
            if node.children is not None:
                for s, child in enumerate(node.children):
                    if tree.key_is_valid(child):
                        node_children[key, s] = keymap[child]
        elif node.ntype == LEAF:
            node_meta[key] = META_LEAF
            for s in range(BOX_NODE_CHILDREN_COUNT):
                node_children[key, s] = brick_descriptor(node.bricks[s])
        elif node.ntype == UNIFORM:
            node_meta[key] = META_LEAF | META_UNIFORM
            desc = brick_descriptor(node.bricks)
            node_children[key, :] = desc
        # NOTHING: all defaults

    if brick_list:
        bricks = np.stack(brick_list).astype(np.int32)
    else:
        bricks = np.zeros((0, d**3), dtype=np.int32)

    from voxelhex_tpu.spatial.math import brick_occupied_bits

    brick_ocbits = np.zeros((bricks.shape[0], 2), dtype=np.uint32)
    for i in range(bricks.shape[0]):
        bits = brick_occupied_bits(bricks[i] != EMPTY_DESC)
        brick_ocbits[i, 0] = bits & 0xFFFFFFFF
        brick_ocbits[i, 1] = (bits >> 32) & 0xFFFFFFFF

    n_colors = max(1, len(tree.color_palette))
    palette = np.zeros((n_colors, 4), dtype=np.float32)
    for i, c in enumerate(tree.color_palette):
        palette[i] = [c.r / 255.0, c.g / 255.0, c.b / 255.0, c.a / 255.0]

    return FlatTree(
        size=tree.size,
        brick_dim=d,
        node_meta=node_meta,
        node_children=node_children,
        node_ocbits=node_ocbits,
        node_mips=node_mips,
        bricks=bricks,
        palette=palette,
        brick_ocbits=brick_ocbits,
    )
