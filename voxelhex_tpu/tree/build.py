"""Vectorized bulk tree construction.

The reference imports scenes with per-voxel ``insert`` calls in a loop
(reference: src/convert/magicavoxel.rs:323-375).  Here the whole voxel cloud
is grouped into bricks and tree levels with NumPy array ops — constructing
millions of voxels in milliseconds and producing exactly the structures the
incremental path would: LEAF nodes of parted bricks with correct occupancy
bits, INTERNAL nodes above, then one recursive ``simplify`` pass (the
reference defers auto-simplify the same way).
"""

from __future__ import annotations

import numpy as np

from voxelhex_tpu.constants import BOX_NODE_CHILDREN_COUNT, EMPTY_U16, EMPTY_VOXEL
from voxelhex_tpu.spatial.math import flat_projection
from voxelhex_tpu.tree.boxtree import (
    INTERNAL,
    LEAF,
    U64_MAX,
    Albedo,
    BoxTree,
    _Node,
    pix_visual,
)


def intern_colors(tree: BoxTree, colors: np.ndarray) -> np.ndarray:
    """Dedup (N,4) uint8 RGBA rows into the tree palette; returns packed
    voxel values (N,) uint32."""
    colors = np.ascontiguousarray(np.asarray(colors, dtype=np.uint8).reshape(-1, 4))
    # dedup on a u32 view of the RGBA rows: scalar unique is ~10x faster
    # than row-wise (lexsort) unique at millions of voxels
    as_u32 = colors.view(np.uint32).ravel()
    uniq32, inverse = np.unique(as_u32, return_inverse=True)
    uniq = uniq32.view(np.uint8).reshape(-1, 4)
    idx_of_uniq = np.empty(len(uniq), dtype=np.int64)
    for i, row in enumerate(uniq):
        albedo = Albedo(int(row[0]), int(row[1]), int(row[2]), int(row[3]))
        if albedo.is_zero:
            idx_of_uniq[i] = -1
        else:
            idx_of_uniq[i] = tree._intern_color(albedo)
    packed = np.where(
        idx_of_uniq[inverse] >= 0,
        (idx_of_uniq[inverse] & 0xFFFF) | (EMPTY_U16 << 16),
        EMPTY_VOXEL,
    ).astype(np.uint32)
    return packed


def _brick_occupancy_bits(bricks: np.ndarray, empty_mask: np.ndarray) -> np.ndarray:
    """Vectorized per-brick 64-bit occupancy (4x4x4 downsample) for a
    [N, d^3] brick pool; returns (N,) object array of Python ints."""
    n, v = bricks.shape
    d = round(v ** (1 / 3))
    occ = ~empty_mask.reshape(n, d, d, d)  # [n, z, y, x]
    if d == 1:
        any_occ = occ.reshape(n)
        return np.where(any_occ, U64_MAX, 0).astype(object)
    if d >= 4:
        f = d // 4
        coarse = occ.reshape(n, 4, f, 4, f, 4, f).any(axis=(2, 4, 6))  # [n,z,y,x]
    else:  # d == 2
        r = 4 // d
        coarse = np.repeat(np.repeat(np.repeat(occ, r, 1), r, 2), r, 3)
    bit_index = (
        np.arange(4)[:, None, None] * 16  # z
        + np.arange(4)[None, :, None] * 4  # y
        + np.arange(4)[None, None, :]  # x
    ).reshape(64)
    weights = np.uint64(1) << bit_index.astype(np.uint64)
    flat = coarse.reshape(n, 64).astype(np.uint64)
    bits = (flat * weights[None, :]).sum(axis=1, dtype=np.uint64)
    return np.array([int(b) for b in bits], dtype=object)


def from_voxels(
    positions: np.ndarray,
    colors: np.ndarray,
    size: int,
    brick_dim: int = 32,
    simplify: bool = True,
    tree: BoxTree | None = None,
) -> BoxTree:
    """Build a BoxTree from point voxels.

    * ``positions`` — (N,3) integer voxel coordinates in [0, size)
    * ``colors`` — (N,4) uint8 RGBA (alpha 0 = empty, skipped)
    * duplicate positions: the last occurrence wins
    """
    if tree is None:
        tree = BoxTree(size, brick_dim, auto_simplify=simplify)
    d = tree.brick_dim
    size = tree.size

    positions = np.asarray(positions, dtype=np.int64).reshape(-1, 3)
    if len(positions) == 0:
        return tree
    if positions.min() < 0 or positions.max() >= size:
        raise ValueError("voxel positions out of tree bounds")

    packed = intern_colors(tree, colors)
    keep = packed != EMPTY_VOXEL
    positions, packed = positions[keep], packed[keep]
    if len(positions) == 0:
        return tree

    # deduplicate (last wins)
    lin = (positions[:, 0] + positions[:, 1] * size + positions[:, 2] * size * size)
    order = np.arange(len(lin))
    # np.unique keeps the first occurrence; reverse so the last wins
    _, first_idx = np.unique(lin[::-1], return_index=True)
    sel = len(lin) - 1 - first_idx
    positions, packed, lin = positions[sel], packed[sel], lin[sel]

    # group into bricks
    cells = positions // d
    within = positions % d
    flat_in_brick = within[:, 0] + within[:, 1] * d + within[:, 2] * d * d
    cpa = size // d  # cells per axis
    cell_id = cells[:, 0] + cells[:, 1] * cpa + cells[:, 2] * cpa * cpa
    uniq_cells, inverse = np.unique(cell_id, return_inverse=True)
    bricks = np.full((len(uniq_cells), d**3), EMPTY_VOXEL, dtype=np.uint32)
    bricks[inverse, flat_in_brick] = packed

    empty_mask = tree._brick_empty_mask(bricks.reshape(-1)).reshape(bricks.shape)
    occ_bits = _brick_occupancy_bits(bricks, empty_mask)

    # brick cell coordinates
    bx = uniq_cells % cpa
    by = (uniq_cells // cpa) % cpa
    bz = uniq_cells // (cpa * cpa)

    # leaf-level nodes cover 4 bricks per axis
    leaf_grid = np.stack([bx // 4, by // 4, bz // 4], axis=1)
    sectants = (bx % 4) + (by % 4) * 4 + (bz % 4) * 16

    # vectorized solid-brick collapse (same result as brick_simplify on
    # every brick: all-equal values -> Solid int / Empty)
    if simplify:
        eq = (bricks == bricks[:, :1]).all(axis=1)
        solid_empty = eq & empty_mask[:, 0]
        solid = eq & ~empty_mask[:, 0]
    else:
        solid = solid_empty = np.zeros(len(bricks), dtype=bool)

    lpa = max(cpa // 4, 1)  # leaf nodes per axis
    leaf_ids = leaf_grid[:, 0] + leaf_grid[:, 1] * lpa + leaf_grid[:, 2] * lpa * lpa
    uniq_leaves, leaf_inv = np.unique(leaf_ids, return_inverse=True)
    occ_nonzero = np.array([int(b) != 0 for b in occ_bits])
    sect_bits = np.where(
        occ_nonzero, np.uint64(1) << sectants.astype(np.uint64), np.uint64(0)
    )
    leaf_occ = np.zeros(len(uniq_leaves), dtype=np.uint64)
    np.bitwise_or.at(leaf_occ, leaf_inv, sect_bits)

    leaf_nodes: dict[tuple, int] = {}
    node_objs = []
    for j, lid in enumerate(uniq_leaves):
        node = _Node()
        node.ntype = LEAF
        node.bricks = [None] * BOX_NODE_CHILDREN_COUNT
        node.occupied = int(leaf_occ[j])
        key = tree._push_node(node)
        lg = (int(lid % lpa), int((lid // lpa) % lpa), int(lid // (lpa * lpa)))
        leaf_nodes[lg] = key
        node_objs.append(node)
    for i in range(len(uniq_cells)):
        if solid_empty[i]:
            continue
        node_objs[leaf_inv[i]].bricks[int(sectants[i])] = (
            int(bricks[i, 0]) if solid[i] else bricks[i]
        )

    # build internal levels bottom-up; level L has extent 4d per node
    levels = 0
    extent = 4 * d
    while extent < size:
        extent *= 4
        levels += 1
    # levels = number of internal levels above the leaf level

    current = leaf_nodes  # grid coords -> key at the current level
    for _ in range(levels):
        parents: dict[tuple, int] = {}
        for (gx, gy, gz), child_key in current.items():
            pg = (gx // 4, gy // 4, gz // 4)
            pkey = parents.get(pg)
            if pkey is None:
                node = _Node()
                node.ntype = INTERNAL
                pkey = tree._push_node(node)
                parents[pg] = pkey
            pnode = tree.node(pkey)
            sectant = (gx % 4) + (gy % 4) * 4 + (gz % 4) * 16
            pnode.set_child(sectant, child_key)
            if tree.node(child_key).occupied != 0:
                pnode.occupied |= 1 << sectant
        current = parents

    assert len(current) <= 1
    if current:
        top_key = next(iter(current.values()))
        top = tree.node(top_key)
        root = tree.node(tree.ROOT)
        root.ntype = top.ntype
        root.children = top.children
        root.bricks = top.bricks
        root.occupied = top.occupied
        tree._free_node(top_key)

    if simplify:
        tree.simplify(tree.ROOT, recursive=True)
    if tree.mip_strategy is not None:
        from voxelhex_tpu.tree import mipmap

        mipmap.recalculate_mips(tree)
    return tree
