"""Host boxtree builder tests.

Ports the semantics of the reference's update test matrix
(reference: src/boxtree/update/tests.rs) — insert/get/update/clear at brick
dims 1/2/4, LOD ops with unaligned position/size, simplification, uniform-leaf
separation — plus a global occupancy-bit invariant checker mirroring the
reference's debug_assert sweeps.
"""

import numpy as np
import pytest

from voxelhex_tpu.constants import BOX_NODE_CHILDREN_COUNT
from voxelhex_tpu.tree.boxtree import (
    INTERNAL,
    LEAF,
    NOTHING,
    U64_MAX,
    UNIFORM,
    Albedo,
    BoxTree,
    Entry,
)

RED = Albedo.from_u32(0xFF0000FF)
GREEN = Albedo.from_u32(0x00FF00FF)
BLUE = Albedo.from_u32(0x0000FFFF)


def check_occupancy_invariants(tree: BoxTree):
    """Every valid node's occupied bits must match per-sectant emptiness."""

    def visit(key):
        node = tree.node(key)
        if node.ntype in (INTERNAL, LEAF, UNIFORM, NOTHING):
            for s in range(BOX_NODE_CHILDREN_COUNT):
                empty = tree.node_empty_at(key, s)
                bit = (node.occupied >> s) & 1
                if empty:
                    assert bit == 0, f"node {key} sectant {s}: empty but bit set"
                else:
                    assert bit == 1, f"node {key} sectant {s}: occupied but bit clear"
        if node.ntype == INTERNAL and node.children is not None:
            for c in node.children:
                if tree.key_is_valid(c):
                    visit(c)

    visit(tree.ROOT)


@pytest.mark.parametrize("dim", [1, 2, 4])
def test_simple_insert_and_get(dim):
    tree = BoxTree(dim * 4, dim, auto_simplify=False)
    tree.insert((0, 0, 0), RED)
    tree.insert((1, 0, 0), GREEN)
    tree.insert((0, 1, 0), BLUE)
    assert tree.get((0, 0, 0)).albedo == RED
    assert tree.get((1, 0, 0)).albedo == GREEN
    assert tree.get((0, 1, 0)).albedo == BLUE
    assert tree.get((1, 1, 1)).is_none
    check_occupancy_invariants(tree)


def test_insert_empty_is_noop():
    tree = BoxTree(4, 1)
    tree.insert((0, 0, 0), Entry())
    assert tree.node(tree.ROOT).ntype == NOTHING
    assert tree.get((0, 0, 0)).is_none


def test_insert_out_of_bounds_raises():
    tree = BoxTree(4, 1)
    with pytest.raises(ValueError):
        tree.insert((4, 0, 0), RED)


def test_complex_insert_and_get():
    tree = BoxTree(8, 2, auto_simplify=False)
    tree.insert((0, 0, 0), Entry(albedo=RED, data=5))
    tree.insert((1, 1, 1), Entry(data=7))
    tree.insert((2, 2, 2), RED)
    e = tree.get((0, 0, 0))
    assert e.albedo == RED and e.data == 5
    e = tree.get((1, 1, 1))
    assert e.albedo is None and e.data == 7
    e = tree.get((2, 2, 2))
    assert e.albedo == RED and e.data is None
    check_occupancy_invariants(tree)


def test_update_color_keeps_data():
    tree = BoxTree(4, 1)
    tree.insert((0, 0, 0), Entry(albedo=RED, data=5))
    tree.update((0, 0, 0), Entry(albedo=GREEN))
    e = tree.get((0, 0, 0))
    assert e.albedo == GREEN and e.data == 5


def test_update_data_keeps_color():
    tree = BoxTree(4, 1)
    tree.insert((0, 0, 0), Entry(albedo=RED, data=5))
    tree.update((0, 0, 0), Entry(data=9))
    e = tree.get((0, 0, 0))
    assert e.albedo == RED and e.data == 9


def test_update_empty_is_noop():
    tree = BoxTree(4, 1)
    tree.insert((0, 0, 0), Entry(albedo=RED, data=5))
    tree.update((0, 0, 0), Entry())
    e = tree.get((0, 0, 0))
    assert e.albedo == RED and e.data == 5


@pytest.mark.parametrize("dim", [1, 2])
def test_insert_at_lod_aligned(dim):
    size = dim * 16
    tree = BoxTree(size, dim, auto_simplify=False)
    # fill one quarter-node-aligned region of extent 2*dim
    region = 2 * dim
    tree.insert_at_lod((0, 0, 0), region, RED)
    hits = 0
    for x in range(size):
        for y in range(size):
            for z in range(size):
                e = tree.get((x, y, z))
                if e.is_some:
                    assert e.albedo == RED
                    hits += 1
    assert hits == region**3
    check_occupancy_invariants(tree)


def test_insert_at_lod_with_unaligned_position_where_dim_is_4():
    tree = BoxTree(16, 4, auto_simplify=False)
    tree.insert_at_lod((1, 1, 1), 4, RED)
    hits = 0
    for x in range(4):
        for y in range(4):
            for z in range(4):
                e = tree.get((x, y, z))
                if e.is_some:
                    assert e.albedo == RED
                    hits += 1
    # the update clips to [1,4) inside the first brick: 3^3 voxels
    assert hits == 27
    check_occupancy_invariants(tree)


def test_insert_at_lod_with_unaligned_size_where_dim_is_1():
    tree = BoxTree(16, 1, auto_simplify=False)
    tree.insert_at_lod((2, 2, 2), 3, RED)
    hits = sum(
        tree.get((x, y, z)).is_some
        for x in range(8)
        for y in range(8)
        for z in range(8)
    )
    # clipped to the containing 4^3 node: [2,4) per axis
    assert hits == 8
    check_occupancy_invariants(tree)


def test_insert_at_lod_with_unaligned_size_and_position_where_dim_is_1():
    tree = BoxTree(16, 1, auto_simplify=False)
    tree.insert_at_lod((3, 3, 3), 3, RED)
    hits = sum(
        tree.get((x, y, z)).is_some
        for x in range(8)
        for y in range(8)
        for z in range(8)
    )
    assert hits == 1
    check_occupancy_invariants(tree)


def test_insert_at_lod_with_unaligned_size_where_dim_is_4():
    tree = BoxTree(16, 4, auto_simplify=False)
    tree.insert_at_lod((1, 1, 1), 3, RED)
    assert tree.get((1, 1, 1)).albedo == RED
    hits = sum(
        tree.get((x, y, z)).is_some
        for x in range(8)
        for y in range(8)
        for z in range(8)
    )
    assert hits == 27
    check_occupancy_invariants(tree)


def test_insert_at_lod_with_simplify():
    tree = BoxTree(16, 1)
    tree.insert_at_lod((4, 0, 0), 2, RED)
    for x, y, z in [(4, 0, 0), (4, 0, 1), (4, 1, 0), (4, 1, 1),
                    (5, 0, 0), (5, 0, 1), (5, 1, 0), (5, 1, 1)]:
        assert tree.get((x, y, z)).albedo == RED
    tree.insert_at_lod((0, 0, 0), 4, GREEN)
    hits = 0
    for x in range(4):
        for y in range(4):
            for z in range(4):
                e = tree.get((x, y, z))
                if e.is_some:
                    assert e.albedo == GREEN
                    hits += 1
    for x in range(4, 6):
        for y in range(2):
            for z in range(2):
                e = tree.get((x, y, z))
                if e.is_some:
                    assert e.albedo == RED
                    hits += 1
    assert hits == 64 + 8
    check_occupancy_invariants(tree)


def test_whole_node_overwrite_makes_uniform_solid():
    tree = BoxTree(16, 4, auto_simplify=False)
    tree.insert_at_lod((0, 0, 0), 4, RED)
    # the child covering [0,4)^3 should be a solid uniform node
    root = tree.node(tree.ROOT)
    assert root.ntype == INTERNAL
    child = root.child(0)
    assert tree.key_is_valid(child)
    cn = tree.node(child)
    assert cn.ntype == UNIFORM and isinstance(cn.bricks, (int, np.integer))
    assert cn.occupied == U64_MAX
    for p in [(0, 0, 0), (3, 3, 3), (1, 2, 3)]:
        assert tree.get(p).albedo == RED
    check_occupancy_invariants(tree)


@pytest.mark.parametrize("dim", [1, 2])
def test_simple_clear(dim):
    tree = BoxTree(dim * 4, dim, auto_simplify=False)
    tree.insert((0, 0, 0), RED)
    tree.insert((0, 1, 0), GREEN)
    tree.clear((0, 0, 0))
    assert tree.get((0, 0, 0)).is_none
    assert tree.get((0, 1, 0)).albedo == GREEN
    check_occupancy_invariants(tree)


def test_clear_to_nothing():
    tree = BoxTree(4, 1)
    tree.insert((1, 1, 1), RED)
    tree.clear((1, 1, 1))
    assert tree.get((1, 1, 1)).is_none
    assert tree.node(tree.ROOT).ntype == NOTHING
    assert tree.node(tree.ROOT).occupied == 0


def test_double_clear():
    tree = BoxTree(8, 2, auto_simplify=False)
    tree.insert((0, 0, 0), RED)
    tree.insert((0, 1, 0), GREEN)
    tree.clear((0, 0, 0))
    tree.clear((0, 0, 0))
    assert tree.get((0, 0, 0)).is_none
    assert tree.get((0, 1, 0)).albedo == GREEN
    check_occupancy_invariants(tree)


@pytest.mark.parametrize("dim", [1, 4])
def test_clear_at_lod(dim):
    size = dim * 16
    tree = BoxTree(size, dim, auto_simplify=False)
    region = 4 * dim
    tree.insert_at_lod((0, 0, 0), region, RED)
    tree.clear_at_lod((0, 0, 0), region // 2)
    hits = 0
    for x in range(region):
        for y in range(region):
            for z in range(region):
                if tree.get((x, y, z)).is_some:
                    hits += 1
    assert hits == region**3 - (region // 2) ** 3
    check_occupancy_invariants(tree)


def test_clear_whole_nodes_where_dim_is_4():
    tree = BoxTree(16, 4, auto_simplify=False)
    tree.insert_at_lod((0, 0, 0), 16, RED)
    tree.clear_at_lod((0, 0, 0), 4)
    hits = sum(
        tree.get((x, y, z)).is_some
        for x in range(16)
        for y in range(16)
        for z in range(16)
    )
    assert hits == 16**3 - 4**3
    check_occupancy_invariants(tree)


def test_overwrite_whole_nodes_where_dim_is_4():
    tree = BoxTree(16, 4, auto_simplify=False)
    tree.insert_at_lod((0, 0, 0), 16, RED)
    tree.insert_at_lod((0, 0, 0), 4, GREEN)
    for p, want in [((0, 0, 0), GREEN), ((3, 3, 3), GREEN), ((4, 4, 4), RED),
                    ((15, 15, 15), RED), ((4, 0, 0), RED)]:
        assert tree.get(p).albedo == want, p
    check_occupancy_invariants(tree)


@pytest.mark.parametrize("dim", [1, 4])
def test_uniform_solid_leaf_separated_by_clear(dim):
    size = dim * 4
    tree = BoxTree(size, dim, auto_simplify=False)
    tree.insert_at_lod((0, 0, 0), size, RED)
    tree.clear((0, 0, 0))
    assert tree.get((0, 0, 0)).is_none
    for p in [(1, 0, 0), (0, 1, 0), (size - 1, size - 1, size - 1)]:
        assert tree.get(p).albedo == RED
    check_occupancy_invariants(tree)


@pytest.mark.parametrize("dim", [1, 4])
def test_uniform_solid_leaf_separated_by_insert(dim):
    size = dim * 4
    tree = BoxTree(size, dim, auto_simplify=False)
    tree.insert_at_lod((0, 0, 0), size, RED)
    tree.insert((0, 0, 0), GREEN)
    assert tree.get((0, 0, 0)).albedo == GREEN
    for p in [(1, 0, 0), (0, 1, 0), (size - 1, size - 1, size - 1)]:
        assert tree.get(p).albedo == RED
    check_occupancy_invariants(tree)


def test_simplifyable_insert_collapses_to_uniform():
    size, dim = 4, 1
    tree = BoxTree(size, dim, auto_simplify=True)
    for x in range(size):
        for y in range(size):
            for z in range(size):
                tree.insert((x, y, z), RED)
    # fully red tree simplifies to a single uniform solid root
    tree.simplify(tree.ROOT, recursive=True)
    root = tree.node(tree.ROOT)
    assert root.ntype == UNIFORM
    assert isinstance(root.bricks, (int, np.integer))
    assert root.occupied == U64_MAX
    # a differing insert breaks it back apart, keeping integrity
    tree.insert((0, 0, 0), GREEN)
    assert tree.get((0, 0, 0)).albedo == GREEN
    for p in [(1, 1, 1), (3, 3, 3)]:
        assert tree.get(p).albedo == RED


def test_simplifyable_clear_breaks_uniformity():
    size, dim = 8, 2
    tree = BoxTree(size, dim, auto_simplify=True)
    tree.insert_at_lod((0, 0, 0), size, RED)
    tree.clear((0, 0, 0))
    assert tree.get((0, 0, 0)).is_none
    assert tree.get((1, 1, 1)).albedo == RED
    check_occupancy_invariants(tree)


def test_case_simplified_insert_separated_by_clear_where_dim_is_1():
    tree = BoxTree(4, 1)
    for x in range(2):
        for y in range(2):
            for z in range(2):
                tree.insert((x, y, z), RED)
    tree.clear((0, 0, 0))
    assert tree.get((0, 0, 0)).is_none
    for x in range(2):
        for y in range(2):
            for z in range(2):
                if (x, y, z) != (0, 0, 0):
                    assert tree.get((x, y, z)).albedo == RED
    check_occupancy_invariants(tree)


def test_ocbits_resolution_small_clear_in_large_node():
    """Clearing one voxel of a full 4-dim brick only clears the matching
    occupancy bit (reference: update/tests.rs:1094)."""
    tree = BoxTree(16, 4, auto_simplify=False)
    tree.insert_at_lod((0, 0, 0), 4, RED)
    tree.clear((0, 0, 0))
    child = tree.node(tree.ROOT).child(0)
    node = tree.node(child)
    assert node.occupied == U64_MAX & ~1
    check_occupancy_invariants(tree)


def test_ocbits_resolution_small_insert_in_large_node():
    tree = BoxTree(16, 4, auto_simplify=False)
    tree.insert((0, 0, 0), RED)
    child = tree.node(tree.ROOT).child(0)
    node = tree.node(child)
    assert node.occupied == 1
    assert tree.node(tree.ROOT).occupied == 1
    check_occupancy_invariants(tree)


def test_occlusion_bits():
    """A fully occupied node sets occlusion on its six same-level siblings
    (reference scenario: update/tests.rs:1772-1840)."""
    tree = BoxTree(16, 1)
    tree.insert((5, 5, 5), RED)
    center, _, csize = tree.get_node_at((5, 5, 5))
    assert csize == 4.0
    assert tree.node(center).occlusion == 0

    for pos in [(4, 0, 4), (4, 8, 4), (0, 4, 4), (8, 4, 4), (4, 4, 0), (4, 4, 8)]:
        tree.insert_at_lod(pos, 4, RED)
    assert tree.node(center).occlusion == 0x3F

    tree.clear_at_lod((4, 4, 8), 4)
    assert tree.node(center).occlusion == 0x3D


def test_palette_dedup():
    tree = BoxTree(4, 1, auto_simplify=False)
    for i in range(8):
        tree.insert((i % 4, i // 4, 0), RED)
    assert len(tree.color_palette) == 1
    tree.insert((0, 2, 0), GREEN)
    assert len(tree.color_palette) == 2


def test_node_count_shrinks_after_clear():
    tree = BoxTree(16, 4, auto_simplify=False)
    tree.insert_at_lod((0, 0, 0), 16, RED)
    n_full = tree.node_count
    tree.clear_at_lod((0, 0, 0), 16)
    assert tree.node_count <= n_full
    assert tree.node(tree.ROOT).ntype == NOTHING


def test_clear_at_lod_with_unaligned_position_where_dim_is_1():
    """Reference: update/tests.rs:1419 — clearing a 2-cube at (1,1,1) erases
    exactly the 8 voxels of cells [1,3)^3."""
    albedo = Albedo.from_u32(0xFFAAEEFF)
    tree = BoxTree(16, 1)
    tree.insert_at_lod((0, 0, 0), 4, albedo)
    tree.clear_at_lod((1, 1, 1), 2)
    for p in [(1, 1, 1), (1, 1, 2), (1, 2, 1), (1, 2, 2),
              (2, 1, 1), (2, 1, 2), (2, 2, 1), (2, 2, 2)]:
        assert tree.get(p).is_none, p
    for p in [(0, 0, 2), (0, 2, 0), (0, 2, 2), (2, 0, 0), (2, 0, 2),
              (2, 2, 0), (2, 2, 3)]:
        assert tree.get(p).is_some, p
    hits = sum(
        tree.get((x, y, z)).is_some
        for x in range(4) for y in range(4) for z in range(4)
    )
    assert hits == 64 - 8
    check_occupancy_invariants(tree)


def test_clear_at_lod_with_unaligned_position_where_dim_is_4():
    """Reference: update/tests.rs:1474 — accepts either 27 or 64 voxels
    cleared depending on how the uniform region was stored."""
    albedo = Albedo.from_u32(0xFFAAEEFF)
    tree = BoxTree(16, 4)
    tree.insert_at_lod((0, 0, 0), 8, albedo)
    hits = sum(
        tree.get((x, y, z)).is_some
        for x in range(8) for y in range(8) for z in range(8)
    )
    assert hits == 512
    tree.clear_at_lod((1, 1, 1), 4)
    hits = sum(
        tree.get((x, y, z)).is_some
        for x in range(8) for y in range(8) for z in range(8)
    )
    assert hits in (512 - 27, 512 - 64), hits
    check_occupancy_invariants(tree)


def test_clear_at_lod_with_unaligned_size_where_dim_is_1():
    """Reference: update/tests.rs:1528 — clear size 3 erases a 3^3 corner."""
    albedo = Albedo.from_u32(0xFFAAEEFF)
    tree = BoxTree(16, 1)
    tree.insert_at_lod((0, 0, 0), 4, albedo)
    tree.clear_at_lod((0, 0, 0), 3)
    hits = sum(
        tree.get((x, y, z)).is_some
        for x in range(4) for y in range(4) for z in range(4)
    )
    assert hits == 64 - 27
    check_occupancy_invariants(tree)


def test_clear_at_lod_with_unaligned_size_where_dim_is_4():
    albedo = Albedo.from_u32(0xFFAAEEFF)
    tree = BoxTree(16, 4)
    tree.insert_at_lod((0, 0, 0), 4, albedo)
    tree.clear_at_lod((0, 0, 0), 3)
    hits = sum(
        tree.get((x, y, z)).is_some
        for x in range(8) for y in range(8) for z in range(8)
    )
    assert hits == 64 - 27
    check_occupancy_invariants(tree)


def test_uniform_parted_brick_leaf_separated_by_clear_where_dim_is_4():
    """Reference: update/tests.rs:567 — a uniform node holding a PARTED brick
    (from simplification) splits correctly when partially cleared."""
    tree = BoxTree(16, 4)
    # build a non-solid but repeating 16^3 pattern so simplification can
    # produce a uniform parted representation
    for x in range(16):
        for y in range(16):
            for z in range(16):
                if (x // 4 + y // 4 + z // 4) % 2 == 0:
                    tree.insert((x, y, z), RED)
    tree.simplify(tree.ROOT, recursive=True)
    tree.clear((0, 0, 0))
    assert tree.get((0, 0, 0)).is_none
    # the rest of the pattern survives
    for p in [(1, 0, 0), (0, 1, 0), (8, 8, 8), (3, 3, 3)]:
        expect = ((p[0] // 4 + p[1] // 4 + p[2] // 4) % 2 == 0)
        assert tree.get(p).is_some == expect, p
    check_occupancy_invariants(tree)


# ---------------------------------------------------------------------------
# iterate helpers: access_stack / node_at
# (reference: src/boxtree/iterate.rs:125-169, :293-343)
# ---------------------------------------------------------------------------


def test_access_stack_descends_to_leaf():
    tree = BoxTree(64, 4, auto_simplify=False)
    tree.insert((1, 2, 3), Albedo.from_u32(0xFF0000FF))
    stack = tree.access_stack((1, 2, 3))
    # 64-tree with brick 4: root(64) -> node(16) -> leaf level(4-brick)
    assert stack[0][0] == tree.ROOT
    assert stack[0][2] == 64.0
    sizes = [s for _, _, s in stack]
    assert sizes == sorted(sizes, reverse=True)
    assert len(stack) >= 2
    # every entry's bounds must contain the position
    for _, bmin, bsize in stack:
        assert (bmin <= [1, 2, 3]).all() and ([1, 2, 3] < bmin + bsize).all()


def test_access_stack_outside_and_unallocated():
    tree = BoxTree(64, 4, auto_simplify=False)
    tree.insert((1, 1, 1), Albedo.from_u32(0xFF0000FF))
    assert tree.access_stack((70, 0, 0)) == []
    # inside the tree but in an untouched region: path stops at the root
    stack = tree.access_stack((60, 60, 60))
    assert [k for k, _, _ in stack] == [tree.ROOT]


def test_node_at_matches_stack_and_siblings():
    tree = BoxTree(64, 4, auto_simplify=False)
    tree.insert((0, 0, 0), Albedo.from_u32(0xFF0000FF))
    tree.insert((63, 63, 63), Albedo.from_u32(0x00FF00FF))
    a = tree.node_at((0, 0, 0))
    b = tree.node_at((63, 63, 63))
    assert a is not None and b is not None and a != b
    assert tree.node_at((200, 0, 0)) is None
    assert tree.access_stack((0, 0, 0))[-1][0] == a


# ---------------------------------------------------------------------------
# sibling-jump scenarios (reference: src/boxtree/tests.rs:12-473,
# test_sibling_jump_*) expressed against the sibling_at API
# ---------------------------------------------------------------------------

RED = Albedo.from_u32(0x640000FF)


def test_sibling_jump_to_internal_sibling():
    """Both voxels land in the same leaf node: the jump stays inside it
    (reference: src/boxtree/tests.rs:12)."""
    tree = BoxTree(1024, 4, auto_simplify=True)
    start = (507, 331, 0)
    tree.insert(start, RED)
    tree.insert((511, 331, 0), RED)
    assert tree.node_at(start) == tree.node_at((511, 331, 0))
    sib = tree.sibling_at(start, (1, 0, 0))
    assert sib is not None
    key, bmin, bsize = sib
    assert key == tree.node_at(start)  # same node, next sectant


def test_sibling_jump_to_hit_in_parent():
    """Step crosses a leaf boundary: the sibling is found via the parent
    (reference: src/boxtree/tests.rs:103)."""
    tree = BoxTree(1024, 4, auto_simplify=True)
    start, other = (495, 331, 0), (496, 331, 0)
    tree.insert(start, RED)
    tree.insert(other, RED)
    assert tree.node_at(start) != tree.node_at(other)
    sib = tree.sibling_at(start, (1, 0, 0))
    assert sib is not None and sib[0] == tree.node_at(other)


def test_sibling_jump_to_hit_in_root():
    """Step crosses a root-sectant boundary (reference:
    src/boxtree/tests.rs:194)."""
    tree = BoxTree(1024, 4, auto_simplify=True)
    start, other = (511, 331, 0), (512, 331, 0)
    tree.insert(start, RED)
    tree.insert(other, RED)
    assert tree.node_at(start) != tree.node_at(other)
    sib = tree.sibling_at(start, (1, 0, 0))
    assert sib is not None and sib[0] == tree.node_at(other)


def test_sibling_jump_to_higher_level_leaf():
    """The neighbor region is a bulk-filled higher-level leaf: the jump lands
    on that node (reference: src/boxtree/tests.rs:274)."""
    tree = BoxTree(1024, 4, auto_simplify=True)
    start, other = (511, 0, 0), (512, 0, 0)
    tree.insert(start, RED)
    tree.insert_at_lod(other, 256, RED)
    sib = tree.sibling_at(start, (1, 0, 0))
    assert sib is not None
    key, bmin, bsize = sib
    assert key == tree.node_at(other)
    assert bsize == 256.0  # a higher-level node than the 16-voxel start leaf


def test_sibling_jump_from_higher_level_leaf():
    """From a uniform leaf the step size is the whole node (reference:
    src/boxtree/tests.rs:360)."""
    tree = BoxTree(1024, 4, auto_simplify=True)
    start, other = (256, 256, 0), (512, 256, 0)
    tree.insert_at_lod(start, 256, RED)
    tree.insert(other, RED)
    assert tree.node_at(start) != tree.node_at(other)
    sib = tree.sibling_at(start, (1, 0, 0))
    assert sib is not None and sib[0] == tree.node_at(other)


def test_sibling_jump_out_of_bounds():
    """Stepping off the tree edge yields None (reference:
    src/boxtree/tests.rs:442)."""
    tree = BoxTree(1024, 4, auto_simplify=True)
    tree.insert((1023, 331, 0), RED)
    assert tree.sibling_at((1023, 331, 0), (1, 0, 0)) is None


# ---------------------------------------------------------------------------
# sectant-execution scenarios for the bulk-update cell visitor
# (reference: src/boxtree/tests.rs:475-880, test_sectant_execution_*)
# ---------------------------------------------------------------------------

from voxelhex_tpu.tree.boxtree import _visit_cells


def _cells(node_min, node_size, position, update_size):
    cells, _ = _visit_cells(np.asarray(node_min, np.float64), float(node_size),
                            position, update_size)
    return cells


def test_sectant_execution_aligned_single_within():
    # reference: tests.rs:475 — a 20-cube at the origin touches only sectant 0
    cells = _cells((0, 0, 0), 400.0, (0, 0, 0), 20)
    assert len(cells) == 1
    pos_in, size_in, sectant, cmin, csize = cells[0]
    assert sectant == 0
    np.testing.assert_array_equal(cmin, [0, 0, 0])
    np.testing.assert_array_equal(size_in, [20, 20, 20])
    assert csize == 100.0
    # at (100,0,0) the update sits exactly at sectant 1's min corner
    cells = _cells((0, 0, 0), 400.0, (100, 0, 0), 20)
    assert len(cells) == 1
    pos_in, size_in, sectant, cmin, csize = cells[0]
    assert sectant == 1
    np.testing.assert_array_equal(cmin, [100, 0, 0])
    np.testing.assert_array_equal(size_in, [20, 20, 20])


def test_sectant_execution_aligned_single_bounds_smaller_position():
    # reference: tests.rs:522 — node min (400,400,400) with an update box
    # entirely below the node.  Clamping the position trims the update size
    # negative, so no cell is visited (the reference's closure never runs
    # there either — its assertions are vacuous; iterate.rs:85-101 guards on
    # update_size_in_target > 0).
    assert _cells((400, 400, 400), 400.0, (0, 0, 0), 20) == []
    assert _cells((400, 400, 400), 400.0, (100, 500, 0), 20) == []


def test_sectant_execution_single_target_with_smaller_position_aligned():
    # reference: tests.rs:574 — update [0,450) clipped against node [400,800):
    # only the first cell is covered, with per-axis size 450-400=50
    cells = _cells((400, 400, 400), 400.0, (0, 0, 0), 450)
    assert len(cells) == 1
    pos_in, size_in, sectant, cmin, csize = cells[0]
    assert sectant == 0
    np.testing.assert_array_equal(cmin, [400, 400, 400])
    np.testing.assert_array_equal(size_in, [50, 50, 50])


def test_sectant_execution_single_target_with_smaller_position_unaligned():
    # reference: tests.rs:612 — y offset 100 splits the clipped window across
    # sectants 0 and 4 along y
    cells = _cells((400, 400, 400), 400.0, (0, 100, 0), 450)
    sectants = sorted(c[2] for c in cells)
    assert sectants == [0, 4]
    for pos_in, size_in, sectant, cmin, csize in cells:
        assert size_in[0] == 50 and size_in[2] == 50
        assert size_in[1] in (100, 50)  # full cell, then the 50 remainder


def test_sectant_execution_single_target_with_larger_position():
    # reference: tests.rs:653 — update entirely outside (above) the node:
    # no cell is visited
    assert _cells((400, 400, 400), 400.0, (0, 1000, 0), 100) == []


def test_sectant_execution_single_target_out_of_bounds():
    # reference: tests.rs:674 — 500-cube from (300,300,300) in a 400-node
    # covers only the last sectant, clipped to the cell size
    cells = _cells((0, 0, 0), 400.0, (300, 300, 300), 500)
    assert len(cells) == 1
    pos_in, size_in, sectant, cmin, csize = cells[0]
    assert sectant == 63
    np.testing.assert_array_equal(cmin, [300, 300, 300])
    np.testing.assert_array_equal(size_in, [100, 100, 100])


def test_sectant_execution_aligned_target_within():
    # reference: tests.rs:700 — 400-cube from (100,0,0): 3x4x4 cells, each
    # visited once and fully covered (clipped to the node)
    cells = _cells((0, 0, 0), 400.0, (100, 0, 0), 400)
    sectants = [c[2] for c in cells]
    assert len(sectants) == len(set(sectants)) == 3 * 4 * 4
    for pos_in, size_in, sectant, cmin, csize in cells:
        np.testing.assert_array_equal(size_in, [100, 100, 100])
        if sectant == 1:
            np.testing.assert_array_equal(cmin, [100, 0, 0])


def test_sectant_execution_aligned_target_out_of_bounds_smaller_position_larger_size():
    # reference: tests.rs:734 — node [400,800), update [500,1500): 3x4x4 full
    # cells
    cells = _cells((400, 400, 400), 400.0, (500, 0, 0), 1000)
    assert len(cells) == 3 * 4 * 4
    for pos_in, size_in, sectant, cmin, csize in cells:
        np.testing.assert_array_equal(size_in, [100, 100, 100])


def test_sectant_execution_aligned_target_out_of_bounds():
    # reference: tests.rs:769 — update larger than the node, aligned start:
    # 3x4x4 full cells
    cells = _cells((0, 0, 0), 400.0, (100, 0, 0), 500)
    sectants = [c[2] for c in cells]
    assert len(sectants) == len(set(sectants)) == 3 * 4 * 4
    for pos_in, size_in, sectant, cmin, csize in cells:
        np.testing.assert_array_equal(size_in, [100, 100, 100])


def test_sectant_execution_unaligned_target_within():
    # reference: tests.rs:802 — 210-cube from (100,0,0): 3x3x3 cells, edge
    # cells carry the 10-voxel remainder
    cells = _cells((0, 0, 0), 400.0, (100, 0, 0), 210)
    assert len(cells) == 3 ** 3
    for pos_in, size_in, sectant, cmin, csize in cells:
        for axis in range(3):
            assert size_in[axis] in (100, 10)
        if sectant == 1:
            np.testing.assert_array_equal(cmin, [100, 0, 0])


def test_sectant_execution_unaligned_target_out_of_bounds():
    # reference: tests.rs:844 — 510-cube from (100,0,0) overflows the node:
    # the in-node portion is 3x4x4 full cells
    cells = _cells((0, 0, 0), 400.0, (100, 0, 0), 510)
    sectants = [c[2] for c in cells]
    assert len(sectants) == len(set(sectants)) == 3 * 4 * 4
    for pos_in, size_in, sectant, cmin, csize in cells:
        np.testing.assert_array_equal(size_in, [100, 100, 100])


def test_clear_depleted_node_reports_parent_frame_sectant():
    """Clearing the last voxel of one subtree must not touch siblings: the
    depleted node is reported to its parent at the node's sectant within the
    PARENT (a child-frame sectant could name an unrelated occupied sibling)."""
    red = Albedo(255, 0, 0, 255)
    green = Albedo(0, 255, 0, 255)
    for simp in (False, True):
        t = BoxTree(64, 4, auto_simplify=simp)
        # (4,0,0): root sectant 0, sectant 1 inside its 16-node
        # (17,1,1): lives under ROOT sectant 1 — the collision target
        t.insert((4, 0, 0), red)
        t.insert((17, 1, 1), green)
        t.clear((4, 0, 0))
        assert t.get((4, 0, 0)).albedo is None
        assert t.get((17, 1, 1)).albedo == green, simp
