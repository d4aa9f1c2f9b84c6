"""MIP-map subsystem tests (small dims; semantics from reference
src/boxtree/tests.rs:801-1352 'mixed mip' suites)."""

import numpy as np
import pytest

from voxelhex_tpu.constants import EMPTY_U16
from voxelhex_tpu.spatial.math import flat_projection
from voxelhex_tpu.tree import mipmap
from voxelhex_tpu.tree.boxtree import Albedo, BoxTree
from voxelhex_tpu.tree.mipmap import (
    BOX_FILTER,
    POINT_FILTER,
    POSTERIZE,
    MIPStrategy,
    enable_mips,
)

RED = Albedo.from_u32(0xFF0000FF)
GREEN = Albedo.from_u32(0x00FF00FF)


def mip_texel(tree, key, x, y, z):
    node = tree.node(key)
    d = tree.brick_dim
    if node.mip is None:
        return None
    if isinstance(node.mip, (int, np.integer)):
        packed = int(node.mip)
    else:
        packed = int(node.mip[flat_projection(x, y, z, d)])
    ci = packed & 0xFFFF
    return None if ci == EMPTY_U16 else tree.color_palette[ci]


def test_leaf_mip_single_voxel():
    # size 8, dim 2: root is the leaf-level node; each MIP texel covers 4^3
    tree = BoxTree(8, 2, auto_simplify=False)
    enable_mips(tree)
    tree.insert((0, 0, 0), RED)
    # texel (0,0,0) covers voxels [0,4)^3 -> BoxFilter of a single red voxel
    c = mip_texel(tree, tree.ROOT, 0, 0, 0)
    assert c is not None
    assert c.r == 255 and c.g == 0 and c.b == 0
    # other texels stay empty
    assert mip_texel(tree, tree.ROOT, 1, 1, 1) is None


def test_leaf_mip_box_filter_averages():
    tree = BoxTree(8, 2, auto_simplify=False)
    enable_mips(tree)
    tree.insert((0, 0, 0), RED)
    tree.insert((1, 0, 0), GREEN)
    c = mip_texel(tree, tree.ROOT, 0, 0, 0)
    # gamma-2 average of pure red and pure green
    expect = int(np.sqrt((255.0**2 + 0.0) / 2))
    assert abs(c.r - expect) <= 1
    assert abs(c.g - expect) <= 1
    assert c.b == 0


def test_uniform_leaf_has_no_mip():
    tree = BoxTree(16, 4, auto_simplify=False)
    enable_mips(tree)
    tree.insert_at_lod((0, 0, 0), 4, RED)
    child = tree.node(tree.ROOT).child(0)
    assert tree.node(child).mip is None


def test_internal_mip_from_children():
    # size 32, dim 2: root internal; children at size 8 are leaf-level
    tree = BoxTree(32, 2, auto_simplify=False)
    enable_mips(tree)
    tree.insert((0, 0, 0), RED)
    # root MIP texel (0,0,0) resamples child MIPs covering [0,16)^3
    c = mip_texel(tree, tree.ROOT, 0, 0, 0)
    assert c is not None and c.r == 255


def test_point_filter_picks_most_frequent():
    strat = MIPStrategy(enabled=True)
    strat.set_method(2, POINT_FILTER)
    tree = BoxTree(8, 2, auto_simplify=False)
    tree.mip_strategy = strat
    tree.insert((0, 0, 0), RED)
    tree.insert((1, 0, 0), GREEN)
    tree.insert((0, 1, 0), GREEN)
    c = mip_texel(tree, tree.ROOT, 0, 0, 0)
    assert c == GREEN


def test_posterize_clusters_similar_colors():
    strat = MIPStrategy(enabled=True)
    strat.set_method(2, POSTERIZE, 0.1)
    tree = BoxTree(8, 2, auto_simplify=False)
    tree.mip_strategy = strat
    a = Albedo(250, 0, 0, 255)
    b = Albedo(245, 0, 0, 255)  # within 0.1*255 of a
    g = GREEN
    tree.insert((0, 0, 0), a)
    tree.insert((1, 0, 0), b)
    tree.insert((0, 1, 0), g)
    c = mip_texel(tree, tree.ROOT, 0, 0, 0)
    # red cluster has 2 members -> averaged red wins
    assert c.r > 200 and c.g < 50


def test_color_similarity_threshold_reuses_palette():
    tree = BoxTree(8, 2, auto_simplify=False)
    strat = MIPStrategy(enabled=True)
    strat.set_similarity(2, 0.2)
    tree.mip_strategy = strat
    tree.insert((0, 0, 0), RED)
    tree.insert((1, 0, 0), Albedo(250, 0, 0, 255))
    n_colors = len(tree.color_palette)
    # the averaged MIP color is within 0.2*255 of red -> no new palette color
    assert n_colors == 2


def test_mip_updates_on_clear():
    tree = BoxTree(8, 2, auto_simplify=False)
    enable_mips(tree)
    tree.insert((0, 0, 0), RED)
    assert mip_texel(tree, tree.ROOT, 0, 0, 0) is not None
    tree.clear((0, 0, 0))
    assert mip_texel(tree, tree.ROOT, 0, 0, 0) is None or tree.node(
        tree.ROOT
    ).ntype == 0


def test_recalculate_matches_incremental():
    tree = BoxTree(32, 2, auto_simplify=False)
    enable_mips(tree)
    rng = np.random.default_rng(3)
    for _ in range(40):
        p = tuple(int(v) for v in rng.integers(0, 32, 3))
        tree.insert(p, RED if rng.random() < 0.5 else GREEN)
    # snapshot incremental mips
    incr = {}
    for key in range(len(tree._nodes)):
        if tree.key_is_valid(key):
            m = tree.node(key).mip
            incr[key] = None if m is None else np.array(m, copy=True)
    mipmap.recalculate_mips(tree)
    for key, before in incr.items():
        after = tree.node(key).mip
        if before is None:
            assert after is None or (after & 0xFFFF == EMPTY_U16).all()
        else:
            assert after is not None
            # same emptiness pattern; colors may differ slightly because the
            # full rebuild resamples in texel order
            np.testing.assert_array_equal(
                (before & 0xFFFF) == EMPTY_U16, (after & 0xFFFF) == EMPTY_U16
            )


def test_flatten_carries_mips():
    from voxelhex_tpu.tree.flat import EMPTY_DESC, flatten

    tree = BoxTree(8, 2, auto_simplify=False)
    enable_mips(tree)
    tree.insert((0, 0, 0), RED)
    flat = flatten(tree)
    assert flat.node_mips[0] != EMPTY_DESC


def test_sample_root_mip_hook():
    """The reference's MIP test hook (mipmap.rs:634): sample the root MIP
    (sectant >= 64) or a root child's MIP brick by in-brick position."""
    from voxelhex_tpu.tree.mipmap import MIPStrategy, enable_mips, sample_root_mip

    tree = BoxTree(16, 4, auto_simplify=False)
    tree.insert((0, 0, 0), RED)
    enable_mips(tree, MIPStrategy(enabled=True))

    # root MIP texel (0,0,0) summarizes the corner voxel
    e = sample_root_mip(tree, 64, (0, 0, 0))
    assert e.is_some and e.albedo is not None
    # empty texel elsewhere
    assert not sample_root_mip(tree, 64, (3, 3, 3)).is_some
    # invalid child sectant -> Empty
    assert not sample_root_mip(tree, 63, (0, 0, 0)).is_some
