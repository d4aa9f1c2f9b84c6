"""Bulk builder and .vox import tests."""

import numpy as np
import pytest

from voxelhex_tpu.io.vox import (
    load_vox_scene,
    load_vox_tree,
    parse_rotation_byte,
    parse_vox,
    tree_size_for,
)
from voxelhex_tpu.tree.boxtree import Albedo, BoxTree
from voxelhex_tpu.tree.build import from_voxels
from voxelhex_tpu.tree.flat import flatten

NAVIGATE = "/root/reference/assets/models/navigate.vox"


def test_bulk_builder_matches_incremental():
    rng = np.random.default_rng(21)
    size, dim = 16, 4
    n = 300
    positions = rng.integers(0, size, (n, 3))
    colors = np.zeros((n, 4), dtype=np.uint8)
    colors[:, 0] = rng.integers(1, 255, n)
    colors[:, 3] = 255

    bulk = from_voxels(positions, colors, size=size, brick_dim=dim, simplify=False)

    incr = BoxTree(size, dim, auto_simplify=False)
    seen = {}
    for p, c in zip(positions, colors):
        seen[tuple(int(v) for v in p)] = c
        incr.insert(tuple(int(v) for v in p), Albedo(*(int(x) for x in c)))

    for x in range(size):
        for y in range(size):
            for z in range(size):
                a = bulk.get((x, y, z))
                b = incr.get((x, y, z))
                assert a.is_some == b.is_some, (x, y, z)
                if a.is_some:
                    assert a.albedo == b.albedo, (x, y, z)

    # occupancy invariants hold on the bulk-built tree
    from tests.test_boxtree import check_occupancy_invariants

    check_occupancy_invariants(bulk)


def test_bulk_builder_last_wins():
    pos = np.array([[1, 1, 1], [1, 1, 1]])
    col = np.array([[255, 0, 0, 255], [0, 255, 0, 255]], dtype=np.uint8)
    tree = from_voxels(pos, col, size=16, brick_dim=4)
    assert tree.get((1, 1, 1)).albedo == Albedo(0, 255, 0, 255)


def test_bulk_builder_simplify_solid_block():
    # a full 16^3 fill simplifies into few nodes
    size = 16
    xs, ys, zs = np.meshgrid(np.arange(size), np.arange(size), np.arange(size))
    pos = np.stack([xs.ravel(), ys.ravel(), zs.ravel()], axis=1)
    col = np.tile(np.array([[10, 20, 30, 255]], dtype=np.uint8), (len(pos), 1))
    tree = from_voxels(pos, col, size=size, brick_dim=4, simplify=True)
    assert tree.get((7, 7, 7)).albedo == Albedo(10, 20, 30, 255)
    assert tree.node_count <= 6


def test_rotation_byte_identity():
    # 0b0000100 = rows select x,y -> third row z, all positive = identity
    m = parse_rotation_byte((0 << 0) | (1 << 2))
    np.testing.assert_array_equal(m, np.eye(3, dtype=np.int64))


def test_tree_size_for():
    assert tree_size_for(100, 32) == 128
    assert tree_size_for(129, 32) == 512
    assert tree_size_for(10, 2) == 32
    assert tree_size_for(2048, 32) == 2048


def test_parse_navigate_vox():
    vox = parse_vox(NAVIGATE)
    assert len(vox.models) >= 1
    assert vox.palette.shape == (256, 4)
    positions, colors = load_vox_scene(NAVIGATE)
    assert len(positions) > 100
    assert positions.min() >= 0
    assert colors.shape[1] == 4


def test_load_vox_with_mip_strategy():
    # strategy-configured load (reference: MIPMapStrategy::load_vox_file,
    # src/convert/magicavoxel.rs:206-231): the strategy lands on the tree
    # and, when enabled, MIP bricks exist after load
    from voxelhex_tpu.tree.mipmap import BOX_FILTER, MIPStrategy

    strat = MIPStrategy(enabled=True).set_method(1, BOX_FILTER).set_similarity(2, 0.2)
    tree = load_vox_tree(NAVIGATE, brick_dim=8, mip_strategy=strat)
    assert tree.mip_strategy is strat
    assert tree.mip_strategy.method_at(1) == (BOX_FILTER, None)
    root = tree.node(tree.ROOT)
    assert root.mip is not None  # MIPs built during load

    # disabled strategy: installed but no MIP build
    off = MIPStrategy(enabled=False)
    tree2 = load_vox_tree(NAVIGATE, brick_dim=8, mip_strategy=off)
    assert tree2.mip_strategy is off
    assert tree2.node(tree2.ROOT).mip is None


def test_load_navigate_tree_and_trace():
    tree = load_vox_tree(NAVIGATE, brick_dim=8)
    flat = flatten(tree)
    assert flat.n_nodes >= 1
    # every 20th source voxel must be present with its color
    positions, colors = load_vox_scene(NAVIGATE)
    for i in range(0, len(positions), max(1, len(positions) // 25)):
        e = tree.get(positions[i])
        assert e.is_some
        assert e.albedo.r == colors[i][0]
        assert e.albedo.g == colors[i][1]
        assert e.albedo.b == colors[i][2]


def test_corrupt_vox_raises_clean_error(tmp_path):
    """Every corrupt-file shape surfaces the clean 'truncated or corrupt'
    ValueError (ADVICE r3: a short XYZI body used to leak a raw numpy
    ValueError, and XYZI-without-SIZE an AssertionError stripped under -O)."""
    import struct

    def vox_bytes(chunks):
        body = b""
        for cid, payload in chunks:
            body += struct.pack("<4sii", cid, len(payload), 0) + payload
        return (b"VOX " + struct.pack("<i", 150)
                + struct.pack("<4sii", b"MAIN", 0, len(body)) + body)

    # XYZI claiming more voxels than the body holds (short read)
    short = vox_bytes([
        (b"SIZE", struct.pack("<3i", 4, 4, 4)),
        (b"XYZI", struct.pack("<i", 100) + b"\x01\x01\x01\x01" * 2),
    ])
    # XYZI with no preceding SIZE
    nosize = vox_bytes([(b"XYZI", struct.pack("<i", 1) + b"\x01\x01\x01\x01")])
    # stream cut mid-chunk-header
    trunc = vox_bytes([(b"SIZE", struct.pack("<3i", 4, 4, 4))])[:-5]

    for name, data in (("short", short), ("nosize", nosize), ("trunc", trunc)):
        p = tmp_path / f"{name}.vox"
        p.write_bytes(data)
        with pytest.raises(ValueError, match="truncated or corrupt"):
            parse_vox(str(p))
