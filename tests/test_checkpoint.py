"""Checkpoint round-trip tests (the reference's convert/tests.rs analog)."""

import numpy as np
import pytest

from voxelhex_tpu.io.checkpoint import (
    FORMAT_VERSION,
    load_flat,
    load_tree,
    peek_version,
    save_flat,
    save_tree,
)
from voxelhex_tpu.render.oracle import get_by_ray
from voxelhex_tpu.tree.boxtree import Albedo, BoxTree
from voxelhex_tpu.tree.flat import flatten

RED = Albedo.from_u32(0xFF0000FF)
GREEN = Albedo.from_u32(0x00FF00FF)


def make_scene():
    tree = BoxTree(16, 4, auto_simplify=False)
    rng = np.random.default_rng(17)
    for _ in range(120):
        p = tuple(int(v) for v in rng.integers(0, 16, 3))
        tree.insert(p, RED if rng.random() < 0.5 else GREEN)
    tree.insert_at_lod((8, 8, 8), 4, GREEN)
    return tree


def test_flat_roundtrip(tmp_path):
    tree = make_scene()
    flat = flatten(tree)
    path = tmp_path / "scene.vhx"
    save_flat(path, flat)
    loaded = load_flat(path)
    np.testing.assert_array_equal(flat.node_meta, loaded.node_meta)
    np.testing.assert_array_equal(flat.node_children, loaded.node_children)
    np.testing.assert_array_equal(flat.node_ocbits, loaded.node_ocbits)
    np.testing.assert_array_equal(flat.bricks, loaded.bricks)
    np.testing.assert_allclose(flat.palette, loaded.palette)
    assert loaded.size == flat.size and loaded.brick_dim == flat.brick_dim
    # traces identically
    h1 = get_by_ray(flat, [8, 8, -8], np.array([0, 0, 1.0], dtype=np.float32))
    h2 = get_by_ray(loaded, [8, 8, -8], np.array([0, 0, 1.0], dtype=np.float32))
    assert (h1 is None) == (h2 is None)
    if h1:
        assert h1.voxel == h2.voxel


def test_tree_roundtrip(tmp_path):
    tree = make_scene()
    path = tmp_path / "tree.vhx"
    save_tree(path, tree)
    assert peek_version(path) == FORMAT_VERSION
    loaded = load_tree(path)
    for x in range(16):
        for y in range(16):
            for z in range(16):
                a, b = tree.get((x, y, z)), loaded.get((x, y, z))
                assert a.is_some == b.is_some, (x, y, z)
                if a.is_some:
                    assert a.albedo == b.albedo

    # loaded tree stays editable
    loaded.insert((0, 0, 0), RED)
    assert loaded.get((0, 0, 0)).albedo == RED
    loaded.clear((0, 0, 0))
    assert loaded.get((0, 0, 0)).is_none


def test_version_gate(tmp_path):
    tree = make_scene()
    path = tmp_path / "tree.vhx"
    save_tree(path, tree)
    # corrupt the version
    import json
    import zipfile

    with zipfile.ZipFile(path) as zf:
        names = {n: zf.read(n) for n in zf.namelist()}
    meta = json.loads(names["meta.json"])
    meta["version"] = [99, 0]
    names["meta.json"] = json.dumps(meta).encode()
    bad = tmp_path / "bad.vhx"
    with zipfile.ZipFile(bad, "w") as zf:
        for n, payload in names.items():
            zf.writestr(n, payload)
    assert peek_version(bad) == (99, 0)
    with pytest.raises(ValueError, match="incompatible"):
        load_tree(bad)


def test_tree_roundtrip_user_data_and_dims(tmp_path):
    """User-data entries and small brick dims survive save/load (reference:
    convert/tests.rs test_boxtree_serialize_where_dim_is_1/_2 with custom
    VoxelData)."""
    from voxelhex_tpu.tree.boxtree import Entry

    for dim, size in ((1, 16), (2, 8)):
        tree = BoxTree(size, dim, auto_simplify=False)
        tree.insert((0, 0, 0), Entry(albedo=RED, data=42))
        tree.insert((1, 2, 3), Entry(data="tag"))
        tree.insert((2, 2, 2), Entry(albedo=GREEN, data=(1, 2)))
        path = tmp_path / f"d{dim}.vhx"
        save_tree(path, tree)
        loaded = load_tree(path)
        for pos in ((0, 0, 0), (1, 2, 3), (2, 2, 2)):
            a, b = tree.get(pos), loaded.get(pos)
            assert a.albedo == b.albedo and a.data == b.data, (dim, pos)
        # palette dedup still works after restore: re-inserting the same data
        # must not grow the palette
        n = len(loaded.data_palette)
        loaded.insert((3, 3, 3), Entry(albedo=RED, data=42))
        assert len(loaded.data_palette) == n


def test_tree_roundtrip_mip_strategy(tmp_path):
    """The MIP-map strategy (enabled flag, per-level methods, similarity
    thresholds) persists (reference: bytecode.rs:518-648)."""
    from voxelhex_tpu.tree.mipmap import BOX_FILTER, POSTERIZE, MIPStrategy

    tree = make_scene()
    tree.mip_strategy = MIPStrategy(enabled=True)
    tree.mip_strategy.set_method(1, POSTERIZE, 0.2)
    tree.mip_strategy.set_similarity(2, 0.33)
    path = tmp_path / "mip.vhx"
    save_tree(path, tree)
    loaded = load_tree(path)
    assert loaded.mip_strategy is not None and loaded.mip_strategy.enabled
    assert loaded.mip_strategy.method_at(1) == (POSTERIZE, 0.2)
    assert loaded.mip_strategy.similarity_at(2) == 0.33
    assert loaded.mip_strategy.method_at(2)[0] == BOX_FILTER

    # absent strategy stays absent
    tree2 = make_scene()
    p2 = tmp_path / "nomip.vhx"
    save_tree(p2, tree2)
    assert load_tree(p2).mip_strategy is None
