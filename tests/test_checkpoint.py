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
