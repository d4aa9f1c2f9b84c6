"""Differential tests: the native (C++) edit engine vs the Python BoxTree.

The Python tree defines the semantics (itself built to reference parity);
the native engine must match it voxel-for-voxel AND structurally (node
types, occupancy, occlusion, brick contents) over randomized op sequences.
"""

import numpy as np
import pytest

from voxelhex_tpu.tree.boxtree import (
    INTERNAL,
    LEAF,
    UNIFORM,
    Albedo,
    BoxTree,
)
from voxelhex_tpu.tree import native_edit

pytestmark = pytest.mark.skipif(
    not native_edit.available(), reason="native edit library unavailable"
)


def _random_entry(rng):
    c = rng.integers(0, 256, 4)
    if rng.random() < 0.15:
        c[3] = 0  # transparent color exercises emptiness semantics
    return Albedo(*(int(v) for v in c))


def _apply_random_ops(rng, a, b, n_ops, size, with_lod=True):
    for _ in range(n_ops):
        p = tuple(int(v) for v in rng.integers(0, size, 3))
        r = rng.random()
        if r < 0.45:
            e = _random_entry(rng)
            a.insert(p, e)
            b.insert(p, e)
        elif r < 0.6:
            e = _random_entry(rng)
            a.update(p, e)
            b.update(p, e)
        elif r < 0.8 or not with_lod:
            a.clear(p)
            b.clear(p)
        elif r < 0.9:
            s = int(rng.choice([2, 4, 8]))
            e = _random_entry(rng)
            a.insert_at_lod(p, s, e)
            b.insert_at_lod(p, s, e)
        else:
            s = int(rng.choice([2, 4, 8]))
            a.clear_at_lod(p, s)
            b.clear_at_lod(p, s)


def _dense(tree, size):
    out = np.empty((size, size, size), dtype=np.uint32)
    for z in range(size):
        for y in range(size):
            for x in range(size):
                out[z, y, x] = tree.get_packed((x, y, z))
    return out


def _walk_compare(py, nat, py_key=0, nat_key=0, path=""):
    """Structurally compare the two trees from the root down."""
    pn = py.node(py_key)
    info = nat.node_info(nat_key)
    assert info is not None, f"native node missing at {path}"
    ntype, occupied, occlusion, children = info
    assert pn.ntype == ntype, (path, pn.ntype, ntype)
    assert pn.occupied == occupied, (path, hex(pn.occupied), hex(occupied))
    assert pn.occlusion == occlusion, (path, pn.occlusion, occlusion)
    if pn.ntype == INTERNAL:
        for s in range(64):
            pc = pn.child(s)
            nc = int(children[s])
            pv = py.key_is_valid(pc)
            nv = nc >= 0 and nat.node_info(nc) is not None
            assert pv == nv, (path, s, pc, nc)
            if pv:
                _walk_compare(py, nat, pc, nc, f"{path}/{s}")
    elif pn.ntype == LEAF:
        for s in range(64):
            pb = pn.bricks[s]
            nb = nat.node_brick(nat_key, s)
            _compare_brick(pb, nb, f"{path}[{s}]")
    elif pn.ntype == UNIFORM:
        _compare_brick(pn.bricks, nat.node_brick(nat_key, -1), f"{path}[U]")


def _compare_brick(pb, nb, path):
    if pb is None:
        assert nb is None, (path, nb)
    elif isinstance(pb, (int, np.integer)):
        assert isinstance(nb, int) and int(pb) == nb, (path, pb, nb)
    else:
        assert isinstance(nb, np.ndarray), (path, type(nb))
        np.testing.assert_array_equal(np.asarray(pb, dtype=np.uint32), nb, err_msg=path)


@pytest.mark.parametrize("size,brick,simplify", [
    (16, 4, False),
    (16, 4, True),
    (64, 4, True),
    (64, 16, True),
    (8, 2, True),
])
def test_differential_random_ops(size, brick, simplify):
    rng = np.random.default_rng(size * 31 + brick + simplify)
    py = BoxTree(size, brick, auto_simplify=simplify)
    nat = native_edit.NativeEditTree(size, brick, auto_simplify=simplify)
    rounds = 4 if size <= 16 else 2
    for _ in range(rounds):
        _apply_random_ops(rng, py, nat, 120, size)
        if size <= 16:
            np.testing.assert_array_equal(_dense(py, size), _dense(nat, size))
        else:
            # spot-check a random sample of voxels on larger trees
            pts = rng.integers(0, size, (400, 3))
            for p in pts:
                pp = tuple(int(v) for v in p)
                assert py.get_packed(pp) == nat.get_packed(pp), pp
        assert py.node_count == nat.node_count
        _walk_compare(py, nat)


def test_differential_dense_fill_then_carve():
    """Solid fills + carving exercise the whole-node fast paths and
    simplify collapse chains."""
    rng = np.random.default_rng(3)
    py = BoxTree(16, 4, auto_simplify=True)
    nat = native_edit.NativeEditTree(16, 4, auto_simplify=True)
    red = Albedo(255, 0, 0, 255)
    py.insert_at_lod((0, 0, 0), 16, red)
    nat.insert_at_lod((0, 0, 0), 16, red)
    np.testing.assert_array_equal(_dense(py, 16), _dense(nat, 16))
    _walk_compare(py, nat)
    for _ in range(60):
        p = tuple(int(v) for v in rng.integers(0, 16, 3))
        py.clear(p)
        nat.clear(p)
    np.testing.assert_array_equal(_dense(py, 16), _dense(nat, 16))
    assert py.node_count == nat.node_count
    _walk_compare(py, nat)
    # carve everything back out
    py.clear_at_lod((0, 0, 0), 16)
    nat.clear_at_lod((0, 0, 0), 16)
    np.testing.assert_array_equal(_dense(py, 16), _dense(nat, 16))
    _walk_compare(py, nat)


def test_update_merge_semantics():
    """update() keeps unspecified entry components (merge, not overwrite)."""
    py = BoxTree(16, 4)
    nat = native_edit.NativeEditTree(16, 4)
    red = Albedo(255, 0, 0, 255)
    for t in (py, nat):
        t.insert((3, 3, 3), red)
        t.update((3, 3, 3), Albedo(0, 0, 255, 255))
    assert py.get((3, 3, 3)).albedo == nat.get((3, 3, 3)).albedo
    np.testing.assert_array_equal(_dense(py, 16), _dense(nat, 16))


def test_last_access_matches_python_trigger_payload():
    """The native engine reports the same access stack depth and modified
    sectants the Python tree hands to update triggers."""
    py = BoxTree(64, 4)
    nat = native_edit.NativeEditTree(64, 4)
    payloads = []
    py.update_triggers.append(lambda stack, sect: payloads.append((stack, sect)))
    red = Albedo(255, 0, 0, 255)
    py.insert((10, 20, 30), red)
    nat.insert((10, 20, 30), red)
    stack, sect = nat.last_access()
    assert len(payloads) == 1
    py_stack = [k for k, _s in payloads[0][0]]
    assert len(stack) == len(py_stack)
    assert sorted(sect) == sorted(payloads[0][1])


def test_to_boxtree_round_trip_renders():
    """A natively-edited tree converts to a BoxTree that flattens and
    renders identically to the same edits applied in Python."""
    from voxelhex_tpu.render.bitgrid import BitGridRenderer
    from voxelhex_tpu.render.camera import orbit_camera
    from voxelhex_tpu.tree.flat import flatten

    rng = np.random.default_rng(21)
    py = BoxTree(16, 4, auto_simplify=True)
    nat = native_edit.NativeEditTree(16, 4, auto_simplify=True)
    _apply_random_ops(rng, py, nat, 200, 16)
    conv = nat.to_boxtree()
    np.testing.assert_array_equal(_dense(py, 16), _dense(conv, 16))
    assert conv.node_count == py.node_count
    cam = orbit_camera(16.0, resolution=(32, 24))
    a = BitGridRenderer(flatten(py)).render(cam, compact=False)
    b = BitGridRenderer(flatten(conv)).render(cam, compact=False)
    np.testing.assert_array_equal(a, b)


def test_from_boxtree_mirror_then_edit():
    """A bulk-built Python tree mirrors into the native engine (identical
    structure) and further edits stay in lockstep."""
    rng = np.random.default_rng(33)
    py = BoxTree(64, 4, auto_simplify=True)
    for _ in range(300):
        p = tuple(int(v) for v in rng.integers(0, 64, 3))
        py.insert(p, _random_entry(rng))
    nat = native_edit.NativeEditTree.from_boxtree(py)
    assert nat.node_count == py.node_count
    _walk_compare(py, nat)
    # continue editing both
    _apply_random_ops(rng, py, nat, 150, 64)
    assert nat.node_count == py.node_count
    _walk_compare(py, nat)
    pts = rng.integers(0, 64, (300, 3))
    for p in pts:
        pp = tuple(int(v) for v in p)
        assert py.get_packed(pp) == nat.get_packed(pp)


def test_batch_ops_match_per_op():
    """Batched native edits produce the identical tree to per-op edits."""
    rng = np.random.default_rng(44)
    n = 500
    pts = rng.integers(0, 64, (n, 3))
    cols = rng.integers(0, 256, (n, 4)).astype(np.uint8)
    cols[rng.random(n) < 0.1, 3] = 0  # transparent = no-op inserts

    a = native_edit.NativeEditTree(64, 4)
    b = native_edit.NativeEditTree(64, 4)
    a.insert_batch(pts, cols)
    for p, c in zip(pts, cols):
        b.insert(tuple(int(v) for v in p), Albedo(*(int(v) for v in c)))
    assert a.node_count == b.node_count
    qry = rng.integers(0, 64, (800, 3))
    got = a.get_packed_batch(qry)
    for i, p in enumerate(qry):
        assert int(got[i]) == b.get_packed(tuple(int(v) for v in p))

    # clears too
    cpts = pts[: n // 2]
    a.clear_batch(cpts)
    for p in cpts:
        b.clear(tuple(int(v) for v in p))
    assert a.node_count == b.node_count
    got = a.get_packed_batch(qry)
    for i, p in enumerate(qry):
        assert int(got[i]) == b.get_packed(tuple(int(v) for v in p))


def test_batch_matches_python_tree():
    """And the batched native tree still matches the Python tree."""
    rng = np.random.default_rng(45)
    pts = rng.integers(0, 64, (400, 3))
    cols = rng.integers(1, 256, (400, 4)).astype(np.uint8)
    cols[:, 3] = 255
    nat = native_edit.NativeEditTree(64, 4)
    nat.insert_batch(pts, cols)
    py = BoxTree(64, 4)
    for p, c in zip(pts, cols):
        py.insert(tuple(int(v) for v in p), Albedo(*(int(v) for v in c)))
    _walk_compare(py, nat)


def test_differential_with_user_data_entries():
    """Informative/Complex voxels (user-data palette) stay in lockstep:
    packed values carry a data index and emptiness consults the data table."""
    from voxelhex_tpu.tree.boxtree import Entry

    rng = np.random.default_rng(77)
    py = BoxTree(16, 4)
    nat = native_edit.NativeEditTree(16, 4)
    for i in range(200):
        p = tuple(int(v) for v in rng.integers(0, 16, 3))
        r = rng.random()
        if r < 0.3:
            e = Entry(albedo=_random_entry(rng), data=int(rng.integers(1, 50)))
        elif r < 0.6:
            e = Entry(data=int(rng.integers(1, 50)))  # informative only
        elif r < 0.8:
            e = Entry(albedo=_random_entry(rng))
        else:
            py.clear(p)
            nat.clear(p)
            continue
        py.insert(p, e)
        nat.insert(p, e)
    np.testing.assert_array_equal(_dense(py, 16), _dense(nat, 16))
    _walk_compare(py, nat)
    # entries round-trip identically (same palettes)
    for _ in range(50):
        p = tuple(int(v) for v in rng.integers(0, 16, 3))
        a, b = py.get(p), nat.get(p)
        assert a.albedo == b.albedo and a.data == b.data, p
