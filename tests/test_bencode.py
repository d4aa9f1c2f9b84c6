"""Reference bencode ("bytecode") format: round-trips, wire-format golden
bytes, version gating, pool compaction (reference: src/convert/bytecode.rs,
src/convert/tests.rs)."""

import numpy as np
import pytest

from voxelhex_tpu.io import bencode
from voxelhex_tpu.tree.boxtree import Albedo, BoxTree, Entry


def _probe_equal(a: BoxTree, b: BoxTree, extent: int, step: int = 1):
    for x in range(0, extent, step):
        for y in range(0, extent, step):
            for z in range(0, extent, step):
                ea, eb = a.get((x, y, z)), b.get((x, y, z))
                assert ea == eb, f"mismatch at {(x, y, z)}: {ea} vs {eb}"


def _sample_tree(size=16, brick=4, auto_simplify=True) -> BoxTree:
    tree = BoxTree(size, brick_dim=brick, auto_simplify=auto_simplify)
    for i in range(size):
        tree.insert((i, i % 4, i // 2), Albedo(10 + i, 20, 30, 255))
    tree.insert_at_lod((0, 8, 0), 4, Albedo(200, 0, 0, 255))
    tree.insert((3, 3, 3), Entry(albedo=Albedo(1, 2, 3, 255), data=77))
    tree.insert((5, 1, 2), Entry(data=42))
    tree.clear((2, 2, 1))
    return tree


def test_roundtrip_voxels_and_palettes():
    tree = _sample_tree()
    data = bencode.to_bytes(tree)
    back = bencode.from_bytes(data)

    assert back.size == tree.size
    assert back.brick_dim == tree.brick_dim
    assert back.auto_simplify == tree.auto_simplify
    assert back.color_palette == tree.color_palette
    assert back.data_palette == tree.data_palette
    assert back.node_count == tree.node_count
    _probe_equal(tree, back, 16)


def test_roundtrip_preserves_structure_bits():
    tree = _sample_tree()
    back = bencode.from_bytes(bencode.to_bytes(tree))
    # pool has no holes here -> keys align; bits must match exactly
    for key, node in enumerate(tree._nodes):
        if node is None:
            continue
        other = back.node(key)
        assert other.ntype == node.ntype
        assert other.occupied == node.occupied
        assert other.occlusion == node.occlusion
        assert other.children == node.children


def test_roundtrip_compacts_holey_pool():
    tree = _sample_tree(size=64, brick=4)
    # carve whole subtrees so pool slots are freed (holes in _nodes)
    tree.clear_at_lod((0, 0, 0), 16)
    tree.clear_at_lod((0, 8, 0), 8)
    assert tree._free, "expected freed pool slots for this scenario"

    back = bencode.from_bytes(bencode.to_bytes(tree))
    assert back.node_count == tree.node_count
    assert not back._free
    _probe_equal(tree, back, 16)
    # remapped children must stay in range and acyclic from the root
    seen = set()
    stack = [BoxTree.ROOT]
    while stack:
        key = stack.pop()
        assert key not in seen
        seen.add(key)
        node = back.node(key)
        for child in node.children or []:
            if child != -1:
                stack.append(child)
    assert len(seen) == back.node_count


def test_roundtrip_mips_and_strategy():
    from voxelhex_tpu.tree.mipmap import POSTERIZE_BD, MIPStrategy, enable_mips

    tree = _sample_tree()
    strategy = MIPStrategy(enabled=True)
    strategy.set_method(2, POSTERIZE_BD, 0.125)
    strategy.set_similarity(3, 0.042)
    enable_mips(tree, strategy)

    back = bencode.from_bytes(bencode.to_bytes(tree))
    assert back.mip_strategy is not None
    assert back.mip_strategy.enabled
    assert back.mip_strategy.methods == tree.mip_strategy.methods
    assert (
        back.mip_strategy.color_matching_thresholds
        == tree.mip_strategy.color_matching_thresholds
    )
    # MIP bricks ride in NodeData: identical without any rebuild
    for key, node in enumerate(tree._nodes):
        if node is None or node.mip is None:
            continue
        other = back.node(key).mip
        if isinstance(node.mip, np.ndarray):
            assert np.array_equal(other, node.mip)
        else:
            assert other == node.mip


def test_render_parity_through_roundtrip():
    from voxelhex_tpu.render.oracle import get_by_ray
    from voxelhex_tpu.tree.flat import flatten

    tree = _sample_tree()
    back = bencode.from_bytes(bencode.to_bytes(tree))
    fa, fb = flatten(tree), flatten(back)
    origin = np.array([20.0, 10.0, 18.0])
    for target in [(4, 2, 3), (0, 8, 0), (8, 0, 8), (3, 3, 3)]:
        d = np.asarray(target, dtype=np.float64) + 0.5 - origin
        ray = (origin, d / np.linalg.norm(d))
        ha, hb = get_by_ray(fa, *ray), get_by_ray(fb, *ray)
        assert (ha is None) == (hb is None)
        if ha is not None:
            assert ha.voxel == hb.voxel
            np.testing.assert_allclose(ha.point, hb.point)
            np.testing.assert_array_equal(ha.normal, hb.normal)


def test_file_io_and_version_header(tmp_path):
    tree = _sample_tree()
    path = tmp_path / "scene.vhx"
    bencode.save(tree, path)

    with open(path, "rb") as f:
        head = f.read(bencode.bytes_until_version())
    assert bencode.parse_version(head) == bencode.LIBRARY_VERSION

    back = bencode.load(path)
    _probe_equal(tree, back, 16)


def test_version_gate():
    assert bencode.compatible((0, 6, 1), (0, 6, 0))
    assert bencode.compatible((0, 6, 0), (0, 6, 0))
    assert not bencode.compatible((0, 6, 0), (0, 6, 1))  # not commutative
    assert not bencode.compatible((0, 7, 0), (0, 6, 0))
    assert not bencode.compatible((1, 6, 0), (0, 6, 0))

    tree = _sample_tree(size=16, brick=4)
    data = bencode.to_bytes(tree)
    newer = data.replace(b"li0ei6ei0e", b"li9ei6ei0e", 1)
    with pytest.raises(ValueError, match="incompatible"):
        bencode.from_bytes(newer)


def test_wire_format_golden_bytes():
    """Decode a hand-assembled stream written straight from the reference's
    wire layout (bytecode.rs) — proving the decoder reads the reference
    format, not merely its own encoder's output."""
    brick = 2  # brick_dim 2 -> 8-voxel parted bricks
    # packed PaletteIndexValues: low u16 color index, high u16 data index,
    # 0xFFFF = none -> visual color 0 = 0xFFFF0000 (4294901760), empty =
    # 0xFFFFFFFF (4294967295).  Last brick cell (1,1,1) holds color 0.
    parted = b"l4:##b#i8e" + b"i4294967295e" * 7 + b"i4294901760e" + b"1:#e"
    root = (
        b"l"  # NodeData list
        b"l4:##u#" + parted + b"e"  # content: UniformLeaf(Parted)
        b"5:##x##"  # children: NoChildren
        b"2:#b"  # mip: empty
        b"i18446744073709551615e"  # occupied_bits (u64::MAX)
        b"i0e"  # occlusion_bits
        b"e"
    )
    stream = (
        b"l"
        b"li0ei6ei0ee"  # version 0.6.0
        b"i1e"  # auto_simplify
        b"i8e"  # boxtree_size
        b"i2e"  # brick_dim
        b"li4e" + root + b"1:#e"  # ObjectPool: capacity 4, 1 node, "#"
        b"lli9ei8ei7ei255eee"  # color palette: [Albedo(9,8,7,255)]
        b"le"  # data palette: empty
        b"li0ei0ei0ee"  # MIP strategy: disabled, no methods/thresholds
        b"e"
    )
    tree = bencode.from_bytes(stream)
    assert tree.size == 8 and tree.brick_dim == brick
    assert tree.color_palette == [Albedo(9, 8, 7, 255)]
    # voxel 7 of the uniform root brick is color 0 => Albedo(9,8,7,255);
    # a uniform brick stretches over the node: cell edge = 8/2 = 4 units
    assert tree.get((7, 7, 7)).albedo == Albedo(9, 8, 7, 255)
    assert tree.get((0, 0, 0)).is_none


def test_wire_format_emits_reference_markers():
    tree = _sample_tree()
    data = bencode.to_bytes(tree)
    assert data.startswith(b"lli0ei6ei0ee")  # version first, in a list
    for marker in (b"4:##b#", b"5:##c##", b"2:#b"):
        assert marker in data
    # encoder output is self-consistently decodable twice (fixed point)
    again = bencode.to_bytes(bencode.from_bytes(data))
    assert again == data


def test_custom_data_codec():
    class Payload:
        def __init__(self, tag, weight):
            self.tag = tag
            self.weight = weight

        def is_empty(self):  # VoxelData trait analog
            return False

        def __eq__(self, other):
            if not isinstance(other, Payload):
                return NotImplemented
            return (self.tag, self.weight) == (other.tag, other.weight)

        def __hash__(self):
            return hash((self.tag, self.weight))

    tree = BoxTree(16, brick_dim=4)
    tree.insert((1, 2, 3), Entry(albedo=Albedo(5, 5, 5, 255), data=Payload("ore", 3)))

    data = bencode.to_bytes(tree, data_encoder=lambda p: [p.tag, p.weight])
    back = bencode.from_bytes(
        data, data_decoder=lambda s: Payload(s[0].decode(), int(s[1]))
    )
    assert back.get((1, 2, 3)).data == Payload("ore", 3)
