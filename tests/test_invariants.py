"""Fuzz: structural invariants hold across random edit sequences.

The analog of the reference's pervasive debug_assert! consistency checks
(reference: src/boxtree/update/insert.rs:476-492, iterate.rs:320-333):
occupancy derived from content, occlusion backed by a full neighbor, no
leaked or shared pool nodes.
"""

import numpy as np
import pytest

from voxelhex_tpu.tree.boxtree import Albedo, BoxTree
from voxelhex_tpu.tree.invariants import verify_invariants


def _random_entry(rng):
    c = rng.integers(0, 256, 4)
    if rng.random() < 0.15:
        c[3] = 0
    return Albedo(*(int(v) for v in c))


@pytest.mark.parametrize("size,brick,simplify", [
    (16, 4, False),
    (16, 4, True),
    (64, 4, True),
    (64, 16, True),
])
def test_invariants_hold_under_random_edits(size, brick, simplify):
    rng = np.random.default_rng(size + brick + simplify)
    t = BoxTree(size, brick, auto_simplify=simplify)
    for i in range(400):
        p = tuple(int(v) for v in rng.integers(0, size, 3))
        r = rng.random()
        if r < 0.5:
            t.insert(p, _random_entry(rng))
        elif r < 0.7:
            t.clear(p)
        elif r < 0.85:
            t.insert_at_lod(p, int(rng.choice([2, 4, 8])), _random_entry(rng))
        else:
            t.clear_at_lod(p, int(rng.choice([2, 4, 8])))
        if i % 100 == 99:
            assert verify_invariants(t) == []
    assert verify_invariants(t) == []


def test_invariants_catch_corruption():
    """The checker actually detects problems (not vacuously green)."""
    t = BoxTree(16, 4)
    t.insert((3, 3, 3), Albedo(255, 0, 0, 255))
    t.node(t.ROOT).occupied = 0  # corrupt occupancy
    assert any("occupied" in p for p in verify_invariants(t))
