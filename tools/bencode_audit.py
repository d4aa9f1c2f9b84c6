"""INDEPENDENT bencode ("bytecode") stream auditor — VERDICT r2 weak #6.

A second decoder for the reference save format, written ONLY from reading
the reference Rust sources (file:line cited per rule below) and sharing
NOTHING with :mod:`voxelhex_tpu.io.bencode` — no imports from it, its own
bencode reader, its own structural model.  A shared misreading of the wire
spec between the repo's encoder and its hand-assembled golden stream would
slip through round-trip tests; this auditor re-derives the grammar from
the Rust with fresh eyes and validates streams field by field.

Grammar (bendy bencode: ``i<n>e`` ints, ``<len>:<bytes>`` strings,
``l...e`` lists), from the reference:

* BoxTree   = l Version auto_simplify(int 0/1) boxtree_size brick_dim
              ObjectPool color_palette(list of Albedo)
              data_palette(list of T) MIPMapStrategy e
              — src/convert/bytecode.rs:691-703 (emit order)
* Version   = l major minor patch e        — bytecode.rs:20-26
* ObjectPool= l capacity NodeData... "#" e — only reserved slots, in index
              order; "#" is a bencode STRING end token
              — src/object_pool.rs:66-82
* NodeData  = l NodeContent NodeChildren mip(BrickData) occupied_bits(u64)
              occlusion_bits(u8) e         — bytecode.rs:258-267
* NodeContent: "#" Nothing | "##" Internal
              | l "###" BrickData*64 e Leaf
              | l "##u#" BrickData e UniformLeaf — bytecode.rs:314-329
* BrickData:  "#b" Empty | l "#b#" voxel e Solid
              | l "##b#" len voxel*len "#" e Parted — bytecode.rs:159-175
* NodeChildren: "##x##" NoChildren
              | l "##c##" child(u32)*64 e  — bytecode.rs:446-457
              (empty child = u32 empty_marker 0xFFFFFFFF,
               src/object_pool.rs:6-8 = u32::MAX)
* Albedo    = l r g b a e (u8 each)        — bytecode.rs:83-92
* MIPMapStrategy = l enabled(0/1) n (level method)*n m (level thr1000)*m e
              — bytecode.rs:520-536; the two maps are Rust HashMaps, so
              ENTRY ORDER IS ARBITRARY (any order is valid reference
              output) — bytecode.rs:525-533
* MIPResamplingMethods int codes: 0 BoxFilter, 1 PointFilter,
              2 PointFilterBD, 3+(thr*1000) Posterize,
              1003+(thr*1000) PosterizeBD; the reference DECODER accepts
              Posterize only in [3, 1002) and PosterizeBD in [1003, 2001)
              (exclusive upper bounds) — bytecode.rs:606-647
* Packed voxel (PaletteIndexValues u32): low u16 = color palette index,
              high u16 = data palette index, 0xFFFF = none
              — src/boxtree/node.rs:260-279

Usage: ``python tools/bencode_audit.py <file>`` or the API
:func:`audit_stream` / :func:`semantic_get`.
"""

from __future__ import annotations

import sys
from dataclasses import dataclass, field


class AuditError(Exception):
    pass


# --------------------------------------------------------------------------
# independent bencode reader


class _Reader:
    def __init__(self, data: bytes):
        self.d = data
        self.i = 0

    def _fail(self, msg):
        raise AuditError(f"@{self.i}: {msg}")

    def peek(self):
        if self.i >= len(self.d):
            self._fail("unexpected end of stream")
        return self.d[self.i : self.i + 1]

    def read_int(self):
        if self.peek() != b"i":
            self._fail(f"expected int, got {self.peek()!r}")
        j = self.d.index(b"e", self.i)
        body = self.d[self.i + 1 : j]
        # bendy emits canonical integers: no leading zeros, no empty body
        if not body or (body.startswith(b"0") and body != b"0") or (
            body.startswith(b"-")
        ):
            self._fail(f"non-canonical/negative integer {body!r}")
        self.i = j + 1
        return int(body)

    def read_str(self):
        c = self.peek()
        if not c.isdigit():
            self._fail(f"expected string, got {c!r}")
        j = self.d.index(b":", self.i)
        n = int(self.d[self.i : j])
        s = self.d[j + 1 : j + 1 + n]
        if len(s) != n:
            self._fail("truncated string")
        self.i = j + 1 + n
        return s

    def enter_list(self):
        if self.peek() != b"l":
            self._fail(f"expected list, got {self.peek()!r}")
        self.i += 1

    def at_end(self):
        return self.peek() == b"e"

    def exit_list(self):
        if self.peek() != b"e":
            self._fail(f"expected list end, got {self.peek()!r}")
        self.i += 1


# --------------------------------------------------------------------------
# structural model

EMPTY_CHILD = 0xFFFFFFFF  # u32 empty_marker, object_pool.rs:6-8
NONE_U16 = 0xFFFF


@dataclass
class Node:
    kind: str  # nothing | internal | leaf | uniform
    bricks: list = field(default_factory=list)  # 64 (leaf) or 1 (uniform)
    children: list | None = None  # 64 u32 keys, or None (##x##)
    mip: object = None
    occupied_bits: int = 0
    occlusion_bits: int = 0


@dataclass
class Model:
    version: tuple
    auto_simplify: bool
    size: int
    brick_dim: int
    capacity: int
    nodes: list
    palette: list  # [(r,g,b,a)]
    data_palette: list
    mip_enabled: bool
    mip_methods: dict
    mip_thresholds: dict


def _read_brick(r: _Reader, brick_dim: int, what: str):
    """bytecode.rs:159-175."""
    if r.peek() == b"l":
        r.enter_list()
        marker = r.read_str()
        if marker == b"#b#":
            v = r.read_int()
            r.exit_list()
            return ("solid", v)
        if marker == b"##b#":
            n = r.read_int()
            if n != brick_dim**3:
                raise AuditError(
                    f"{what}: parted brick len {n} != brick_dim^3 "
                    f"{brick_dim ** 3}"
                )
            vals = [r.read_int() for _ in range(n)]
            end = r.read_str()
            if end != b"#":
                raise AuditError(f"{what}: parted brick missing '#' end")
            r.exit_list()
            return ("parted", vals)
        raise AuditError(f"{what}: unknown brick marker {marker!r}")
    s = r.read_str()
    if s != b"#b":
        raise AuditError(f"{what}: expected '#b' empty brick, got {s!r}")
    return ("empty", None)


def _read_node(r: _Reader, brick_dim: int, idx: int) -> Node:
    """bytecode.rs:258-267 field order: content children mip occ ocl."""
    what = f"node {idx}"
    r.enter_list()
    # NodeContent, bytecode.rs:314-329
    if r.peek() == b"l":
        r.enter_list()
        marker = r.read_str()
        if marker == b"###":
            bricks = [_read_brick(r, brick_dim, what) for _ in range(64)]
            node = Node("leaf", bricks=bricks)
        elif marker == b"##u#":
            node = Node("uniform", bricks=[_read_brick(r, brick_dim, what)])
        else:
            raise AuditError(f"{what}: unknown content marker {marker!r}")
        r.exit_list()
    else:
        s = r.read_str()
        if s == b"#":
            node = Node("nothing")
        elif s == b"##":
            node = Node("internal")
        else:
            raise AuditError(f"{what}: unknown content token {s!r}")
    # NodeChildren, bytecode.rs:446-457
    if r.peek() == b"l":
        r.enter_list()
        marker = r.read_str()
        if marker != b"##c##":
            raise AuditError(f"{what}: unknown children marker {marker!r}")
        node.children = [r.read_int() for _ in range(64)]
        for c in node.children:
            if c > EMPTY_CHILD:
                raise AuditError(f"{what}: child key {c} exceeds u32")
        r.exit_list()
    else:
        s = r.read_str()
        if s != b"##x##":
            raise AuditError(f"{what}: expected '##x##', got {s!r}")
    node.mip = _read_brick(r, brick_dim, what + " mip")
    node.occupied_bits = r.read_int()
    if node.occupied_bits >= 1 << 64:
        raise AuditError(f"{what}: occupied_bits exceeds u64")
    node.occlusion_bits = r.read_int()
    if node.occlusion_bits >= 1 << 8:
        raise AuditError(f"{what}: occlusion_bits exceeds u8 (6 face bits)")
    r.exit_list()
    return node


def audit_stream(data: bytes) -> Model:
    """Parse + validate a full BoxTree stream; returns the semantic model
    or raises :class:`AuditError` naming the violated rule."""
    r = _Reader(data)
    r.enter_list()  # BoxTree list, bytecode.rs:691
    r.enter_list()  # Version, bytecode.rs:20-26
    version = (r.read_int(), r.read_int(), r.read_int())
    r.exit_list()
    auto_simplify = r.read_int()
    if auto_simplify not in (0, 1):
        raise AuditError("auto_simplify must be 0/1 (bytecode.rs:712-716)")
    size = r.read_int()
    brick_dim = r.read_int()
    # validity rules, src/boxtree/mod.rs:188-219
    if brick_dim & (brick_dim - 1):
        raise AuditError(f"brick_dim {brick_dim} not a power of two")
    s = size // brick_dim
    while s > 1 and s % 4 == 0:
        s //= 4
    if s != 1 or size < 4 * brick_dim:
        raise AuditError(f"size {size} != brick_dim * 4^k (k>=1)")

    # ObjectPool, object_pool.rs:66-82
    r.enter_list()
    capacity = r.read_int()
    nodes = []
    while True:
        if r.peek() == b"l":
            nodes.append(_read_node(r, brick_dim, len(nodes)))
        else:
            end = r.read_str()
            if end != b"#":
                raise AuditError(
                    f"ObjectPool: expected '#' end token, got {end!r}"
                )
            break
        if len(nodes) > capacity:
            raise AuditError(
                f"ObjectPool holds {len(nodes)} nodes > capacity {capacity}"
            )
    r.exit_list()

    # color palette: list of Albedo lists, bytecode.rs:83-92
    palette = []
    r.enter_list()
    while not r.at_end():
        r.enter_list()
        rgba = (r.read_int(), r.read_int(), r.read_int(), r.read_int())
        for v in rgba:
            if v > 255:
                raise AuditError(f"albedo component {v} exceeds u8")
        palette.append(rgba)
        r.exit_list()
    r.exit_list()
    if len(palette) > 65535:
        raise AuditError("palette exceeds u16 index space")

    # data palette: opaque T structures — skip one object per entry
    data_palette = []
    r.enter_list()
    depth = 0
    while not (depth == 0 and r.at_end()):
        c = r.peek()
        if c == b"l":
            r.enter_list()
            depth += 1
        elif c == b"e":
            r.exit_list()
            depth -= 1
        elif c == b"i":
            v = r.read_int()
            if depth == 0:
                data_palette.append(v)
        else:
            s2 = r.read_str()
            if depth == 0:
                data_palette.append(s2)
    r.exit_list()

    # MIPMapStrategy, bytecode.rs:520-536
    r.enter_list()
    enabled = r.read_int()
    if enabled not in (0, 1):
        raise AuditError("mip enabled flag must be 0/1")
    methods = {}
    n = r.read_int()
    for _ in range(n):
        level = r.read_int()
        code = r.read_int()
        # decoder ranges, bytecode.rs:622-647 (upper bounds EXCLUSIVE)
        if code in (0, 1, 2):
            methods[level] = code
        elif 3 <= code < 1002:
            methods[level] = ("posterize", (code - 3) / 1000.0)
        elif 1003 <= code < 2001:
            methods[level] = ("posterize_bd", (code - 1003) / 1000.0)
        else:
            raise AuditError(
                f"MIP method code {code} outside every accepted range "
                "(bytecode.rs:622-647; 1002 and 2001+ are REJECTED)"
            )
    m = r.read_int()
    thresholds = {}
    for _ in range(m):
        level = r.read_int()
        thresholds[level] = r.read_int() / 1000.0
    r.exit_list()
    r.exit_list()  # BoxTree
    if r.i != len(data):
        raise AuditError(f"{len(data) - r.i} trailing bytes after BoxTree")

    model = Model(version, bool(auto_simplify), size, brick_dim, capacity,
                  nodes, palette, data_palette, bool(enabled), methods,
                  thresholds)
    _audit_graph(model)
    return model


def _audit_graph(model: Model):
    """Cross-field invariants: child keys resolve to live re-keyed slots
    (the decoder re-keys sequentially, object_pool.rs:100-124), the graph
    from the root is acyclic, packed voxels index within the palettes."""
    n = len(model.nodes)
    if n == 0:
        raise AuditError("empty ObjectPool: no root node")
    seen = set()
    stack = [0]
    while stack:
        k = stack.pop()
        if k in seen:
            continue
        seen.add(k)
        node = model.nodes[k]
        if node.children:
            for c in node.children:
                if c == EMPTY_CHILD:
                    continue
                if c >= n:
                    raise AuditError(
                        f"node {k}: child key {c} outside the {n} live "
                        "slots (decoder re-keys sequentially)"
                    )
                stack.append(c)
        for kind, payload in _iter_bricks(node):
            if kind == "solid":
                _check_pix(model, k, payload)
            elif kind == "parted":
                for v in payload:
                    _check_pix(model, k, v)
    # cycle check: DFS with colors
    color = [0] * n

    def visit(k, path):
        if color[k] == 1:
            raise AuditError(f"child cycle through node {k}")
        if color[k] == 2:
            return
        color[k] = 1
        node = model.nodes[k]
        if node.children:
            for c in node.children:
                if c != EMPTY_CHILD and c < n:
                    visit(c, path + [c])
        color[k] = 2

    visit(0, [0])


def _iter_bricks(node: Node):
    for b in node.bricks:
        yield b
    if node.mip is not None:
        yield node.mip


def _check_pix(model: Model, k: int, pix: int):
    """node.rs:260-279: low u16 color index, high u16 data index."""
    if pix > 0xFFFFFFFF:
        raise AuditError(f"node {k}: voxel value {pix} exceeds u32")
    ci = pix & 0xFFFF
    di = pix >> 16
    if ci != NONE_U16 and ci >= max(1, len(model.palette)):
        raise AuditError(
            f"node {k}: color index {ci} outside palette "
            f"({len(model.palette)} entries)"
        )
    if di != NONE_U16 and di >= max(1, len(model.data_palette)):
        raise AuditError(
            f"node {k}: data index {di} outside data palette "
            f"({len(model.data_palette)} entries)"
        )


# --------------------------------------------------------------------------
# independent semantic sampling


def semantic_get(model: Model, pos):
    """Voxel lookup straight off the audited model (independent of the
    repo's BoxTree): returns (albedo rgba tuple | None, data index | None)
    or None when empty.  Descends via sectant_for (spatial/mod.rs:44-55),
    samples bricks via flat_projection x + y*d + z*d^2
    (spatial/math/mod.rs:19-21); uniform bricks stretch over the node."""
    x, y, z = pos
    k = 0
    node_min = [0, 0, 0]
    node_size = model.size
    while True:
        node = model.nodes[k]
        if node.kind == "nothing":
            return None
        cell = node_size // 4
        rel = [(x - node_min[0]) // cell, (y - node_min[1]) // cell,
               (z - node_min[2]) // cell]
        sect = rel[0] + rel[1] * 4 + rel[2] * 16
        if node.kind == "internal":
            if not node.children or node.children[sect] == EMPTY_CHILD:
                return None
            k = node.children[sect]
            node_min = [node_min[i] + rel[i] * cell for i in range(3)]
            node_size = cell
            continue
        d = model.brick_dim
        if node.kind == "uniform":
            brick = node.bricks[0]
            unit = node_size // d
        else:  # leaf: brick per sectant, spanning the sectant cell
            brick = node.bricks[sect]
            node_min = [node_min[i] + rel[i] * cell for i in range(3)]
            unit = cell // d
        kind, payload = brick
        if kind == "empty":
            return None
        if kind == "solid":
            pix = payload
        else:
            bx = (x - node_min[0]) // unit
            by = (y - node_min[1]) // unit
            bz = (z - node_min[2]) // unit
            pix = payload[bx + by * d + bz * d * d]
        ci = pix & 0xFFFF
        di = pix >> 16
        if ci == NONE_U16 and di == NONE_U16:
            return None
        albedo = model.palette[ci] if ci != NONE_U16 else None
        data = di if di != NONE_U16 else None
        return (albedo, data)


def main():
    path = sys.argv[1]
    data = open(path, "rb").read()
    model = audit_stream(data)
    print(f"OK: version {model.version}, {model.size}^3 tree, "
          f"brick_dim {model.brick_dim}, {len(model.nodes)} nodes, "
          f"{len(model.palette)} colors, mip={'on' if model.mip_enabled else 'off'}")


if __name__ == "__main__":
    main()
