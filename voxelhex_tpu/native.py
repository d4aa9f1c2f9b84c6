"""ctypes bindings to the native C++ host kernels (native/rasterize.cpp).

The shared library is compiled on demand with the system toolchain and
cached next to the sources; every caller must handle ``load() is None`` and
fall back to the NumPy implementation.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "..", "native", "rasterize.cpp")
_SO = os.path.join(os.path.dirname(__file__), "..", "native", "librasterize.so")


def load():
    """Load (building if needed) the native library; None when unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.abspath(_SRC)
    so = os.path.abspath(_SO)
    try:
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC", src, "-o", so],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(so)
    except Exception:
        return None

    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    u16p = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
    u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    i32 = ctypes.c_int32

    lib.rasterize_flat.argtypes = [u32p, i32p, i32p, i32, i32, i32, i32, u8p, u16p]
    lib.rasterize_flat.restype = None
    lib.rasterize_window.argtypes = [
        u32p, i32p, i32p, i32, i32, i32, i32, i32, i32, i32, i32, u8p, u16p
    ]
    lib.rasterize_window.restype = None
    lib.pack_level.argtypes = [u8p, i32, u32p, u32p, u8p]
    lib.pack_level.restype = None
    lib.rasterize_regions.argtypes = [
        u32p, i32p, i32p, i32, i32, i32, i32, i32p, i32, i32,
        u8p, u16p, u32p, u32p,
    ]
    lib.rasterize_regions.restype = None
    lib.copy_region.argtypes = [u8p, u16p, i32, i32, i32, i32, i32, u8p, u16p]
    lib.copy_region.restype = None
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
    i64 = ctypes.c_int64
    u32 = ctypes.c_uint32
    lib.bulk_group_sort.argtypes = [i64p, i64, i32, i32, i64p, i64p, i64p]
    lib.bulk_group_sort.restype = None
    lib.bulk_group_fill.argtypes = [
        u32p, i64p, i64p, i64, i32, u32, i64p, u32p, u64p, u8p
    ]
    lib.bulk_group_fill.restype = None
    _LIB = lib
    return _LIB


def bulk_group(positions: np.ndarray, packed: np.ndarray, size: int, d: int,
               empty_voxel: int):
    """Group point voxels into bricks in one native pass.

    Returns ``(uniq_cells int64[M], bricks uint32[M, d^3], occ uint64[M],
    solid bool[M])`` — brick-pool rows in ascending cell-id order with
    last-duplicate-wins semantics — or None when the library is unavailable.
    """
    lib = load()
    if lib is None:
        return None
    pos = np.ascontiguousarray(positions, dtype=np.int64)
    pk = np.ascontiguousarray(packed, dtype=np.uint32)
    n = pos.shape[0]
    keys = np.empty(n, dtype=np.int64)
    order = np.empty(n, dtype=np.int64)
    m_out = np.zeros(1, dtype=np.int64)
    lib.bulk_group_sort(pos, np.int64(n), np.int32(size), np.int32(d),
                        keys, order, m_out)
    m = int(m_out[0])
    uniq_cells = np.empty(m, dtype=np.int64)
    bricks = np.full((m, d**3), np.uint32(empty_voxel), dtype=np.uint32)
    occ = np.zeros(m, dtype=np.uint64)
    solid = np.zeros(m, dtype=np.uint8)
    lib.bulk_group_fill(pk, keys, order, np.int64(n), np.int32(d),
                        np.uint32(empty_voxel), uniq_cells,
                        bricks.reshape(-1), occ, solid)
    return uniq_cells, bricks, occ, solid.astype(bool)


def rasterize_flat(flat):
    """Dense (occ u8 [S^3], colors u16 [S^3]) grids, x-fastest flat layout.
    Returns None when the native library is unavailable."""
    lib = load()
    if lib is None:
        return None
    S = int(flat.size)
    occ = np.zeros(S * S * S, dtype=np.uint8)
    colors = np.full(S * S * S, 0xFFFF, dtype=np.uint16)
    meta = np.ascontiguousarray(flat.node_meta, dtype=np.uint32)
    children = np.ascontiguousarray(flat.node_children, dtype=np.int32)
    bricks = np.ascontiguousarray(flat.bricks, dtype=np.int32)
    lib.rasterize_flat(
        meta, children, bricks,
        np.int32(meta.shape[0]), np.int32(bricks.shape[0]),
        np.int32(flat.brick_dim), np.int32(S), occ, colors,
    )
    return occ, colors


def pack_pyramid(occ_flat: np.ndarray, S: int):
    """Build all pyramid levels from a dense x-fastest occupancy grid.
    Returns (levels_lo, levels_hi) lists or None when unavailable."""
    lib = load()
    if lib is None:
        return None
    levels_lo, levels_hi = [], []
    grid = np.ascontiguousarray(occ_flat, dtype=np.uint8)
    c = S
    while c > 1:
        if c % 4 != 0:
            target = ((c + 3) // 4) * 4
            padded = np.zeros(target * target * target, dtype=np.uint8)
            g3 = grid.reshape(c, c, c)  # [z, y, x]
            p3 = padded.reshape(target, target, target)
            p3[:c, :c, :c] = g3
            grid = padded
            c = target
        n = c // 4
        lo = np.empty(n * n * n, dtype=np.uint32)
        hi = np.empty(n * n * n, dtype=np.uint32)
        coarse = np.empty(n * n * n, dtype=np.uint8)
        lib.pack_level(grid, np.int32(c), lo, hi, coarse)
        levels_lo.append(lo)
        levels_hi.append(hi)
        grid = coarse
        c = n
    return levels_lo, levels_hi


def rasterize_regions(flat, corners: np.ndarray, rsize: int):
    """K ``rsize^3`` windows rasterized AND packed into 4^3-block occupancy
    words in ONE native call (one GIL release for the whole batch — the
    streaming layer's paging hot path).  ``corners`` is [K, 3] world
    voxel corners.  Returns ``(occ u8 [K, r^3], colors u16 [K, r^3],
    lo u32 [K, (r/4)^3], hi u32 [K, (r/4)^3])`` — dense grids x-fastest
    per region, words bit-identical to ``_pack_bits`` — or None when the
    native library is unavailable."""
    lib = load()
    if lib is None:
        return None
    corners = np.ascontiguousarray(corners, dtype=np.int32)
    K = corners.shape[0]
    r3 = rsize * rsize * rsize
    n3 = (rsize // 4) ** 3
    occ = np.empty(K * r3, dtype=np.uint8)
    colors = np.empty(K * r3, dtype=np.uint16)
    lo = np.empty(K * n3, dtype=np.uint32)
    hi = np.empty(K * n3, dtype=np.uint32)
    meta = np.ascontiguousarray(flat.node_meta, dtype=np.uint32)
    children = np.ascontiguousarray(flat.node_children, dtype=np.int32)
    bricks = np.ascontiguousarray(flat.bricks, dtype=np.int32)
    lib.rasterize_regions(
        meta, children, bricks,
        np.int32(meta.shape[0]), np.int32(bricks.shape[0]),
        np.int32(flat.brick_dim), np.int32(flat.size),
        corners.reshape(-1), np.int32(K), np.int32(rsize),
        occ, colors, lo, hi,
    )
    return (occ.reshape(K, r3), colors.reshape(K, r3),
            lo.reshape(K, n3), hi.reshape(K, n3))


def rasterize_window(flat, wx: int, wy: int, wz: int, wsize: int):
    """Dense (occ u8, colors u16) grids of one wsize^3 window (x-fastest),
    walking only tree nodes overlapping the window.  None when the native
    library is unavailable."""
    lib = load()
    if lib is None:
        return None
    occ = np.zeros(wsize * wsize * wsize, dtype=np.uint8)
    colors = np.full(wsize * wsize * wsize, 0xFFFF, dtype=np.uint16)
    meta = np.ascontiguousarray(flat.node_meta, dtype=np.uint32)
    children = np.ascontiguousarray(flat.node_children, dtype=np.int32)
    bricks = np.ascontiguousarray(flat.bricks, dtype=np.int32)
    lib.rasterize_window(
        meta, children, bricks,
        np.int32(meta.shape[0]), np.int32(bricks.shape[0]),
        np.int32(flat.brick_dim), np.int32(flat.size),
        np.int32(wx), np.int32(wy), np.int32(wz), np.int32(wsize),
        occ, colors,
    )
    return occ, colors
