"""BitGrid renderer: hierarchical dense-bitmap DDA — the TPU-native hot path.

Profiling on TPU showed random gathers execute on the scalar core at ~6 ns
per element, making every pointer-chase in the boxtree traversal (child keys,
node metadata, brick pointers, the register stack) the dominant cost.  This
renderer therefore re-represents the *render-resident* scene as a dense
occupancy-bit pyramid with **computed addresses**:

* level ``l`` partitions space into cells of ``4**l`` voxels; each group of
  4x4x4 cells ("block") stores its 64 occupancy bits as a (lo, hi) u32 pair,
  addressed arithmetically from block coordinates — the same bit layout as
  the boxtree's per-node occupancy (reference: src/boxtree/types.rs
  occupied_bits), with the pointer tree erased;
* traversal is the reference CPU tracer's PUSH/POP/ADVANCE sectant automaton
  (reference: src/raytracing/cpu.rs:296-458), but nodes have no identity:
  DESCEND/ASCEND compute a block address and fetch one u32 pair; ADVANCE is
  pure arithmetic; the level-0 block IS the local 4^3 voxel bitmap, so voxel
  tests are register bit tests — at most 2 gathered words per iteration and
  usually zero;
* color resolves after the march with ONE gather from a dense uint16 color
  grid.

Memory: S^3/8 bytes of bitmaps + 2*S^3 bytes of colors — dense by design;
HBM is plentiful, and vast sparse scenes should page BitGrid regions through
the streaming layer instead of growing S.

The occupancy pyramid doubles as an LOD structure: marching can stop at a
coarser level by distance (future: MIP colors per level).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from voxelhex_tpu.constants import BOX_NODE_CHILDREN_COUNT
from voxelhex_tpu.render.jax_renderer import _shade
from voxelhex_tpu.render.wavefront import (
    _dda_step_v,
    _impact_normal_v,
    _occ_bit_v,
    _offset_sectant_v,
    _sectant_offset_v,
    _step_sectant_v,
)
from voxelhex_tpu.spatial.luts import ray_occupancy_masks_u32
from voxelhex_tpu.tree.boxtree import BoxTree
from voxelhex_tpu.tree.flat import EMPTY_DESC, SOLID_FLAG, FlatTree, flatten

F32 = jnp.float32
I32 = jnp.int32
U32 = jnp.uint32

OOB = BOX_NODE_CHILDREN_COUNT
_MASK_LO, _MASK_HI = ray_occupancy_masks_u32()

def _reach_mask_v(tsect_c, octant):
    """Arithmetic per-ray reachability mask: the 64-bit set of sectants a ray
    entering at ``tsect_c`` with direction-octant ``octant`` can still touch
    (replaces RAY_TO_NODE_OCCUPANCY_BITMASK_LUT gathers with shift math).

    Axis masks: allowed x in [sx..3] for +x rays else [0..sx]; idem y, z.
    The 64-bit mask factorizes as xmask * ymask * zmask replicated over
    nibbles / rows / planes; computed on (lo, hi) u32 word pairs.
    """
    sx = (tsect_c % 4).astype(U32)
    sy = ((tsect_c // 4) % 4).astype(U32)
    sz = (tsect_c // 16).astype(U32)
    xp = (octant & 1) != 0
    zp = (octant & 2) != 0
    yp = (octant & 4) != 0

    xm4 = jnp.where(xp, (U32(0xF) << sx) & U32(0xF), U32(0xF) >> (U32(3) - sx))
    x32 = xm4 * U32(0x11111111)  # replicate nibble over 8 nibbles

    ym16 = jnp.where(
        yp, (U32(0xFFFF) << (sy * 4)) & U32(0xFFFF), U32(0xFFFF) >> ((U32(3) - sy) * 4)
    )
    y32 = ym16 * U32(0x00010001)  # replicate row over 2 rows per word

    # z planes: plane k occupies bits [16k, 16k+16); lo holds planes 0-1,
    # hi holds planes 2-3
    zsh = sz * 16
    ones = U32(0xFFFFFFFF)
    z_lo_pos = jnp.where(sz < 2, (ones << (zsh % 32)) & ones, U32(0))
    z_hi_pos = jnp.where(sz < 2, ones, ones << (zsh % 32))
    z_lo_neg = jnp.where(sz < 2, ones >> ((U32(1) - jnp.minimum(sz, 1)) * 16), ones)
    # for sz in {0,1}: lo keeps planes [0..sz] -> mask = ones >> ((1-sz)*16)
    z_hi_neg = jnp.where(sz >= 2, ones >> ((U32(3) - sz) * 16), U32(0))
    z_lo = jnp.where(zp, z_lo_pos, z_lo_neg)
    z_hi = jnp.where(zp, z_hi_pos, z_hi_neg)

    m_lo = x32 & y32 & z_lo
    m_hi = x32 & y32 & z_hi
    return m_lo, m_hi


COLOR_EMPTY = 0xFFFF  # voxel empty (never returned for hits)
COLOR_NONE = 0xFFFE  # voxel occupied but colorless (data-only voxel)


@dataclass
class BitGrid:
    """Dense occupancy pyramid + dense color-index grid."""

    size: int
    n_levels: int  # block levels; level-0 blocks span 4 voxels
    level_bases: np.ndarray  # int64[n_levels] word-pair base offset per level
    occ_lo: np.ndarray  # uint32[total_blocks]
    occ_hi: np.ndarray  # uint32[total_blocks]
    colors: np.ndarray  # uint16[S^3], flat index x + y*S + z*S^2
    palette: np.ndarray  # float32[P, 4]
    # Optional per-level MIP colors for LOD rendering: mip_rgb[l] is a
    # float32 [(S/4^l)^3, 3] grid of averaged colors at cell granularity
    # (the render-time analog of the reference's per-node MIP bricks,
    # viewport_render.wgsl:328-364).
    mip_rgb: list = None


def build_mip_colors(bg: "BitGrid") -> "BitGrid":
    """Attach per-level averaged color grids (gamma-2 box filter over
    occupied voxels, like the reference's BoxFilter MIP resampler)."""
    S = bg.size
    pal = np.asarray(bg.palette, dtype=np.float32)
    ci = np.minimum(np.asarray(bg.colors), pal.shape[0] - 1).astype(np.int64)
    occupied = np.asarray(bg.colors) != COLOR_EMPTY
    rgb = pal[ci][:, :3] ** 2
    rgb[~occupied] = 0.0
    w = occupied.astype(np.float32)
    rgb = rgb.reshape(S, S, S, 3)  # [z, y, x, 3]
    w = w.reshape(S, S, S)
    mip_rgb = []
    c = S
    while c > 1:
        n = max(c // 4, 1)
        f = c // n
        rgb_b = rgb.reshape(n, f, n, f, n, f, 3).sum(axis=(1, 3, 5))
        w_b = w.reshape(n, f, n, f, n, f).sum(axis=(1, 3, 5))
        avg = np.sqrt(rgb_b / np.maximum(w_b[..., None], 1.0))
        mip_rgb.append(avg.reshape(-1, 3).astype(np.float32))
        rgb, w, c = rgb_b, w_b, n
    bg.mip_rgb = mip_rgb
    return bg


def _dense_from_flat(flat: FlatTree):
    """Rasterize a flat snapshot into dense [x,y,z] occupancy + color grids."""
    S, d = flat.size, flat.brick_dim
    occ = np.zeros((S, S, S), dtype=bool)
    col = np.full((S, S, S), COLOR_EMPTY, dtype=np.uint16)

    def paint(desc, x0, y0, z0, extent):
        """Paint one brick descriptor spanning ``extent`` voxels."""
        if desc == EMPTY_DESC:
            return
        sl = np.s_[x0 : x0 + extent, y0 : y0 + extent, z0 : z0 + extent]
        if desc & SOLID_FLAG:
            v = desc & (SOLID_FLAG - 1)
            occ[sl] = True
            col[sl] = COLOR_NONE if v >= COLOR_NONE else v
            return
        vox = flat.bricks[desc]  # flat, x-fastest
        grid = vox.reshape(d, d, d).transpose(2, 1, 0)  # -> [x, y, z]
        if extent >= d:
            f = extent // d
            if f > 1:
                grid = np.repeat(np.repeat(np.repeat(grid, f, 0), f, 1), f, 2)
        else:
            grid = grid[:extent, :extent, :extent]
        occupied = grid != EMPTY_DESC
        colors = np.where(
            grid >= COLOR_NONE, COLOR_NONE, np.maximum(grid, 0)
        ).astype(np.uint16)
        occ[sl] |= occupied
        csl = col[sl]
        csl[occupied] = colors[occupied]
        col[sl] = csl

    def visit(key, x0, y0, z0, size_):
        meta = int(flat.node_meta[key])
        cell = size_ // 4
        if meta & 2:  # uniform
            paint(int(flat.node_children[key, 0]), x0, y0, z0, size_)
        elif meta & 1:  # leaf
            for s in range(BOX_NODE_CHILDREN_COUNT):
                desc = int(flat.node_children[key, s])
                if desc == EMPTY_DESC:
                    continue
                paint(
                    desc,
                    x0 + (s % 4) * cell,
                    y0 + ((s // 4) % 4) * cell,
                    z0 + (s // 16) * cell,
                    cell,
                )
        else:  # internal
            for s in range(BOX_NODE_CHILDREN_COUNT):
                child = int(flat.node_children[key, s])
                if child < 0:
                    continue
                visit(
                    child,
                    x0 + (s % 4) * cell,
                    y0 + ((s // 4) % 4) * cell,
                    z0 + (s // 16) * cell,
                    cell,
                )

    visit(0, 0, 0, 0, S)
    return occ, col


def _pack_bits(grid_xyz):
    """bool [c,c,c] (x,y,z) -> ((lo, hi) u32 flat block arrays, coarse grid).

    Flat block index = bx + by*n + bz*n^2; bit s = cx + 4*cy + 16*cz.
    Grids with fewer than 4 cells per axis are zero-padded to one block.
    """
    c = grid_xyz.shape[0]
    if c % 4 != 0:
        target = ((c + 3) // 4) * 4
        padded = np.zeros((target, target, target), dtype=bool)
        padded[:c, :c, :c] = grid_xyz
        grid_xyz = padded
        c = target
    n = c // 4
    g = grid_xyz.reshape(n, 4, n, 4, n, 4)  # [bx, x, by, y, bz, z]
    g = g.transpose(0, 2, 4, 5, 3, 1)  # [bx, by, bz, z, y, x]
    bits = g.reshape(n, n, n, 64)
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    words = (bits.astype(np.uint64) * weights).sum(axis=-1, dtype=np.uint64)
    flat = words.transpose(2, 1, 0).ravel()  # x fastest
    lo = (flat & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (flat >> np.uint64(32)).astype(np.uint32)
    coarse = bits.any(axis=-1)  # [bx, by, bz]
    return lo, hi, coarse


def _pack_bits_batch(occs):
    """Vectorized :func:`_pack_bits` over K same-size grids: bool
    [K, c, c, c] (x, y, z) -> (lo, hi) u32 [K, (c/4)^3] flat block arrays
    (x-fastest, bit s = cx + 4*cy + 16*cz — identical per-grid layout).
    One call packs a whole region batch; the per-region loop cost
    (~1.3 ms/region of numpy call overhead, the fly-over paging
    bottleneck) collapses into one vector pass."""
    K, c = occs.shape[0], occs.shape[1]
    n = c // 4
    g = occs.reshape(K, n, 4, n, 4, n, 4)  # [K, bx, x, by, y, bz, z]
    g = g.transpose(0, 1, 3, 5, 6, 4, 2)  # [K, bx, by, bz, z, y, x]
    bits = g.reshape(K, n, n, n, 64)
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    words = (bits.astype(np.uint64) * weights).sum(axis=-1, dtype=np.uint64)
    flat = words.transpose(0, 3, 2, 1).reshape(K, -1)  # x fastest
    lo = (flat & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (flat >> np.uint64(32)).astype(np.uint32)
    return lo, hi


def build_bitgrid(source) -> BitGrid:
    """Build the dense pyramid from a BoxTree or FlatTree.

    Uses the native C++ rasterizer/packer (voxelhex_tpu.native) when
    available, with a NumPy fallback."""
    flat = source if isinstance(source, FlatTree) else flatten(source)

    from voxelhex_tpu import native

    nat = native.rasterize_flat(flat)
    if nat is not None:
        occ_flat, col_flat = nat
        packed = native.pack_pyramid(occ_flat, flat.size)
    else:
        packed = None

    if packed is not None:
        levels_lo, levels_hi = packed
        colors = col_flat
        bases = np.zeros(len(levels_lo), dtype=np.int64)
        for i in range(1, len(levels_lo)):
            bases[i] = bases[i - 1] + len(levels_lo[i - 1])
    else:
        occ, col = _dense_from_flat(flat)
        levels_lo, levels_hi, bases = _pack_pyramid(occ)
        colors = col.transpose(2, 1, 0).ravel()  # flat, x fastest

    return BitGrid(
        size=flat.size,
        n_levels=len(levels_lo),
        level_bases=bases,
        occ_lo=np.concatenate(levels_lo),
        occ_hi=np.concatenate(levels_hi),
        colors=colors,
        palette=flat.palette,
    )


def _pack_pyramid(occ_xyz: np.ndarray):
    """Pack a bool [c,c,c] (x,y,z) grid into all pyramid levels.
    Returns ``(levels_lo, levels_hi, bases)`` — the shared NumPy pack loop
    used by build_bitgrid, bitgrid_from_occupancy and the streaming layer."""
    levels_lo, levels_hi = [], []
    grid = occ_xyz
    while grid.shape[0] > 1:
        lo, hi, coarse = _pack_bits(grid)
        levels_lo.append(lo)
        levels_hi.append(hi)
        grid = coarse
    bases = np.zeros(len(levels_lo), dtype=np.int64)
    for i in range(1, len(levels_lo)):
        bases[i] = bases[i - 1] + len(levels_lo[i - 1])
    return levels_lo, levels_hi, bases


def bitgrid_from_occupancy(occ_xyz: np.ndarray, palette=None) -> BitGrid:
    """Build a BitGrid pyramid over a raw boolean occupancy grid [x, y, z]
    (all occupied voxels take palette index 0).  Used for auxiliary grids —
    e.g. the beam prepass's dilated coarse occupancy — that have no color
    content of their own."""
    S = int(occ_xyz.shape[0])
    levels_lo, levels_hi, bases = _pack_pyramid(occ_xyz)
    colors = (
        np.where(occ_xyz, 0, COLOR_EMPTY)
        .astype(np.uint16)
        .transpose(2, 1, 0)
        .ravel()
    )
    pal = (
        np.asarray(palette, dtype=np.float32)
        if palette is not None
        else np.ones((1, 4), dtype=np.float32)
    )
    return BitGrid(
        size=S,
        n_levels=len(levels_lo),
        level_bases=bases,
        occ_lo=np.concatenate(levels_lo),
        occ_hi=np.concatenate(levels_hi),
        colors=colors,
        palette=pal,
    )


def parent_index(bg: BitGrid) -> np.ndarray:
    """int32 [B]: for every pyramid block, the flat index of its PARENT
    block (the level-(l+1) block whose cell it is); -1 for top-level blocks.

    Row gathers cost the same at width 2 and width 4 on TPU (measured flat
    2..32, benches/gather_width.py), so each block's row carries its parent's
    occupancy words for free — letting the tracer test a lateral-step target
    block for emptiness WITHOUT the extra move-in iteration."""
    n_levels = bg.n_levels
    dims = []
    c = int(bg.size)
    for _ in range(n_levels):
        dims.append(max((c + 3) // 4, 1))
        c = dims[-1]
    bases = [int(b) for b in bg.level_bases]
    total = len(bg.occ_lo)
    pidx = np.full(total, -1, dtype=np.int32)
    for l in range(n_levels - 1):
        n = dims[l]
        np_ = dims[l + 1]
        bc = np.arange(n)
        bx, by, bz = np.meshgrid(bc, bc, bc, indexing="ij")  # ij: bx,by,bz
        # flat block index is x-fastest: bx + by*n + bz*n^2
        flat = (bx + by * n + bz * n * n).ravel()
        par = (bx // 4 + (by // 4) * np_ + (bz // 4) * np_ * np_).ravel()
        pidx[bases[l] + flat] = bases[l + 1] + par
    return pidx


def quads_from_pairs(pairs, pidx):
    """[B,2] u32 pairs + int32 [B] parent index -> [B,4] quad rows
    (lo, hi, parent_lo, parent_hi); top-level rows get all-ones parent words
    (never skipped).  Works for numpy and jnp inputs; jit-friendly."""
    pw = pairs[jnp.maximum(pidx, 0)]
    pw = jnp.where((pidx < 0)[:, None], jnp.uint32(0xFFFFFFFF), pw)
    return jnp.concatenate([pairs, pw], axis=1)


_quads_from_pairs_jit = jax.jit(quads_from_pairs)


def device_bitgrid(bg: BitGrid, color_u8: bool = False,
                   skip_rows: bool = False) -> dict:
    # occupancy words interleaved as [B, 2] rows: ONE row gather per fetch —
    # measured 4.5x cheaper than two separate gathers on TPU (see PERF.md).
    # The tracer fetches [B, 4] quad rows (pair + parent pair — width is
    # free); the pair array stays canonical for streaming delta updates.
    occ_pairs = np.stack([bg.occ_lo, bg.occ_hi], axis=1)
    pidx = parent_index(bg)
    pw = occ_pairs[np.maximum(pidx, 0)]
    pw[pidx < 0] = 0xFFFFFFFF
    occ_quads = np.concatenate([occ_pairs, pw], axis=1)
    cols = np.asarray(bg.colors)
    if color_u8:
        # halve color HBM when every palette index fits a byte (sentinels
        # 0xFFFF/0xFFFE remap to 255/254; the tracer's resolve_color reads
        # the dtype).  Falls back silently when the palette is too large —
        # the capacity lever for vast resident/sharded scenes.
        real = cols[cols < COLOR_NONE]
        if real.size == 0 or int(real.max()) <= 253:
            cols = np.where(
                cols == COLOR_EMPTY, 255, np.where(cols == COLOR_NONE, 254, cols)
            ).astype(np.uint8)
    out = {
        "occ_pairs": jnp.asarray(occ_pairs, dtype=U32),
        "occ_quads": jnp.asarray(occ_quads, dtype=U32),
        "colors": jnp.asarray(cols),
        "palette": jnp.asarray(bg.palette, dtype=F32),
        "size": jnp.asarray(float(bg.size), dtype=F32),
    }
    if skip_rows:
        out["skip_rows"] = jnp.asarray(build_skip_rows(bg))
    if bg.mip_rgb is not None:
        for l, grid in enumerate(bg.mip_rgb):
            out[f"mip_rgb_{l}"] = jnp.asarray(grid, dtype=F32)
    return out


def plan_from_rounds(rounds, shrink: int = 4, min_bucket: int = 8192,
                     margin: float = 1.0, pre=None):
    """Derive a fixed (iters, compact-to-bucket) schedule from a previous
    frame's per-round stats.  ``bucket=None`` means "no compaction after
    this round".  Buckets stay on the same shrink-ladder as the adaptive
    loop so every shape is already in the compile cache.  Bucket sizes
    affect only CAPACITY (overflow is detected and falls back), never ray
    results, so a plan built from one frame is safe to replay on the next.

    ``margin`` > 1 bumps a bucket one ladder step when the observed count
    fills more than 1/margin of it; the default replays the adaptive
    ladder exactly (a 4x-larger bucket costs 4x tail-round work every
    frame, whereas an occasional overflow costs one adaptive retrace)."""
    if not rounds:
        return None

    def _wrap(plan):
        # ``pre``: the round-0 compaction stats of the recorded frame
        # ({n_alive, bucket, R0}).  A planned pre bucket lets the next
        # frame pack beam-proved-dead rays away with NO blocking host read
        # (the alive count joins the schedule's batched fetch; overflow ->
        # adaptive retrace, like any other planned bucket).
        if pre is None or pre.get("n_alive") is None:
            return plan
        R0 = pre["R0"]
        b = R0
        while b // shrink >= max(pre["n_alive"], min_bucket):
            b //= shrink
        if b < margin * max(pre["n_alive"], 1):
            b = min(b * shrink, R0)
        return {"pre": (b if b < R0 else None), "rounds": plan}

    plan = []
    cur = rounds[0]["bucket"]
    for r in rounds:
        n_act = r["n_active"]
        if n_act == 0:
            plan.append((r["iters"], None))
            return _wrap(plan)
        target = max(n_act, min_bucket)
        bucket = cur
        while bucket // shrink >= target:
            bucket //= shrink
        if bucket < margin * n_act:  # too tight: one ladder step of headroom
            bucket = min(bucket * shrink, cur)
        plan.append((r["iters"], bucket if bucket < cur else None))
        cur = min(bucket, cur)
    # previous frame ended with actives (max_iters): the plan is INCOMPLETE —
    # mark it so the fused path (which cannot extend a schedule) routes it
    # through the non-fused replay that adaptively finishes the stragglers,
    # instead of paying a full fused trace + a full adaptive retrace per frame
    out = _wrap(plan)
    if not isinstance(out, dict):
        out = {"pre": None, "rounds": out}
    out["complete"] = False
    return out


def make_bitgrid_tracer(bg: BitGrid, max_iters: int = 2048, max_restarts: int = 4,
                        lod_scale: float = 0.0, lateral_step: bool = True,
                        parent_skip: bool = False, advance_substeps: int = 2):
    """``trace(tree, origins, dirs, start_t=None)`` over the dense pyramid.

    ``lateral_step``: on block exit, move DIRECTLY to the same-level
    neighbor block (computed address — the dense pyramid needs no pointer
    tree) instead of the reference's POP+re-PUSH pair; empty neighbors
    still ascend via the reachability mask on the next iteration.  Saves
    one fetch-iteration per lateral block crossing; bit-exact results.

    ``parent_skip`` (experimental, measured ~neutral — see PERF.md): each
    fetched row also carries the PARENT block's occupancy words (same gather
    cost — row width 2..32 is flat on TPU).  A lateral step whose target
    sibling block is empty per the parent word ascends immediately instead
    of moving into the empty block.  Bit-exact results, but empty laterals
    were never expensive (the substep advance crosses them), so it saves
    almost no iterations; off by default."""
    S = float(bg.size)
    Si = int(bg.size)
    n_levels = bg.n_levels
    bases = [int(b) for b in bg.level_bases]
    top_level = n_levels - 1
    # blocks per axis at each level (partial top grids pad to one block)
    dims = []
    c = Si
    for _ in range(n_levels):
        dims.append(max((c + 3) // 4, 1))
        c = dims[-1]
    cell_sizes = [float(4**l) for l in range(n_levels)]
    top_block = cell_sizes[top_level] * 4.0  # may exceed S when padded

    def fetch_words(tree, level, bmin):
        addr = jnp.zeros(bmin.shape[0], dtype=I32)
        for l in range(n_levels):
            bs = cell_sizes[l] * 4.0
            bc = jnp.floor(bmin / bs).astype(I32)
            a = bases[l] + bc[:, 0] + bc[:, 1] * dims[l] + bc[:, 2] * dims[l] * dims[l]
            addr = jnp.where(level == l, a, addr)
        if parent_skip:
            addr = jnp.clip(addr, 0, tree["occ_quads"].shape[0] - 1)
            quad = tree["occ_quads"][addr]  # single row gather (width is free)
            return quad[:, 0], quad[:, 1], quad[:, 2], quad[:, 3]
        addr = jnp.clip(addr, 0, tree["occ_pairs"].shape[0] - 1)
        pair = tree["occ_pairs"][addr]  # single row gather
        return pair[:, 0], pair[:, 1]

    def init(tree, o, dirv, start_t=None):
        R = o.shape[0]
        size = tree["size"]

        sf = jnp.stack(
            [
                jnp.sqrt(1.0 + (dirv[:, 2] / dirv[:, 0]) ** 2 + (dirv[:, 1] / dirv[:, 0]) ** 2),
                jnp.sqrt((dirv[:, 0] / dirv[:, 1]) ** 2 + 1.0 + (dirv[:, 2] / dirv[:, 1]) ** 2),
                jnp.sqrt((dirv[:, 0] / dirv[:, 2]) ** 2 + (dirv[:, 1] / dirv[:, 2]) ** 2 + 1.0),
            ],
            axis=-1,
        )
        octant = (
            (dirv[:, 0] >= 0).astype(I32)
            + (dirv[:, 2] >= 0).astype(I32) * 2
            + (dirv[:, 1] >= 0).astype(I32) * 4
        )

        t_lo = (0.0 - o) / dirv
        t_hi = (size - o) / dirv
        per_min = jnp.fmin(t_lo, t_hi)
        per_max = jnp.fmax(t_lo, t_hi)
        tmin_r = jnp.fmax(jnp.fmax(per_min[:, 0], per_min[:, 1]), per_min[:, 2])
        tmax_r = jnp.fmin(jnp.fmin(per_max[:, 0], per_max[:, 1]), per_max[:, 2])
        root_hit = ~((tmax_r < 0.0) | (tmin_r > tmax_r))
        enter = jnp.maximum(tmin_r, 0.0)
        if start_t is not None:
            # a caller-guaranteed conservative start at or beyond the box
            # exit proves the ray misses everything: deactivate it AT INIT
            # so a pre-round-0 compaction (trace_compacted) can drop it
            # before the expensive full-width first round ever runs.
            # (Previously such rays marched 1-2 iterations from just inside
            # the exit and died — same miss, full-width cost.)
            root_hit = root_hit & (start_t < tmax_r)
            enter = jnp.clip(
                jnp.maximum(enter, start_t), 0.0, jnp.maximum(tmax_r - 1e-3, 0.0)
            )
        point = o + dirv * enter[:, None]

        level = jnp.full(R, top_level, dtype=I32)
        fetched = fetch_words(tree, level, jnp.zeros((R, 3), dtype=F32))
        occ_lo0, occ_hi0 = fetched[0], fetched[1]
        tsize0 = jnp.full(R, cell_sizes[top_level], dtype=F32)
        tsect0 = jnp.where(
            root_hit, _offset_sectant_v(point, jnp.full(R, top_block)), OOB
        ).astype(I32)
        tmin0 = _sectant_offset_v(jnp.clip(tsect0, 0, 63)) * top_block

        return (point, tsect0, tmin0, tsize0, level, occ_lo0, occ_hi0,
                dirv, sf, octant,
                root_hit,  # active
                jnp.zeros(R, dtype=jnp.bool_),  # hit
                jnp.zeros((R, 3), dtype=I32),  # hvox
                jnp.zeros((R, 3), dtype=F32),  # hnormal
                jnp.zeros(R, dtype=I32),  # restarts
                jnp.zeros((R, 3), dtype=F32),  # bmin
                o,  # ray origins (for LOD distance)
                jnp.zeros(R, dtype=I32),  # hlev: level at hit
                ) + (fetched[2:] if parent_skip else ())  # parent words

    def body(tree, st):
        (point, tsect, tmin, tsize, level, occ_lo, occ_hi,
         dirv, sf, octant, active, hit, hvox, hnormal, restarts, bmin,
         origin, hlev, *pwords) = st
        R = point.shape[0]
        size = tree["size"]

        tsect_c = jnp.clip(tsect, 0, 63)
        occupied = _occ_bit_v(occ_lo, occ_hi, tsect) != 0
        m_lo, m_hi = _reach_mask_v(tsect_c, octant)
        no_overlap = ((occ_lo & m_lo) == 0) & ((occ_hi & m_hi) == 0)

        if lod_scale > 0.0:
            dist = jnp.sqrt(jnp.sum((point - origin) ** 2, axis=-1))
            # stop at the level whose cells subtend ~lod_scale of distance
            stop_level = jnp.clip(
                (jnp.log2(jnp.maximum(dist * lod_scale, 1.0)) * 0.5).astype(I32),
                0,
                top_level,
            )
        else:
            stop_level = jnp.zeros_like(level)
        at_bottom = level <= stop_level
        found = active & occupied & at_bottom & (tsect < OOB)
        normal = _impact_normal_v(tmin, tsize, point)
        hit = hit | found
        hvox = jnp.where(found[:, None], tmin.astype(I32), hvox)
        hnormal = jnp.where(found[:, None], normal, hnormal)
        hlev = jnp.where(found, level, hlev)
        active = active & (~found)

        descend = active & occupied & (~at_bottom) & (tsect < OOB)
        if lateral_step:
            lateral = active & (tsect >= OOB) & (~descend)
            ascend = active & no_overlap & (~descend) & (~lateral)
        else:
            lateral = jnp.zeros_like(active)
            ascend = active & ((tsect >= OOB) | no_overlap) & (~descend)
        advance = active & (~descend) & (~ascend) & (~lateral)

        # --- DESCEND into the occupied cell
        d_level = level - 1
        d_tsize = tsize / 4.0
        d_tsect = _offset_sectant_v(point - tmin, tsize)
        d_tmin = tmin + _sectant_offset_v(d_tsect) * tsize[:, None]

        # --- ASCEND: re-derive parent block arithmetically (reference POP,
        # src/raytracing/cpu.rs:361-394); carried bmin stays valid when the
        # sectant is OOB.
        a_level = level + 1
        block = tsize * 4.0
        parent_block = block * 4.0
        parent_min = bmin - jnp.mod(bmin, parent_block[:, None])
        a_ts0 = _offset_sectant_v(
            bmin + block[:, None] / 2.0 - parent_min, parent_block
        )
        a_new_p, a_step = _dda_step_v(dirv, sf, point, bmin, block)
        a_ts = _step_sectant_v(a_ts0, a_step)
        a_tmin = bmin + a_step * block[:, None]
        a_tsize = block

        if parent_skip:
            # a_ts is the lateral target block's sectant within the CURRENT
            # parent (OOB when it leaves it); if its parent-word bit is 0
            # the neighbor is empty — ascend now instead of moving into it
            # and discovering the emptiness next iteration.
            nb_empty = _occ_bit_v(pwords[0], pwords[1], a_ts) == 0
            skip = lateral & (a_ts < OOB) & nb_empty
            lateral = lateral & (~skip)
            ascend = ascend | skip

        # --- ADVANCE: arithmetic substeps within the current block
        v_ts = tsect
        v_tmin = tmin
        v_p = point
        v_go = advance
        for _ in range(advance_substeps):
            s_new_p, s_step = _dda_step_v(dirv, sf, v_p, v_tmin, tsize)
            s_ts = _step_sectant_v(v_ts, s_step)
            s_tmin = jnp.where(
                (s_ts < OOB)[:, None], v_tmin + s_step * tsize[:, None], v_tmin
            )
            v_p = jnp.where(v_go[:, None], s_new_p, v_p)
            v_ts = jnp.where(v_go, s_ts, v_ts)
            v_tmin = jnp.where(v_go[:, None], s_tmin, v_tmin)
            stop = (v_ts >= OOB) | (_occ_bit_v(occ_lo, occ_hi, v_ts) != 0)
            v_go = v_go & (~stop)

        # --- LATERAL: same-level neighbor block via computed address (the
        # dense pyramid has no pointer tree to re-descend)
        l_bmin = bmin + a_step * block[:, None]
        l_tsect = _offset_sectant_v(a_new_p - l_bmin, block)
        l_tmin = l_bmin + _sectant_offset_v(jnp.clip(l_tsect, 0, 63)) * block[:, None]
        # leaving the world: the neighbor block starts outside [0, size)
        # (exact test — the stepped point itself can sit ON the face)
        l_out = lateral & jnp.any((l_bmin < 0.0) | (l_bmin >= size), axis=-1)
        active = active & (~l_out)
        lateral = lateral & (~l_out)

        old_tmin = tmin  # block of a DESCEND target = the old cell
        point = jnp.where(advance[:, None], v_p, point)
        point = jnp.where((ascend | lateral)[:, None], a_new_p, point)

        tsect = jnp.where(descend, d_tsect, tsect)
        tsect = jnp.where(ascend, a_ts, tsect)
        tsect = jnp.where(lateral, l_tsect, tsect)
        tsect = jnp.where(advance, v_ts, tsect)

        tmin = jnp.where(descend[:, None], d_tmin, tmin)
        tmin = jnp.where(ascend[:, None], a_tmin, tmin)
        tmin = jnp.where(lateral[:, None], l_tmin, tmin)
        tmin = jnp.where(advance[:, None], v_tmin, tmin)

        tsize = jnp.where(descend, d_tsize, tsize)
        tsize = jnp.where(ascend, a_tsize, tsize)
        level = jnp.where(descend, d_level, level)
        level = jnp.where(ascend, a_level, level)
        bmin = jnp.where(descend[:, None], old_tmin, bmin)
        bmin = jnp.where(ascend[:, None], parent_min, bmin)
        bmin = jnp.where(lateral[:, None], l_bmin, bmin)

        # exit / restart when ascending past the top
        over_top = active & (level > top_level)
        re_point = point + dirv * 0.1
        inside = jnp.all((re_point > 0.0) & (re_point < size), axis=-1)
        can_restart = over_top & inside & (restarts < max_restarts)
        restarts = restarts + over_top.astype(I32)
        point = jnp.where(over_top[:, None], re_point, point)
        active = active & ((~over_top) | can_restart)
        r_ts = _offset_sectant_v(point, jnp.full(R, top_block))
        tsect = jnp.where(can_restart, r_ts, tsect)
        tmin = jnp.where(
            can_restart[:, None],
            _sectant_offset_v(jnp.clip(r_ts, 0, 63)) * top_block,
            tmin,
        )
        tsize = jnp.where(can_restart, cell_sizes[top_level], tsize)
        level = jnp.where(can_restart, top_level, level)
        bmin = jnp.where(can_restart[:, None], jnp.zeros_like(bmin), bmin)

        # ONE fetch for rays whose block changed
        moved = descend | ascend | lateral | can_restart
        fetched = fetch_words(tree, jnp.clip(level, 0, top_level), bmin)
        occ_lo = jnp.where(moved, fetched[0], occ_lo)
        occ_hi = jnp.where(moved, fetched[1], occ_hi)
        if parent_skip:
            pwords = (jnp.where(moved, fetched[2], pwords[0]),
                      jnp.where(moved, fetched[3], pwords[1]))

        return (point, tsect, tmin, tsize, level, occ_lo, occ_hi,
                dirv, sf, octant, active, hit, hvox, hnormal, restarts, bmin,
                origin, hlev) + tuple(pwords)

    ACTIVE = 10

    def run(tree, state, iters):
        """Advance the automaton by up to ``iters`` iterations; returns
        (state, n_active) so the host round loop needs one transfer."""

        def cond(carry):
            st, i = carry
            return jnp.any(st[ACTIVE]) & (i < iters)

        def step(carry):
            st, i = carry
            return body(tree, st), i + 1

        state, _ = jax.lax.while_loop(cond, step, (state, jnp.int32(0)))
        return state, jnp.sum(state[ACTIVE])

    def resolve_color(tree, hit, hvox):
        v = jnp.clip(hvox, 0, Si - 1)
        caddr = v[:, 0] + v[:, 1] * Si + v[:, 2] * Si * Si
        cvals = tree["colors"][caddr]
        # u8 color grids use 255/254 as the empty/colorless sentinels
        colorless = 254 if cvals.dtype == jnp.uint8 else COLOR_NONE
        cidx = cvals.astype(I32)
        return jnp.where(
            hit, jnp.where(cidx >= colorless, I32(0x3FFFFFFE), cidx), EMPTY_DESC
        )

    def resolve_rgb_lod(tree, hit, hvox, hlev):
        """RGB from the level-appropriate color grid (level 0: palette via
        the dense color grid; level l>0: the per-level MIP color grid)."""
        voxel = resolve_color(tree, hit, hvox)
        has_color = hit & (voxel >= 0) & (voxel < I32(0x3FFFFFFE))
        base = tree["palette"][jnp.clip(voxel, 0, tree["palette"].shape[0] - 1), :3]
        rgb = jnp.where(has_color[:, None], base, 0.0)
        for l in range(1, n_levels + 1):
            key = f"mip_rgb_{l - 1}"
            if key not in tree:
                break
            n = max(Si // 4**l, 1)
            cv = jnp.clip(hvox // (4**l), 0, n - 1)
            addr = cv[:, 0] + cv[:, 1] * n + cv[:, 2] * n * n
            grid = tree[key]
            mip = grid[jnp.clip(addr, 0, grid.shape[0] - 1)]
            rgb = jnp.where(((hlev == l) & hit)[:, None], mip, rgb)
        return rgb

    def trace(tree, o, dirv, start_t=None):
        state = init(tree, o, dirv, start_t)
        state, _ = run(tree, state, max_iters)
        point, hit, hvox, hnormal = state[0], state[11], state[12], state[13]
        voxel = resolve_color(tree, hit, hvox)
        return hit, voxel, hvox, point, hnormal

    def trace_lod(tree, o, dirv, start_t=None):
        state = init(tree, o, dirv, start_t)
        state, _ = run(tree, state, max_iters)
        point, hit, hvox, hnormal = state[0], state[11], state[12], state[13]
        hlev = state[17]
        rgb = resolve_rgb_lod(tree, hit, hvox, hlev)
        return hit, rgb, hvox, point, hnormal

    trace.init = init
    trace.run = run
    trace.resolve_color = resolve_color
    trace.trace_lod = trace_lod
    return trace


def build_skip_rows(bg: BitGrid) -> np.ndarray:
    """u32 [n0^3, 2*n_levels] fused-hierarchy rows: for every level-0 block,
    the occupancy word pairs of ALL its ancestor blocks.

    Row gathers are flat-cost up to 32 u32 of width (PERF.md gather-width
    sweep), so one fetch can deliver the occupancy of every pyramid level
    around a position — the whole ancestor chain the stack automaton spends
    one fetch-iteration per level to discover.  A level-0 block's ancestors
    are position-independent (block b at level k is ``b0 >> 2k``), so the
    rows are a pure restructuring of the pyramid."""
    pairs = np.stack([bg.occ_lo, bg.occ_hi], axis=1)
    return skip_rows_from_pairs(pairs, skip_row_index(bg))


def skip_row_index(bg: BitGrid) -> np.ndarray:
    """int32 [n0^3, n_levels]: for every level-0 block, the flat pyramid
    index of each ancestor's word pair — the static gather map that derives
    ``skip_rows`` from ``occ_pairs`` (host- or device-side:
    ``pairs[idx].reshape(n0^3, 2L)``)."""
    Si = int(bg.size)
    n0 = max((Si + 3) // 4, 1)
    L = bg.n_levels
    dims = []
    c = Si
    for _ in range(L):
        dims.append(max((c + 3) // 4, 1))
        c = dims[-1]
    bases = [int(b) for b in bg.level_bases]
    a = np.arange(n0**3)
    ax, ay, az = a % n0, (a // n0) % n0, a // (n0 * n0)
    idx = np.zeros((n0**3, L), dtype=np.int32)
    for k in range(L):
        kx, ky, kz = ax >> (2 * k), ay >> (2 * k), az >> (2 * k)
        idx[:, k] = bases[k] + kx + ky * dims[k] + kz * dims[k] * dims[k]
    return idx


def skip_rows_from_pairs(pairs, idx):
    """Derive the fused-hierarchy rows from the occ word pairs (jittable;
    used by the streaming delta paths to refresh ``skip_rows`` on device
    after any occupancy mutation)."""
    L = idx.shape[1]
    return pairs[idx].reshape(idx.shape[0], 2 * L)


_skip_rows_from_pairs_jit = jax.jit(skip_rows_from_pairs)


def make_skip_tracer(bg: BitGrid, max_iters: int = 2048, substeps: int = 3):
    """Fused-hierarchy tracer: the stack automaton's DESCEND/ASCEND fetch
    chains collapse into ONE row fetch per move (``build_skip_rows``).

    At any position the register row holds the occupancy words of every
    pyramid level covering it, so each step (a) tests the voxel bit for a
    hit, (b) otherwise advances across the LARGEST empty cell among the
    levels still valid for the position — classic hierarchical empty-space
    skipping with no stack, no restarts, and exactly one gather per
    fetch-iteration.  Cell addressing is integer (voxel coords carried as
    int32), so there is no boundary-float fragility.

    State layout matches ``make_bitgrid_tracer`` where the compaction
    machinery cares: [0]=point, [10]=active, [11]=hit, [12]=hvox,
    [13]=hnormal.  Reference semantics: first occupied voxel along the ray
    (src/raytracing/cpu.rs get_by_ray), identical to the stack tracer.
    """
    S = float(bg.size)
    Si = int(bg.size)
    n_levels = bg.n_levels
    n0 = max((Si + 3) // 4, 1)
    top_block = float(4 ** n_levels)

    def fetch(tree, v):
        b0 = jnp.clip(jnp.right_shift(v, 2), 0, n0 - 1)
        addr = b0[:, 0] + b0[:, 1] * n0 + b0[:, 2] * n0 * n0
        rows = tree["skip_rows"][addr]  # ONE [R, 2L] row gather
        return rows, b0

    def init(tree, o, dirv, start_t=None):
        R = o.shape[0]
        size = tree["size"]
        sf = jnp.stack(
            [
                jnp.sqrt(1.0 + (dirv[:, 2] / dirv[:, 0]) ** 2 + (dirv[:, 1] / dirv[:, 0]) ** 2),
                jnp.sqrt((dirv[:, 0] / dirv[:, 1]) ** 2 + 1.0 + (dirv[:, 2] / dirv[:, 1]) ** 2),
                jnp.sqrt((dirv[:, 0] / dirv[:, 2]) ** 2 + (dirv[:, 1] / dirv[:, 2]) ** 2 + 1.0),
            ],
            axis=-1,
        )
        t_lo = (0.0 - o) / dirv
        t_hi = (size - o) / dirv
        per_min = jnp.fmin(t_lo, t_hi)
        per_max = jnp.fmax(t_lo, t_hi)
        tmin_r = jnp.fmax(jnp.fmax(per_min[:, 0], per_min[:, 1]), per_min[:, 2])
        tmax_r = jnp.fmin(jnp.fmin(per_max[:, 0], per_max[:, 1]), per_max[:, 2])
        root_hit = ~((tmax_r < 0.0) | (tmin_r > tmax_r))
        enter = jnp.maximum(tmin_r, 0.0)
        if start_t is not None:
            # see make_bitgrid_tracer.init: a start at/beyond the box exit
            # proves a miss — deactivate for the pre-round-0 compaction
            root_hit = root_hit & (start_t < tmax_r)
            enter = jnp.clip(
                jnp.maximum(enter, start_t), 0.0, jnp.maximum(tmax_r - 1e-3, 0.0)
            )
        point = o + dirv * enter[:, None]
        v = jnp.clip(jnp.floor(point).astype(I32), 0, Si - 1)
        rows, b0 = fetch(tree, v)
        zb = jnp.zeros(R, dtype=jnp.bool_)
        return (point, v, rows, dirv, sf, b0,
                o,  # origin (distance/LOD hooks)
                zb, zb, zb,  # padding: keeps the shared state indices
                root_hit,  # [10] active
                jnp.zeros(R, dtype=jnp.bool_),  # [11] hit
                jnp.zeros((R, 3), dtype=I32),  # [12] hvox
                jnp.zeros((R, 3), dtype=F32),  # [13] hnormal
                )

    def body(tree, st):
        (point, v, rows, dirv, sf, b0, origin, f7, f8, f9,
         active, hit, hvox, hnormal) = st
        R = point.shape[0]

        p, vv, act = point, v, active
        for _ in range(substeps):
            # per-level occupancy + validity of the register row at vv
            valids, occs = [], []
            for k in range(n_levels):
                cell = jnp.right_shift(vv, 2 * k)
                blk = jnp.right_shift(cell, 2)
                valid = jnp.all(blk == jnp.right_shift(b0, 2 * k), axis=-1)
                w = cell & 3
                s = w[:, 0] + w[:, 1] * 4 + w[:, 2] * 16
                bit = _occ_bit_v(rows[:, 2 * k], rows[:, 2 * k + 1], s) != 0
                valids.append(valid)
                occs.append(bit)

            found = act & valids[0] & occs[0]
            nrm = _impact_normal_v(vv.astype(F32), jnp.ones(R, F32), p)
            hit = hit | found
            hvox = jnp.where(found[:, None], vv, hvox)
            hnormal = jnp.where(found[:, None], nrm, hnormal)
            act = act & (~found)

            # largest valid EMPTY cell -> the skip level
            k_sel = jnp.full(R, -1, dtype=I32)
            for k in range(n_levels):
                k_sel = jnp.where(valids[k] & (~occs[k]), k, k_sel)
            can_adv = act & (k_sel >= 0)  # else: row stale, wait for fetch

            csz_i = jnp.left_shift(1, 2 * jnp.maximum(k_sel, 0))  # [R]
            cmin_i = (vv // csz_i[:, None]) * csz_i[:, None]
            new_p, stp = _dda_step_v(dirv, sf, p, cmin_i.astype(F32),
                                     csz_i.astype(F32))
            sti = stp.astype(I32)
            # crossing axes: exact integer cell step; others: clip into cell
            cell_new = cmin_i // csz_i[:, None] + sti
            v_cross = cell_new * csz_i[:, None] + jnp.where(
                sti > 0, 0, csz_i[:, None] - 1
            )
            v_stay = jnp.clip(
                jnp.floor(new_p).astype(I32), cmin_i, cmin_i + csz_i[:, None] - 1
            )
            v_new = jnp.where(sti != 0, v_cross, v_stay)
            out = jnp.any((v_new < 0) | (v_new >= Si), axis=-1)
            act = act & ~(can_adv & out)
            apply = can_adv & (~out)
            p = jnp.where(apply[:, None], new_p, p)
            vv = jnp.where(apply[:, None], v_new, vv)

        rows, b0 = fetch(tree, vv)  # one gather per body iteration
        return (p, vv, rows, dirv, sf, b0, origin, f7, f8, f9,
                act, hit, hvox, hnormal)

    ACTIVE = 10

    def run(tree, state, iters):
        def cond(carry):
            st, i = carry
            return jnp.any(st[ACTIVE]) & (i < iters)

        def step(carry):
            st, i = carry
            return body(tree, st), i + 1

        state, _ = jax.lax.while_loop(cond, step, (state, jnp.int32(0)))
        return state, jnp.sum(state[ACTIVE])

    def resolve_color(tree, hit, hvox):
        v = jnp.clip(hvox, 0, Si - 1)
        caddr = v[:, 0] + v[:, 1] * Si + v[:, 2] * Si * Si
        cvals = tree["colors"][caddr]
        colorless = 254 if cvals.dtype == jnp.uint8 else COLOR_NONE
        cidx = cvals.astype(I32)
        return jnp.where(
            hit, jnp.where(cidx >= colorless, I32(0x3FFFFFFE), cidx), EMPTY_DESC
        )

    def trace(tree, o, dirv, start_t=None):
        state = init(tree, o, dirv, start_t)
        state, _ = run(tree, state, max_iters)
        point, hit, hvox, hnormal = state[0], state[11], state[12], state[13]
        voxel = resolve_color(tree, hit, hvox)
        return hit, voxel, hvox, point, hnormal

    trace.init = init
    trace.run = run
    trace.resolve_color = resolve_color
    return trace


class BitGridRenderer:
    """Whole-frame renderer over the dense bitmap pyramid."""

    def __init__(
        self,
        source,
        max_iters: int = 2048,
        prepass: bool = False,
        prepass_levels: int = 2,
        lateral_step: bool = True,
        parent_skip: bool = False,
        advance_substeps: int = 4,
        auto_plan: bool = False,
        fuse_plan: bool = False,
        color_u8: bool = False,
        tracer: str = "stack",
        skip_substeps: int = 3,
    ):
        self.prepass_levels = prepass_levels
        # color_u8: store the device color grid as u8 when the palette fits
        # a byte — halves color HBM (the capacity bound for vast
        # resident/sharded scenes); bit-exact via sentinel remap
        self.color_u8 = color_u8
        # auto_plan: frames after the first replay the previous same-shaped
        # frame's compaction schedule with no mid-frame host syncs (bit-exact;
        # overflowed plans fall back to the adaptive loop).  Measured NEUTRAL
        # on the axon-tunnel TPU (benches/ab_planned.py: 717 vs 707 ms at
        # 1080p — the adaptive loop's per-round count reads overlap with
        # already-enqueued work), so off by default; useful on links where
        # a blocking host round-trip is expensive.
        self.auto_plan = auto_plan
        # fuse_plan: execute a planned frame as ONE jitted program — init,
        # round-0 compaction, every round and compaction, color resolve and
        # shading fused into a single dispatch (the plan's bucket ladder is
        # static, so the whole schedule traces).  Kills per-dispatch
        # overhead (the dominant cost in dispatch-bound tunnel sessions)
        # and leaves exactly one blocking read per frame: the straggler/
        # overflow counts.  Each distinct plan signature compiles once
        # (persistent-cached); implies the auto_plan bookkeeping.
        self.fuse_plan = fuse_plan
        if fuse_plan:
            self.auto_plan = True
        self._plans = {}
        # consecutive identical recordings per plan key: the fused paths
        # compile one program PER plan signature (minutes through the
        # remote tunnel), so they only engage once a plan has proven
        # stable — plan-churning workloads (moving cameras over changing
        # windows) stay on the non-fused planned replay instead of
        # compile-stalling every frame
        self._plan_streak = {}
        import threading as _threading

        # serializes render() against the pipeline worker's rare deferred
        # re-render (DeferredFrame.resolve); uncontended otherwise
        self._render_lock = _threading.RLock()
        # cap on DISTINCT fused programs compiled per renderer: each costs
        # minutes through the remote-compile tunnel, and a plan-churning
        # workload (flight over a changing window) can generate unbounded
        # signatures — steady workloads need only a few
        self.fuse_compile_cap = 8
        bg = source if isinstance(source, BitGrid) else build_bitgrid(source)
        self.bitgrid = bg
        # tracer="skip": the fused-hierarchy tracer (one row fetch serves
        # every pyramid level — see make_skip_tracer); "stack": the
        # reference-automaton formulation
        self.tracer_kind = tracer
        self.tree = device_bitgrid(bg, color_u8=color_u8,
                                   skip_rows=(tracer == "skip"))
        self.prepass = prepass
        self._max_iters = max_iters
        if tracer == "skip":
            self._trace = make_skip_tracer(bg, max_iters=max_iters,
                                           substeps=skip_substeps)
        else:
            self._trace = make_bitgrid_tracer(bg, max_iters=max_iters,
                                              lateral_step=lateral_step,
                                              parent_skip=parent_skip,
                                              advance_substeps=advance_substeps)
        self._trace_jit = jax.jit(self._trace)

        def _scatter(state, orig, hit, hvox, hnormal, hpoint):
            return (
                hit.at[orig].set(state[11]),
                hvox.at[orig].set(state[12]),
                hnormal.at[orig].set(state[13]),
                hpoint.at[orig].set(state[0]),
            )

        def _perm(active, bucket):
            # cumsum-based stable compaction: ~10x cheaper than argsort.
            # Actives pack to the front; unwritten tail slots default to lane
            # 0 (harmless duplicate of a finished lane).
            cur = active.shape[0]
            pos = jnp.cumsum(active.astype(I32)) - 1
            target = jnp.where(active, pos, bucket)  # OOB for inactive -> drop
            return (
                jnp.zeros(bucket, dtype=I32)
                .at[target]
                .set(jnp.arange(cur, dtype=I32), mode="drop")
            )

        def _apply_perm(state, orig, perm):
            # ONE-row-gather compaction: the state tuple is ~19 arrays, and
            # 19 separate row gathers cost ~19x one wide gather (PERF.md
            # "minimize gather OP COUNT, then width" — measured 4.5x for 2
            # vs 1 at frame scale, and the round-0 compaction at 518k rows
            # was eating most of the beam prepass's 179 ms round-1 saving).
            # Pack every column into a single [R, W] u32 matrix (f32/i32
            # bitcast, bool widened), gather survivor rows once, unpack.
            arrs = list(state) + [orig]
            cols = []
            specs = []
            for a in arrs:
                a2 = a[:, None] if a.ndim == 1 else a
                d = a.dtype
                if d == jnp.bool_:
                    u = a2.astype(jnp.uint32)
                elif d == jnp.uint32:
                    u = a2
                else:
                    u = jax.lax.bitcast_convert_type(a2, jnp.uint32)
                specs.append((d, a.ndim, u.shape[1]))
                cols.append(u)
            packed = jnp.concatenate(cols, axis=1)
            rows = packed[perm]  # the one gather
            out = []
            k = 0
            for d, nd, w in specs:
                u = rows[:, k:k + w]
                k += w
                if d == jnp.bool_:
                    a = u != 0
                elif d == jnp.uint32:
                    a = u
                else:
                    a = jax.lax.bitcast_convert_type(u, d)
                out.append(a[:, 0] if nd == 1 else a)
            return tuple(out[:-1]), out[-1]

        resolve_color = self._trace.resolve_color

        def _finish(tree, hit, hvox, hnormal, bgc):
            voxel = resolve_color(tree, hit, hvox)
            return voxel, _shade(tree, hit, voxel, hnormal, bgc)

        self._compact_fns = {
            "init": jax.jit(self._trace.init),
            "run": jax.jit(self._trace.run, static_argnums=2),
            "scatter": jax.jit(_scatter),
            "color": jax.jit(self._trace.resolve_color),
            "finish": jax.jit(_finish),
            "perm": jax.jit(_perm, static_argnums=1),
            "apply_perm": jax.jit(_apply_perm),
            "count": jax.jit(lambda st: jnp.sum(st[10].astype(I32))),
        }
        # unjitted building blocks for the fused whole-plan program
        self._raw_fns = {"scatter": _scatter, "perm": _perm,
                         "apply_perm": _apply_perm, "finish": _finish}
        self._fused_fns = {}
        self._frame_validated = None  # last validated (plan, tree, pose)
        # delta-frame streaming state (render_delta_many): the previous
        # frame kept BOTH on device (the compare operand inside the scanned
        # program) and on host (the reconstruction base) — unchanged frames
        # then cost an 8-byte digest of host traffic instead of the full
        # [h*w*3] u8 payload
        self._delta_state = None  # (token, prev_dev [R,3] u8, prev_host)
        self._delta_validated = None  # token whose reconstruction verified
        self._shade_only = jax.jit(
            lambda tree, hit, voxel, normal, bgc: _shade(tree, hit, voxel, normal, bgc)
        )
        # device-side 8-bit quantization: the reference renders into an rgba8
        # texture (src/raytracing/bevy/view.rs output texture); emitting u8
        # on device also cuts the host transfer 4x vs f32 — through the
        # remote-TPU tunnel that transfer is a large share of frame time.
        self._to_u8 = jax.jit(
            lambda rgb: jnp.clip(jnp.round(rgb * 255.0), 0.0, 255.0).astype(jnp.uint8)
        )

        def _depth_start(hit, hpoint, o, h2, w2):
            depth = jnp.where(
                hit, jnp.linalg.norm(hpoint - o, axis=-1), 1e8
            ).reshape(h2, w2)
            dpad = jnp.pad(depth, ((0, 1), (0, 1)), mode="edge")
            dmin = jnp.minimum(
                jnp.minimum(dpad[:-1, :-1], dpad[1:, :-1]),
                jnp.minimum(dpad[:-1, 1:], dpad[1:, 1:]),
            )
            start = jnp.repeat(jnp.repeat(dmin, 2, axis=0), 2, axis=1)
            return jnp.maximum(start - 2.0, 0.0)

        self._depth_start = jax.jit(_depth_start, static_argnums=(3, 4))

        trace = self._trace

        @jax.jit
        def shade_batch(tree, origins, dirs, bg_color):
            hit, voxel, _hv, _hp, hnormal = trace(tree, origins, dirs)
            return _shade(tree, hit, voxel, hnormal, bg_color)

        self._shade_batch = shade_batch
        self._prepass_cache = {}
        self._lod_cache = {}
        self.last_stats = None  # filled by trace_compacted (profiling hook)
        # first-round length when a splat-prepass start is supplied; sweeps
        # (benches/ab_splat.py) found shorter first rounds LOSE — sky rays
        # have no splat and still need the full march, so cutting the round
        # just adds dispatches
        self.splat_first_iters = 14
        # beam prepass (see the Beam prepass section below): per-tile
        # conservative starts + dead sky tiles; first-round length when a
        # beam start is supplied (None = the default round_iters)
        self.beam_tile = 8
        self.beam_first_iters = None
        self._beam_cache = {}
        self._beam_fns = {}

    def _splat_points(self):
        """[N,3] f32 device array of occupied voxel centers (surface voxels
        only — interior voxels can never be a first hit)."""
        if getattr(self, "_splat_pts", None) is None:
            S = int(self.bitgrid.size)
            occ = (np.asarray(self.bitgrid.colors) != COLOR_EMPTY).reshape(S, S, S)
            # occ is [x, y, z] (colors are x-fastest flat)... colors flat
            # index is x + y*S + z*S^2 -> reshape gives [z, y, x]
            occ = occ.transpose(2, 1, 0)  # -> [x, y, z]
            interior = np.ones_like(occ)
            for ax in (0, 1, 2):
                lo = np.roll(occ, 1, axis=ax)
                hi = np.roll(occ, -1, axis=ax)
                # world-boundary voxels count as surface
                sl = [slice(None)] * 3
                sl[ax] = 0
                lo[tuple(sl)] = False
                sl[ax] = -1
                hi[tuple(sl)] = False
                interior &= lo & hi
            surface = occ & ~interior
            xs, ys, zs = np.nonzero(surface)
            pts = np.stack([xs, ys, zs], axis=1).astype(np.float32) + 0.5
            self._splat_pts = jnp.asarray(pts)
        return self._splat_pts

    def _splat_depth_fn(self, h2, w2):
        """Jitted splat prepass: project voxel centers, scatter-min a
        [h2, w2] distance buffer, expand to per-ray start distances.

        A ~milliseconds dense pass replacing the reference's half-res ray
        prepass (viewport_render.wgsl:702-710): the earlier trace-based
        prepass lost because it cost a full extra trace session (PERF.md);
        splatting is pure VPU math + one scatter."""
        key = (h2, w2)
        cache = getattr(self, "_splat_cache", None)
        if cache is None:
            cache = self._splat_cache = {}
        if key in cache:
            return cache[key]

        def f(pts, origin, right, up, forward, scale, margin):
            rel = pts - origin[None, :]

            # explicit elementwise dots: an [N,3]@[3] matvec hits the MXU at
            # TPU default (bfloat16) precision, which skews texel coords by
            # whole pixels and breaks the conservative-start guarantee
            def dot3(m, v):
                return m[:, 0] * v[0] + m[:, 1] * v[1] + m[:, 2] * v[2]

            z = dot3(rel, forward)
            x = dot3(rel, right)
            y = dot3(rel, up)
            zs = jnp.maximum(z, 1e-6)
            u = (x / (zs * scale[0]) + 1.0) * 0.5 * w2
            v = (1.0 - y / (zs * scale[1])) * 0.5 * h2
            d = jnp.sqrt(jnp.sum(rel * rel, axis=-1))
            # projected voxel footprint in half-res texels (f_tex = one voxel
            # edge at view depth z).  Coverage rule: a voxel's center can
            # splat up to 0.866*f_tex (half the projected cube diagonal) away
            # from a texel the voxel covers, plus <1 texel of index rounding;
            # the 5x5 neighborhood min reaches +-2 texels, so splats are only
            # reliable for 0.866*f + 1 <= 2, i.e. f <= ~1.15 per texel of
            # slack -> cutoff 2.0 covers it with rounding headroom
            sx = w2 / 2.0
            sy = h2 / 2.0
            sref = jnp.maximum(sx / scale[0], sy / scale[1])
            f_tex = sref / jnp.maximum(z, 1e-6)

            ui = jnp.clip(u, 0.0, w2 - 1.0).astype(I32)
            vi = jnp.clip(v, 0.0, h2 - 1.0).astype(I32)
            reliable = (
                (z > 0.0) & (f_tex <= 2.0)
                & (u >= -3.0) & (u < w2 + 3.0) & (v >= -3.0) & (v < h2 + 3.0)
            )
            idx = jnp.where(reliable, vi * w2 + ui, h2 * w2)  # OOB -> dropped
            depth = (
                jnp.full(h2 * w2, 1e8, dtype=F32)
                .at[idx]
                .min(d, mode="drop")
                .reshape(h2, w2)
            )
            # conservative expand: min over the 5x5 neighborhood, minus a
            # margin, doubled up to full resolution
            dpad = jnp.pad(depth, 2, mode="edge")
            dmin = depth
            for dy in range(5):
                for dx in range(5):
                    dmin = jnp.minimum(dmin, dpad[dy:dy + h2, dx:dx + w2])
            # texels with no splat information march from the world entry —
            # absence of splats must not be read as absence of geometry
            dmin = jnp.where(dmin < 1e7, dmin, 0.0)

            # voxels spanning MORE than the reliable cutoff conservatively
            # force a full march over their whole footprint: a blocker grid
            # of cell size c texels + 3x3 CELL dilation blocks every texel
            # within c texels of the voxel center's cell, which covers the
            # footprint when 0.866*f + 1 <= c
            for c, f_lo, f_hi in ((4, 2.0, 3.0), (16, 3.0, 16.0), (64, 16.0, 64.0)):
                gw, gh = (w2 + c - 1) // c + 4, (h2 + c - 1) // c + 4
                gu = jnp.floor(u / c).astype(I32) + 2
                gv = jnp.floor(v / c).astype(I32) + 2
                near = (z > 0.0) & (f_tex > f_lo) & (f_tex <= f_hi)
                ok = near & (gu >= 0) & (gu < gw) & (gv >= 0) & (gv < gh)
                gi = jnp.where(ok, gv * gw + gu, gw * gh)
                g = (
                    jnp.zeros(gw * gh, dtype=F32)
                    .at[gi]
                    .max(1.0, mode="drop")
                    .reshape(gh, gw)
                )
                gpad = jnp.pad(g, 1)
                gmax = g
                for dy in (0, 1, 2):
                    for dx in (0, 1, 2):
                        gmax = jnp.maximum(gmax, gpad[dy:dy + gh, dx:dx + gw])
                up_g = jnp.repeat(jnp.repeat(gmax[2:, 2:], c, 0), c, 1)[:h2, :w2]
                dmin = jnp.where(up_g > 0.0, 0.0, dmin)
            # anything closer still (footprint > 64 texels, or any voxel
            # hugging the eye regardless of view depth) blocks everything
            global_block = jnp.any(
                ((z > 0.0) & (f_tex > 64.0)) | (d < jnp.maximum(sref / 64.0, 3.0))
            )
            dmin = jnp.where(global_block, 0.0, dmin)

            start = jnp.repeat(jnp.repeat(dmin, 2, axis=0), 2, axis=1)
            return jnp.maximum(start - margin, 0.0)

        cache[key] = jax.jit(f)
        return cache[key]

    def splat_start(self, camera, margin: float = 3.0):
        """Per-ray start distances [h*w] from the voxel-splat depth prepass."""
        w, h = camera.resolution
        assert h % 2 == 0 and w % 2 == 0
        forward, right, up = camera.basis()
        tan_half = float(np.tan(np.radians(camera.fov_y_deg) / 2.0))
        aspect = w / h
        fn = self._splat_depth_fn(h // 2, w // 2)
        start = fn(
            self._splat_points(),
            jnp.asarray(np.asarray(camera.origin, dtype=np.float32)),
            jnp.asarray(right), jnp.asarray(up), jnp.asarray(forward),
            jnp.asarray([tan_half * aspect, tan_half], dtype=np.float32),
            jnp.asarray(margin, dtype=F32),
        )
        return start.reshape(-1)

    # ------------------------------------------------------------------
    # Beam prepass: one conservative ray per pixel tile over a DILATED
    # coarse occupancy grid.  Every full-res ray in the tile starts at the
    # beam's first dilated-cell entry (a provable lower bound on the tile's
    # first hit), and tiles whose beam exits cleanly are dead on arrival —
    # sky rays finish in ~2 iterations instead of marching the whole world.
    # Conservativeness: all tile rays stay within distance rho*theta of the
    # center ray (theta = tile half-diagonal angle; gnomonic projection is
    # distance-decreasing), so while rho*theta <= one level-L cell, any
    # voxel hit by a tile ray makes the center ray pass through a
    # 3^3-dilated occupied cell no farther along.  L is chosen per camera
    # so the bound holds out to the farthest world corner; beams that can't
    # finish (iteration cap / restart cap) fall back to start=0.  Results
    # preserve the hit mask exactly; hit voxels and shading can diverge on
    # a ppm scale at high resolutions (measured at 1080p: 5 / 2.07M rays
    # resolve to an ADJACENT voxel on TPU, 7 shading-only diffs on CPU): a
    # ray re-seeded at start_t follows a different f32 DDA path, and an
    # edge-grazing ray's corner crossing — or its impact normal's dominant
    # axis — flips in the float low bits (the reference marks the same
    # edge cases flaky, raytracing/tests.rs:87; tests/test_bitgrid.py
    # holds exactness at test scale).
    # (The reference's closest analog is the half-res depth prepass,
    # viewport_render.wgsl:184-203,711-726 — which is NOT conservative and
    # relies on a reliability cutoff; the beam grid gives exactness and
    # kills sky tiles outright.)
    # ------------------------------------------------------------------

    _BEAM_ITERS = 128
    _BEAM_RESTARTS = 4  # shared with _beam_fn's restart-cap classification

    def _beam_level(self, camera, tile):
        """Smallest pyramid level whose cell size keeps the beam bound valid
        for this camera; None when no level qualifies."""
        w, h = camera.resolution
        S = int(self.bitgrid.size)
        tan_half = float(np.tan(np.radians(camera.fov_y_deg) / 2.0))
        tanx = tan_half * w / h
        theta = tile * float(np.hypot(tanx / w, tan_half / h))
        o = np.asarray(camera.origin, dtype=np.float64)
        corners = np.array(
            [[x, y, z] for x in (0.0, S) for y in (0.0, S) for z in (0.0, S)]
        )
        rho_max = float(np.max(np.linalg.norm(corners - o, axis=1)))
        need = rho_max * theta / 0.9
        L = 1
        while 4**L < need:
            L += 1
        if S % (4**L) != 0 or S // (4**L) < 4:
            return None
        return L

    def invalidate_beam(self):
        """Drop the beam prepass's dilated-occupancy device grids after the
        scene content changed (streaming window page-ins / rolls / edits).
        The JITTED beam programs stay valid — they close only over the
        grid's SHAPE constants and take the grid as an argument — so an
        invalidation costs one small host reduce + upload at next use,
        never a recompile.  Content changes also void the validated-pose
        token (the fused frame's skip-the-counts-read fast path): the
        streaming layer mutates the tree dict's ARRAYS in place, so the
        token's id(self.tree) would not catch it."""
        self._beam_cache.clear()
        self._frame_validated = None
        # NOTE: the delta stream's baseline (_delta_state) deliberately
        # SURVIVES content changes — it is only a diff base, and its one
        # invariant (device prev == host prev, byte for byte) is
        # content-independent.  The delta program renders the new frame
        # from the CURRENT tree and diffs it against the baseline on
        # device, so an edit costs exactly its changed pixels (fetched as
        # a row band); an edit invisible from the pose costs nothing.

    def _beam_setup(self, L):
        """(device tree, tracer) over the 3^3-dilated level-L cell grid with
        a 1-cell border ring (world position x maps to beam coord x/cell+1)."""
        if L not in self._beam_cache:
            bg = self.bitgrid
            S = int(bg.size)
            c = 4**L
            m = S // c
            # occupancy from the level-0 PYRAMID words (authoritative for
            # traversal), not colors — the two can diverge (e.g. the soft
            # path's dilated candidate grids occupy colorless voxels)
            m0 = S // 4
            b0 = int(bg.level_bases[0])
            n0 = m0 * m0 * m0
            words = (
                np.asarray(bg.occ_lo[b0 : b0 + n0])
                | np.asarray(bg.occ_hi[b0 : b0 + n0])
            ) != 0
            blocks = words.reshape(m0, m0, m0).transpose(2, 1, 0)  # [x,y,z]
            f = c // 4  # level-0 blocks per beam cell per axis (L>=1)
            cells = blocks.reshape(m, f, m, f, m, f).any(axis=(1, 3, 5))
            g = np.zeros((m + 4, m + 4, m + 4), dtype=bool)
            g[2 : m + 2, 2 : m + 2, 2 : m + 2] = cells
            dil = np.zeros((m + 2, m + 2, m + 2), dtype=bool)
            for dx in range(3):
                for dy in range(3):
                    for dz in range(3):
                        dil |= g[dx : dx + m + 2, dy : dy + m + 2, dz : dz + m + 2]
            bgb = bitgrid_from_occupancy(dil)
            self._beam_cache[L] = (
                device_bitgrid(bgb),
                make_bitgrid_tracer(bgb, max_iters=self._BEAM_ITERS,
                                    max_restarts=self._BEAM_RESTARTS),
            )
        return self._beam_cache[L]

    def _beam_body(self, L, th, tw, tile):
        """TRACEABLE beam prepass: ``body(tree_b, o, d) -> start[-1]`` over
        the level-L dilated cell grid.  Composable into the fused frame
        program (_fused_plan_fn) so a beam frame stays ONE dispatch — the
        reference's two-pass dispatch (pipeline/mod.rs:116-150) collapsed
        into a single program."""
        _, tr = self._beam_setup(L)
        iters = self._BEAM_ITERS
        max_restarts = self._BEAM_RESTARTS
        cell = float(4**L)
        margin = 1.5 * cell

        def body(tree_b, o, d):
            o_b = o / cell + 1.0  # world -> beam-grid coords (1-cell ring)
            st = tr.init(tree_b, o_b, d)
            st, _ = tr.run(tree_b, st, iters)
            hit, hpoint, active, restarts = st[11], st[0], st[10], st[14]
            t = jnp.linalg.norm(hpoint - o_b, axis=-1) * cell
            # still-active (iteration cap) or restart-capped beams proved
            # nothing: their tiles march from the world entry
            unknown = active | (restarts > max_restarts)
            s = jnp.where(
                hit,
                jnp.maximum(t - margin, 0.0),
                jnp.where(unknown, 0.0, F32(1e8)),
            )
            s = jnp.repeat(jnp.repeat(s.reshape(th, tw), tile, 0), tile, 1)
            return s.reshape(-1)

        return body

    def _beam_fn(self, L, th, tw, tile):
        key = (L, th, tw, tile)
        if key not in self._beam_fns:
            self._beam_fns[key] = jax.jit(self._beam_body(L, th, tw, tile))
        return self._beam_fns[key]

    def _beam_spec(self, camera, tile: int | None = None,
                   with_rays: bool = True):
        """Everything a frame needs to run the beam prepass — either as its
        own dispatch (:meth:`beam_start`) or traced into the fused frame
        program.  None when the camera/scene geometry can't satisfy the
        conservative bound.  ``with_rays=False`` skips generating the beam
        rays (a device dispatch) — the whole-frame fused program derives
        them in-program from the camera params."""
        from voxelhex_tpu.render.camera import Camera, device_rays

        tile = tile or self.beam_tile
        w, h = camera.resolution
        if w % tile or h % tile:
            return None
        L = self._beam_level(camera, tile)
        if L is None:
            return None
        tree_b, _ = self._beam_setup(L)
        spec = {
            "key": (L, h // tile, w // tile, tile),
            "tree_b": tree_b,
        }
        if with_rays:
            cam_b = Camera(
                origin=camera.origin,
                target=camera.target,
                up=camera.up,
                fov_y_deg=camera.fov_y_deg,
                resolution=(w // tile, h // tile),
            )
            spec["o_b"], spec["d_b"] = device_rays(cam_b)
        return spec

    def beam_start(self, camera, tile: int | None = None):
        """Per-ray conservative start distances [h*w] from the beam prepass,
        or None when the camera/scene geometry can't satisfy the bound."""
        spec = self._beam_spec(camera, tile)
        if spec is None:
            return None
        fn = self._beam_fn(*spec["key"])
        return fn(spec["tree_b"], spec["o_b"], spec["d_b"])

    def _prepass_fn(self, h, w, levels):
        """Jitted multi-level renderer: trace at 1/2**levels resolution, then
        successively double, each level starting at the min depth of its 2x2
        coarse neighborhood (the reference's half-res prepass generalized,
        reference: viewport_render.wgsl:702-726)."""
        key = (h, w, levels)
        if key in self._prepass_cache:
            return self._prepass_cache[key]
        trace = self._trace

        def depth_to_start(depth):
            dpad = jnp.pad(depth, ((0, 1), (0, 1)), mode="edge")
            dmin = jnp.minimum(
                jnp.minimum(dpad[:-1, :-1], dpad[1:, :-1]),
                jnp.minimum(dpad[:-1, 1:], dpad[1:, 1:]),
            )
            start = jnp.repeat(jnp.repeat(dmin, 2, axis=0), 2, axis=1)
            return jnp.maximum(start - 2.0, 0.0)

        shapes = [(h // 2**f_, w // 2**f_) for f_ in range(levels, 0, -1)]

        @jax.jit
        def f(tree, level_rays, bg_color):
            # level_rays: coarsest-first [(o, d), ...]; last is full res
            start = None
            for i, (lo, ld) in enumerate(level_rays):
                st = None if start is None else start.reshape(-1)
                hit, voxel, _hv, p_point, hnormal = trace(tree, lo, ld, start_t=st)
                if i == levels:
                    return _shade(tree, hit, voxel, hnormal, bg_color)
                depth = jnp.where(
                    hit, jnp.linalg.norm(p_point - lo, axis=-1), 1e8
                ).reshape(shapes[i])
                start = depth_to_start(depth)
            raise AssertionError("unreachable")

        self._prepass_cache[key] = f
        return f

    def trace(self, origins, directions):
        o = jnp.asarray(origins, dtype=F32).reshape(-1, 3)
        dv = jnp.asarray(directions, dtype=F32).reshape(-1, 3)
        return self._trace_jit(self.tree, o, dv)

    @staticmethod
    def resolve_entries(host_tree, hit, hvox):
        """Full BoxTreeEntry (color AND user data) per hit ray, resolved
        through the host tree — the device path carries only render data,
        like the reference GPU mirror (src/raytracing/bevy/types.rs), while
        queries needing user data go through the authoritative tree."""
        hit = np.asarray(hit)
        hvox = np.asarray(hvox)
        out = []
        for h, v in zip(hit, hvox):
            out.append(host_tree.get(tuple(int(c) for c in v)) if h else None)
        return out

    def render_lod(self, camera, lod_scale: float, bg=(0.0, 0.0, 0.0)):
        """Render with distance-based LOD: rays stop descending once a cell
        subtends ~``1/lod_scale`` of its distance and shade from per-level
        MIP colors (mixed-resolution rendering; the render-time analog of
        the reference's MIP-brick probes)."""
        if self.bitgrid.mip_rgb is None:
            build_mip_colors(self.bitgrid)
            self.tree = device_bitgrid(self.bitgrid, color_u8=self.color_u8)
        key = float(lod_scale)
        if key not in self._lod_cache:
            tracer = make_bitgrid_tracer(
                self.bitgrid, max_iters=self._max_iters, lod_scale=key
            )

            @jax.jit
            def shade_lod(tree, origins, dirs, bgc):
                hit, rgb, _hv, _hp, hnormal = tracer.trace_lod(tree, origins, dirs)
                light = jnp.asarray([-0.5, 0.5, -0.5], dtype=F32)
                lambert = jnp.sum(hnormal * light[None, :], axis=-1) / 2.0 + 0.5
                lit = rgb * lambert[:, None]
                return jnp.where(hit[:, None], lit, jnp.broadcast_to(bgc, lit.shape))

            self._lod_cache[key] = shade_lod
        from voxelhex_tpu.render.camera import device_rays

        w, h = camera.resolution
        o_d, d_d = device_rays(camera)
        rgb = self._lod_cache[key](self.tree, o_d, d_d, jnp.asarray(bg, dtype=F32))
        return np.asarray(rgb).reshape(h, w, 3)

    def _frame_body(self, R, preb, entries, has_start, u8=False):
        """TRACEABLE whole-planned-frame body ``build(tree, o, dv, st, bgc)
        -> (hit, voxel, hvox, hpoint, hnormal, rgb, counts)`` — shared by
        the one-dispatch fused frame (:meth:`_fused_plan_fn`) and the
        K-frame batched program (:meth:`_fused_batch_fn`).

        The per-ray RESULT lives in ONE packed [R, 14] u32 accumulator
        (hit, voxel, hvox*3, hnormal*3, hpoint*3, rgb*3): each compaction
        writes its rows back with a single wide scatter instead of 4, and
        color resolve + shading happen ON THE COMPACTED DOMAIN as rays
        retire (~4x fewer rows on the bench scene) instead of a full-width
        pass at the end — the full-frame finish measured ~90 ms of the
        fused frame.  Identical math per ray, so results stay bit-exact."""
        trace = self._trace
        raw = self._raw_fns
        resolve_color = trace.resolve_color

        def build(tree, o, dv, st, bgc):
            state = trace.init(tree, o, dv, st if has_start else None)
            counts = []
            orig = None
            acc = None

            def pack_rows(state, shade):
                hit, hvox, hnormal, hpoint = (
                    state[11], state[12], state[13], state[0]
                )
                if shade:
                    voxel = resolve_color(tree, hit, hvox)
                    rgb = _shade(tree, hit, voxel, hnormal, bgc)
                else:
                    # pre-round-0 drop: nothing has hit yet — every
                    # retired row is a miss (voxel=EMPTY, rgb=bg later)
                    voxel = jnp.full(hit.shape, EMPTY_DESC, dtype=I32)
                    rgb = jnp.zeros_like(hnormal)
                u32 = lambda a: jax.lax.bitcast_convert_type(a, jnp.uint32)
                return jnp.concatenate(
                    [hit[:, None].astype(jnp.uint32), u32(voxel[:, None]),
                     u32(hvox), u32(hnormal), u32(hpoint), u32(rgb)],
                    axis=1,
                )

            def retire(acc, orig, state, cur, shade=True):
                rows = pack_rows(state, shade)
                if orig is None:
                    return rows, jnp.arange(cur, dtype=I32)
                return acc.at[orig].set(rows), orig

            if preb is not None:
                counts.append(jnp.sum(state[10].astype(I32)))
                acc, orig = retire(acc, orig, state, R, shade=False)
                p = raw["perm"](state[10], preb)
                state, orig = raw["apply_perm"](state, orig, p)
            for iters, bucket in entries:
                state, n = trace.run(tree, state, iters)
                counts.append(n.astype(I32))
                cur = state[0].shape[0]
                if bucket is not None and bucket < cur:
                    acc, orig = retire(acc, orig, state, cur)
                    p = raw["perm"](state[10], bucket)
                    state, orig = raw["apply_perm"](state, orig, p)
            acc, orig = retire(acc, orig, state, state[0].shape[0])
            i32 = lambda a: jax.lax.bitcast_convert_type(a, I32)
            f32 = lambda a: jax.lax.bitcast_convert_type(a, F32)
            hit = acc[:, 0] != 0
            voxel = i32(acc[:, 1])
            hvox = i32(acc[:, 2:5])
            hnormal = f32(acc[:, 5:8])
            hpoint = f32(acc[:, 8:11])
            rgb = jnp.where(
                hit[:, None], f32(acc[:, 11:14]),
                jnp.broadcast_to(bgc, (acc.shape[0], 3)),
            )
            if u8:
                rgb = jnp.clip(jnp.round(rgb * 255.0), 0.0, 255.0).astype(
                    jnp.uint8
                )
            return hit, voxel, hvox, hpoint, hnormal, rgb, jnp.stack(counts)

        return build

    def _fused_plan_fn(self, R, preb, entries, has_start, beam_key=None,
                       cam=None, u8=False):
        """One jitted program executing an entire planned frame: init,
        optional round-0 compaction to ``preb``, every (iters, bucket)
        round of ``entries``, the final scatter, color resolve and shading.
        Returns (hit, voxel, hvox, hpoint, hnormal, rgb, counts) where
        ``counts`` = [pre_alive?] + per-round straggler counts — the
        frame's ONE blocking read, used for overflow detection.

        ``beam_key``: when set, the BEAM PREPASS is traced into the same
        program (the fused fn then takes the beam tree + beam rays and
        computes the conservative starts itself) — a beam frame costs one
        dispatch total, vs the separate ``beam_start`` dispatch that loses
        in dispatch-bound tunnel sessions (PERF.md "Beam prepass").

        ``cam``: a (w, h) resolution — RAY GENERATION is traced into the
        program too (the fn takes ~60 B of camera params instead of ray
        arrays), and with ``beam_key`` the beam rays derive from the same
        params at w//tile x h//tile.  With ``u8`` the output quantizes on
        device inside the same program.  Together these make a steady-state
        frame exactly ONE dispatch: raygen, beam, init, round-0 compaction,
        rounds, compactions, shade, u8."""
        key = (R, preb, entries, has_start, beam_key, cam, u8)
        fn = self._fused_fns.get(key)
        if fn is not None:
            return fn
        beam_body = self._beam_body(*beam_key) if beam_key else None
        build = self._frame_body(R, preb, entries, has_start, u8=u8)

        if cam is not None:
            from voxelhex_tpu.render.camera import raygen_body

            w, h = cam
            gen_main = raygen_body(w, h)
            if beam_key is not None:
                tile = beam_key[3]
                gen_beam = raygen_body(w // tile, h // tile)

                def fn_cam(tree, tree_b, origin, right, up, forward, scale,
                           bgc):
                    o, dv = gen_main(origin, right, up, forward, scale)
                    o_b, d_b = gen_beam(origin, right, up, forward, scale)
                    return build(tree, o, dv, beam_body(tree_b, o_b, d_b),
                                 bgc)

                fn = jax.jit(fn_cam)
            else:

                def fn_cam(tree, origin, right, up, forward, scale, bgc):
                    o, dv = gen_main(origin, right, up, forward, scale)
                    return build(tree, o, dv, None, bgc)

                fn = jax.jit(fn_cam)
        elif beam_key is not None:
            fn = jax.jit(
                lambda tree, tree_b, o, dv, o_b, d_b, bgc: build(
                    tree, o, dv, beam_body(tree_b, o_b, d_b), bgc
                )
            )
        elif has_start:
            fn = jax.jit(build)
        else:
            fn = jax.jit(
                lambda tree, o, dv, bgc: build(tree, o, dv, None, bgc)
            )
        self._fused_fns[key] = fn
        return fn

    class DeferredFrame:
        """A fused frame whose plan-validity check (the batched counts
        read — one tunnel round-trip) is DEFERRED off the render critical
        path: the caller's fetch worker calls :meth:`resolve` before
        consuming the pixels.  By then the counts have usually landed
        (their transfer overlapped the next frame's device execution), so
        the per-frame RTT disappears; on the rare overflow the frame
        re-renders through the standard path under the renderer lock, so
        DELIVERED frames are always exact."""

        def __init__(self, renderer, rgb, counts, plan_key, preb, entries,
                     R, camera, bg, beam_prepass, out_u8):
            self.renderer = renderer
            self.rgb = rgb
            self._args = (counts, plan_key, preb, entries, R, camera, bg,
                          beam_prepass, out_u8)

        def resolve(self, fetch=False):
            """Validate; returns the frame (device array, or fetched
            ndarray with ``fetch=True`` — counts and pixels then move in
            ONE host transfer, so validation costs no extra round-trip),
            re-rendered if the plan overflowed."""
            (counts, plan_key, preb, entries, R, camera, bg, beam_prepass,
             out_u8) = self._args
            r = self.renderer
            with r._render_lock:
                rgb_h = None
                if fetch:
                    counts_h, rgb_h = jax.device_get((counts, self.rgb))
                else:
                    counts_h = np.asarray(counts)
                bad, rounds, pre, _total = r._counts_verdict(
                    counts_h, preb, entries, R
                )
                w, h = camera.resolution
                if not bad:
                    r._record_plan(plan_key, plan_from_rounds(rounds, pre=pre))
                    out = rgb_h if fetch else self.rgb
                    return out.reshape(h, w, 3)
                r._plans.pop(plan_key, None)
                out = r.render(camera, bg=bg, out_u8=out_u8,
                               out_device=True, beam_prepass=beam_prepass)
                return np.asarray(out) if fetch else out

    @staticmethod
    def _plan_sig(plan):
        if plan is None:
            return None
        if isinstance(plan, dict):
            return (tuple(plan.get("rounds") or ()), plan.get("pre"),
                    plan.get("complete", True))
        return (tuple(plan), None, True)

    def _record_plan(self, plan_key, plan):
        """Store a plan and track how many consecutive frames recorded the
        IDENTICAL one (the fused paths' stability gate)."""
        if self._plan_sig(self._plans.get(plan_key)) == self._plan_sig(plan):
            self._plan_streak[plan_key] = (
                self._plan_streak.get(plan_key, 0) + 1
            )
        else:
            self._plan_streak[plan_key] = 0
        self._plans[plan_key] = plan

    def _counts_verdict(self, counts_h, preb, entries, R):
        """Shared overflow/stat bookkeeping for fused frames: returns
        (bad, rounds, pre, total_iters) from the batched counts read.
        ``bad`` = a compaction bucket overflowed (rays dropped) or the last
        round left live stragglers the static program cannot extend."""
        k = 0
        pre = None
        overflow = False
        if preb is not None:
            n0 = int(counts_h[0])
            k = 1
            pre = {"n_alive": n0, "bucket": preb, "R0": R, "planned": True}
            if n0 > preb:
                overflow = True
        cur = preb if preb is not None else R
        rounds = []
        total_iters = 0
        for i, (iters, bucket) in enumerate(entries):
            n = int(counts_h[k + i])
            rounds.append({"bucket": int(cur), "iters": int(iters),
                           "n_active": n, "seconds": 0.0, "planned": True})
            total_iters += iters
            if bucket is not None and n > bucket:
                overflow = True
            if bucket is not None and bucket < cur:
                cur = bucket
        bad = overflow or int(counts_h[-1]) != 0
        return bad, rounds, pre, total_iters

    def _try_render_fused(self, camera, bgc, beam_prepass, out_u8,
                          bg=None, defer=False):
        """Steady-state WHOLE-FRAME-ONE-DISPATCH path: when a complete plan
        is already recorded for this frame shape, run raygen, beam
        prepass, init, round-0 compaction, every round, the compactions,
        shading and u8 quantization as ONE jitted program whose inputs are
        ~60 bytes of camera parameters.  Removes the per-frame raygen and
        u8 dispatches the tunnel charges for (CLAUDE.md dispatch-bound
        sessions).  Returns the [h*w, 3] device frame, or None when no
        complete plan exists or it overflowed — the caller then takes the
        standard path, which records a fresh plan."""
        if not self.fuse_plan:
            return None
        w, h = camera.resolution
        R = w * h
        spec = (self._beam_spec(camera, with_rays=False)
                if beam_prepass else None)
        has_start = spec is not None
        first_iters = self.beam_first_iters if has_start else None
        plan_key = (R, has_start, 14, first_iters)
        plan = self._plans.get(plan_key)
        if plan is not None and not isinstance(plan, dict):
            plan = {"pre": None, "rounds": plan}
        if plan is None or not plan.get("complete", True):
            return None
        plan_rounds = plan.get("rounds")
        if not plan_rounds:
            return None
        import time as _time

        from voxelhex_tpu.render.camera import camera_params

        t_start = _time.time()
        entries = tuple(
            (int(i), (int(b) if b is not None else None))
            for i, b in plan_rounds
        )
        preb = (int(plan["pre"])
                if (plan.get("pre") and has_start) else None)
        beam_key = spec["key"] if spec is not None else None
        fkey = (R, preb, entries, has_start, beam_key, (w, h), bool(out_u8))
        if fkey not in self._fused_fns and (
                self._plan_streak.get(plan_key, 0) < 1
                or len(self._fused_fns) >= self.fuse_compile_cap):
            return None  # plan not stable yet (or compile budget spent)
        fn = self._fused_plan_fn(
            R, preb, entries, has_start,
            beam_key=beam_key,
            cam=(w, h), u8=bool(out_u8),
        )
        params = camera_params(camera)
        # validate-once-per-pose (the train_step_fused policy applied to
        # frames): the fused program is deterministic in (tree, camera),
        # so once THIS pose's counts validated against THIS plan on THIS
        # tree, re-rendering the same pose reproduces them exactly — the
        # frame returns with NO blocking read at all, and repeated-pose
        # workloads (serving an idle viewer, param-sweep re-renders,
        # bench batches) chain on the device like training steps do.
        token = (
            fkey, id(self.tree),
            tuple(np.asarray(camera.origin, dtype=np.float32)),
            tuple(np.asarray(camera.target, dtype=np.float32)),
            tuple(np.asarray(camera.up, dtype=np.float32)),
            float(camera.fov_y_deg), tuple(bg) if bg is not None else None,
        )
        if spec is not None:
            out = fn(self.tree, spec["tree_b"], *params, bgc)
        else:
            out = fn(self.tree, *params, bgc)
        rgb, counts = out[5], out[6]
        if not defer and token == self._frame_validated:
            self.last_stats = {
                "rays": int(R), "planned": True, "fused": True,
                "frame_fused": True, "beam_fused": spec is not None,
                "pose_validated": True,
                "trace_seconds": round(_time.time() - t_start, 4),
            }
            return rgb  # no blocking read: counts known from validation
        if defer:
            # counts validation moves to the consumer's fetch worker
            # (DeferredFrame.resolve) — no blocking read on this thread
            self.last_stats = {
                "rays": int(R), "planned": True, "fused": True,
                "frame_fused": True, "beam_fused": spec is not None,
                "deferred": True,
                "trace_seconds": round(_time.time() - t_start, 4),
            }
            return self.DeferredFrame(
                self, rgb, counts, plan_key, preb, entries, R, camera, bg,
                beam_prepass, out_u8,
            )
        counts_h = np.asarray(counts)  # the frame's ONE blocking read
        bad, rounds, pre, total_iters = self._counts_verdict(
            counts_h, preb, entries, R
        )
        if bad:
            self._plans.pop(plan_key, None)
            self._frame_validated = None
            return None  # standard path re-renders and records a new plan
        self._frame_validated = token
        self.last_stats = {
            "rays": int(R),
            "total_iters": int(total_iters),
            "rounds": rounds,
            "trace_seconds": round(_time.time() - t_start, 4),
            "planned": True,
            "fused": True,
            "frame_fused": True,  # raygen + u8 traced in as well
            "beam_fused": spec is not None,
            "pre": pre,
        }
        self._record_plan(plan_key, plan_from_rounds(rounds, pre=pre))
        return rgb

    def _fused_batch_fn(self, R, preb, entries, has_start, beam_key, cam,
                        u8, K):
        """K same-shape planned frames as ONE jitted program: ``lax.scan``
        over stacked camera params, each iteration the full fused frame
        body (raygen, beam, init, rounds, compactions, shade, u8).
        Returns ``fn(tree[, tree_b], origins[K,3], rights, ups, forwards,
        scales[K,2], bgc) -> (rgb [K,R,3], counts [K,C])`` — K frames per
        dispatch amortizes the tunnel's per-dispatch + counts-RTT overhead
        (~70 ms/frame measured, PERF.md xprof proof) K-fold; scan keeps one
        frame's buffers live at a time, so memory matches a single frame
        plus the [K,R,3] output."""
        key = (R, preb, entries, has_start, beam_key, cam, u8, K, "batch")
        fn = self._fused_fns.get(key)
        if fn is not None:
            return fn
        from voxelhex_tpu.render.camera import raygen_body

        build = self._frame_body(R, preb, entries, has_start, u8=u8)
        w, h = cam
        gen_main = raygen_body(w, h)
        if beam_key is not None:
            beam_body = self._beam_body(*beam_key)
            tile = beam_key[3]
            gen_beam = raygen_body(w // tile, h // tile)

            def fn_batch(tree, tree_b, origins, rights, ups, forwards,
                         scales, bgc):
                def one(_, xs):
                    origin, right, up, forward, scale = xs
                    o, dv = gen_main(origin, right, up, forward, scale)
                    o_b, d_b = gen_beam(origin, right, up, forward, scale)
                    out = build(tree, o, dv, beam_body(tree_b, o_b, d_b),
                                bgc)
                    return 0, (out[5], out[6])

                _, (rgbs, counts) = jax.lax.scan(
                    one, 0, (origins, rights, ups, forwards, scales)
                )
                return rgbs, counts
        else:

            def fn_batch(tree, origins, rights, ups, forwards, scales, bgc):
                def one(_, xs):
                    origin, right, up, forward, scale = xs
                    o, dv = gen_main(origin, right, up, forward, scale)
                    out = build(tree, o, dv, None, bgc)
                    return 0, (out[5], out[6])

                _, (rgbs, counts) = jax.lax.scan(
                    one, 0, (origins, rights, ups, forwards, scales)
                )
                return rgbs, counts

        fn = jax.jit(fn_batch)
        self._fused_fns[key] = fn
        return fn

    def render_many(self, cameras, bg=(0.0, 0.0, 0.0), out_u8: bool = False,
                    beam_prepass: bool = False, out_device: bool = False):
        """Render K same-resolution frames as ONE dispatch (scan over
        camera params — turntables, fly-paths, animation batches).  Host
        traffic for the whole batch: K×~60 B of camera params up, one
        counts read + the pixels down.  Requires ``fuse_plan`` and a
        recorded stable plan (the same gate as the one-dispatch single
        frame); returns ``[K, h, w, 3]`` (device array with
        ``out_device``) or None when the batch path is unavailable (no
        complete plan yet, plan overflow, beam spec missing, or mixed
        resolutions) — callers then render per-frame, which records the
        plan the next batch replays."""
        cameras = list(cameras)
        if not cameras or not self.fuse_plan:
            return None
        w, h = cameras[0].resolution
        if any(tuple(c.resolution) != (w, h) for c in cameras):
            return None
        with self._render_lock:
            import time as _time

            from voxelhex_tpu.render.camera import camera_params

            t_start = _time.time()
            bgc = jnp.asarray(bg, dtype=F32)
            R = w * h
            spec = (self._beam_spec(cameras[0], with_rays=False)
                    if beam_prepass else None)
            if beam_prepass and spec is None:
                return None
            has_start = spec is not None
            first_iters = self.beam_first_iters if has_start else None
            plan_key = (R, has_start, 14, first_iters)
            plan = self._plans.get(plan_key)
            if plan is not None and not isinstance(plan, dict):
                plan = {"pre": None, "rounds": plan}
            if (plan is None or not plan.get("complete", True)
                    or not plan.get("rounds")):
                return None
            entries = tuple(
                (int(i), (int(b) if b is not None else None))
                for i, b in plan["rounds"]
            )
            preb = (int(plan["pre"])
                    if (plan.get("pre") and has_start) else None)
            beam_key = spec["key"] if spec is not None else None
            K = len(cameras)
            fkey = (R, preb, entries, has_start, beam_key, (w, h),
                    bool(out_u8), K, "batch")
            if fkey not in self._fused_fns and (
                    self._plan_streak.get(plan_key, 0) < 1
                    or len(self._fused_fns) >= self.fuse_compile_cap):
                return None  # plan not stable yet (or compile budget spent)
            fn = self._fused_batch_fn(
                R, preb, entries, has_start, beam_key, (w, h), bool(out_u8),
                K,
            )
            stacked = [
                jnp.stack(col)
                for col in zip(*(camera_params(c) for c in cameras))
            ]
            token = (
                fkey, id(self.tree),
                tuple(
                    (tuple(np.asarray(c.origin, dtype=np.float32)),
                     tuple(np.asarray(c.target, dtype=np.float32)),
                     tuple(np.asarray(c.up, dtype=np.float32)),
                     float(c.fov_y_deg))
                    for c in cameras
                ),
                tuple(bg) if bg is not None else None,
            )
            if spec is not None:
                rgbs, counts = fn(self.tree, spec["tree_b"], *stacked, bgc)
            else:
                rgbs, counts = fn(self.tree, *stacked, bgc)
            if token == self._frame_validated:
                # validate-once-per-pose-set: identical (tree, cameras)
                # reproduce the validated counts — no blocking read
                self.last_stats = {
                    "rays": int(R) * K, "planned": True, "fused": True,
                    "frame_fused": True, "batched_frames": K,
                    "beam_fused": spec is not None, "pose_validated": True,
                    "trace_seconds": round(_time.time() - t_start, 4),
                }
                rgbs = rgbs.reshape(K, h, w, 3)
                return rgbs if out_device else np.asarray(rgbs)
            counts_h = np.asarray(counts)  # ONE blocking read for K frames
            # fold the K frames' counts by per-column MAX before the verdict:
            # every overflow check is monotone in the counts, so the max
            # catches any frame's overflow, and the re-recorded plan is the
            # UNION of all K frames' observed occupancy (a mixed-pose batch
            # must not tighten buckets to only the last pose's counts)
            bad, rounds, pre, _tot = self._counts_verdict(
                counts_h.max(axis=0), preb, entries, R
            )
            if bad:
                self._plans.pop(plan_key, None)
                self._frame_validated = None
                return None  # caller re-renders per frame, re-plans
            self._frame_validated = token
            self._record_plan(plan_key, plan_from_rounds(rounds, pre=pre))
            self.last_stats = {
                "rays": int(R) * K,
                "planned": True,
                "fused": True,
                "frame_fused": True,
                "batched_frames": K,
                "beam_fused": spec is not None,
                "trace_seconds": round(_time.time() - t_start, 4),
            }
            rgbs = rgbs.reshape(K, h, w, 3)
            return rgbs if out_device else np.asarray(rgbs)

    def _fused_delta_fn(self, R, preb, entries, has_start, beam_key, cam, K):
        """K planned u8 frames as ONE jitted program WITH device-side
        frame-delta digests: the scan carries the previous frame and each
        iteration emits ``ndiff[k]`` — the count of pixels that differ
        from the frame before it (frame 0 compares against the carried-in
        ``prev``).  Returns ``fn(tree[, tree_b], prev [R,3] u8, origins,
        rights, ups, forwards, scales, bgc) -> (last [R,3] u8,
        rgbs [K,R,3] u8, ndiffs [K] i32, counts [K,C])``.

        The digests make the HOST transfer proportional to change: a
        steady pose (idle viewer, throughput bench, param re-render) moves
        K x 4 bytes per batch instead of K x R x 3 — the reference never
        round-trips frames at all (its output stays in a GPU texture,
        /root/reference/src/raytracing/bevy/pipeline/mod.rs:116-154), and
        through a ~30 MB/s tunnel the 6 MB 1080p payload is ~200 ms/frame
        (PERF.md transfer discipline), so this is the TPU-serving analog.
        Alongside ``ndiffs`` each frame emits per-ROW-GROUP changed flags
        (``rowflags [K, G]``, 8 rows/group), so a LOCAL change (an edit)
        fetches just its contiguous row band instead of the full frame.
        ``rgbs`` stays on device; the caller fetches only changed spans."""
        key = (R, preb, entries, has_start, beam_key, cam, K, "delta")
        fn = self._fused_fns.get(key)
        if fn is not None:
            return fn
        from voxelhex_tpu.render.camera import raygen_body

        build = self._frame_body(R, preb, entries, has_start, u8=True)
        w, h = cam
        gen_main = raygen_body(w, h)
        G = (h + 7) // 8  # row groups (8 rows each, tail-padded)

        def _digest(rgb, prev):
            rowdiff = jnp.any(
                (rgb != prev).reshape(h, w * 3), axis=1
            )
            pad = jnp.zeros(G * 8 - h, dtype=bool)
            groups = jnp.concatenate([rowdiff, pad]).reshape(G, 8).any(
                axis=1
            )
            return jnp.sum(rowdiff.astype(I32)), groups

        if beam_key is not None:
            beam_body = self._beam_body(*beam_key)
            tile = beam_key[3]
            gen_beam = raygen_body(w // tile, h // tile)

            def fn_delta(tree, tree_b, prev, origins, rights, ups,
                         forwards, scales, bgc):
                def one(prev, xs):
                    origin, right, up, forward, scale = xs
                    o, dv = gen_main(origin, right, up, forward, scale)
                    o_b, d_b = gen_beam(origin, right, up, forward, scale)
                    out = build(tree, o, dv, beam_body(tree_b, o_b, d_b),
                                bgc)
                    rgb = out[5]
                    nd, groups = _digest(rgb, prev)
                    return rgb, (rgb, nd, groups, out[6])

                last, (rgbs, ndiffs, rowflags, counts) = jax.lax.scan(
                    one, prev, (origins, rights, ups, forwards, scales)
                )
                return last, rgbs, ndiffs, rowflags, counts
        else:

            def fn_delta(tree, prev, origins, rights, ups, forwards,
                         scales, bgc):
                def one(prev, xs):
                    origin, right, up, forward, scale = xs
                    o, dv = gen_main(origin, right, up, forward, scale)
                    out = build(tree, o, dv, None, bgc)
                    rgb = out[5]
                    nd, groups = _digest(rgb, prev)
                    return rgb, (rgb, nd, groups, out[6])

                last, (rgbs, ndiffs, rowflags, counts) = jax.lax.scan(
                    one, prev, (origins, rights, ups, forwards, scales)
                )
                return last, rgbs, ndiffs, rowflags, counts

        fn = jax.jit(fn_delta)
        self._fused_fns[key] = fn
        return fn

    def render_delta_many(self, cameras, bg=(0.0, 0.0, 0.0),
                          beam_prepass: bool = False):
        """Render K same-resolution u8 frames as ONE dispatch, fetching
        only frames that CHANGED (device-side per-frame diff against the
        previous frame — :meth:`_fused_delta_fn`).  Returns a list of K
        ``[h, w, 3]`` u8 ndarrays, where consecutive identical frames are
        literally the SAME ndarray object (treat them as read-only), or
        ``None`` when the path is unavailable (same gates as
        :meth:`render_many`: no stable plan, overflow, beam spec missing,
        mixed resolutions).

        Exactness: frames come from the identical planned frame body as
        :meth:`render` / :meth:`render_many` (counts-validated, overflow
        falls back), the diff runs on the final u8 pixels on device, and
        the first batch per plan shape additionally fetches the last
        frame in full and verifies the host reconstruction byte-for-byte
        before the digest path is trusted.  The baseline is only a diff
        base, so it stays valid across EDITS/content changes — each frame
        renders fresh from the current tree and diffs on device; a local
        edit fetches just its contiguous changed row band
        (``delta_rows_fetched`` in ``last_stats``), and an edit invisible
        from the pose fetches nothing."""
        cameras = list(cameras)
        if not cameras or not self.fuse_plan:
            return None
        w, h = cameras[0].resolution
        if any(tuple(c.resolution) != (w, h) for c in cameras):
            return None
        with self._render_lock:
            import time as _time

            from voxelhex_tpu.render.camera import camera_params

            t_start = _time.time()
            bgc = jnp.asarray(bg, dtype=F32)
            R = w * h
            spec = (self._beam_spec(cameras[0], with_rays=False)
                    if beam_prepass else None)
            if beam_prepass and spec is None:
                return None
            has_start = spec is not None
            first_iters = self.beam_first_iters if has_start else None
            plan_key = (R, has_start, 14, first_iters)
            plan = self._plans.get(plan_key)
            if plan is not None and not isinstance(plan, dict):
                plan = {"pre": None, "rounds": plan}
            if (plan is None or not plan.get("complete", True)
                    or not plan.get("rounds")):
                return None
            entries = tuple(
                (int(i), (int(b) if b is not None else None))
                for i, b in plan["rounds"]
            )
            preb = (int(plan["pre"])
                    if (plan.get("pre") and has_start) else None)
            beam_key = spec["key"] if spec is not None else None
            K = len(cameras)
            fkey = (R, preb, entries, has_start, beam_key, (w, h), K,
                    "delta")
            if fkey not in self._fused_fns and (
                    self._plan_streak.get(plan_key, 0) < 1
                    or len(self._fused_fns) >= self.fuse_compile_cap):
                return None  # plan not stable yet (or compile budget spent)
            fn = self._fused_delta_fn(
                R, preb, entries, has_start, beam_key, (w, h), K
            )
            # the baseline is specific to (plan program, bg) — NOT the
            # pose and NOT the tree content: it is only a diff base, the
            # program diffs the freshly rendered frame against it on
            # device, so it stays valid across edits/content changes (an
            # edit then costs exactly its changed row bands)
            dtoken = (R, preb, entries, has_start, beam_key, (w, h),
                      tuple(bg) if bg is not None else None)
            state = self._delta_state
            if state is None or state[0] != dtoken:
                # self-priming: an all-zero baseline makes frame 0 report
                # changed, so the first batch fetches it in full
                prev_dev = jnp.zeros((R, 3), dtype=jnp.uint8)
                prev_host = None
            else:
                prev_dev, prev_host = state[1], state[2]
            stacked = [
                jnp.stack(col)
                for col in zip(*(camera_params(c) for c in cameras))
            ]
            token = (
                fkey, id(self.tree),
                tuple(
                    (tuple(np.asarray(c.origin, dtype=np.float32)),
                     tuple(np.asarray(c.target, dtype=np.float32)),
                     tuple(np.asarray(c.up, dtype=np.float32)),
                     float(c.fov_y_deg))
                    for c in cameras
                ),
                tuple(bg) if bg is not None else None,
            )
            if spec is not None:
                last, rgbs, ndiffs, rowflags, counts = fn(
                    self.tree, spec["tree_b"], prev_dev, *stacked, bgc
                )
            else:
                last, rgbs, ndiffs, rowflags, counts = fn(
                    self.tree, prev_dev, *stacked, bgc
                )
            pose_validated = token == self._frame_validated
            if pose_validated:
                # the batch's one tiny read (digests + row flags)
                nd, rf = jax.device_get((ndiffs, rowflags))
            else:
                nd, rf, counts_h = jax.device_get(
                    (ndiffs, rowflags, counts)
                )
                bad, rounds, pre, _tot = self._counts_verdict(
                    counts_h.max(axis=0), preb, entries, R
                )
                if bad:
                    self._plans.pop(plan_key, None)
                    self._frame_validated = None
                    self._delta_state = None
                    return None  # caller re-renders per frame, re-plans
                self._frame_validated = token
                self._record_plan(plan_key, plan_from_rounds(rounds,
                                                             pre=pre))
            # host reconstruction: fetch ONLY frames whose digest moved,
            # and for a LOCAL change (contiguous flagged row groups
            # covering < half the frame) fetch just that row band and
            # patch it into a copy of the previous frame
            frames = []
            cur = prev_host
            fetched = 0
            rows_fetched = 0
            for k in range(int(K)):
                if int(nd[k]) != 0 or cur is None:
                    fetched += 1
                    groups = np.flatnonzero(rf[k])
                    lo = int(groups[0]) * 8 if groups.size else 0
                    hi = min(int(groups[-1] + 1) * 8, h) if groups.size \
                        else h
                    if cur is not None and (hi - lo) * 2 < h:
                        band = np.asarray(
                            rgbs[k].reshape(h, w, 3)[lo:hi]
                        )
                        cur = cur.copy()
                        cur[lo:hi] = band
                        rows_fetched += hi - lo
                    else:
                        cur = np.asarray(rgbs[k]).reshape(h, w, 3)
                        rows_fetched += h
                frames.append(cur)
            if self._delta_validated != dtoken:
                # one-time exactness gate per (plan, tree): the digest
                # path's reconstructed last frame must equal the program's
                # actual last frame byte-for-byte
                check = np.asarray(last).reshape(h, w, 3)
                if not np.array_equal(frames[-1], check):  # pragma: no cover
                    self._delta_state = None
                    raise AssertionError(
                        "render_delta_many: reconstruction mismatch"
                    )
                self._delta_validated = dtoken
            self._delta_state = (dtoken, last, frames[-1])
            self.last_stats = {
                "rays": int(R) * K, "planned": True, "fused": True,
                "frame_fused": True, "batched_frames": K, "delta": True,
                "delta_fetched": fetched,
                "delta_rows_fetched": int(rows_fetched),
                "beam_fused": spec is not None,
                "pose_validated": pose_validated,
                "trace_seconds": round(_time.time() - t_start, 4),
            }
            return frames

    def _trace_fused(self, origins, directions, o, dv, st, plan_pre,
                     plan_rounds, shade_bg, plan_key, start_t, round_iters,
                     shrink, min_bucket, first_round_iters, beam=None):
        """Planned frame as one dispatch (see _fused_plan_fn).  Falls back
        to the adaptive loop when the plan overflowed or left stragglers.
        With ``beam`` (a _beam_spec dict) the beam prepass is traced into
        the same dispatch."""
        import time as _time

        t_start = _time.time()
        R = o.shape[0]
        entries = tuple(
            (int(i), (int(b) if b is not None else None))
            for i, b in plan_rounds
        )
        has_start = (st is not None) or (beam is not None)
        preb = int(plan_pre) if (plan_pre and has_start) else None
        fn = self._fused_plan_fn(
            R, preb, entries, has_start,
            beam_key=(beam["key"] if beam is not None else None),
        )
        bgc = jnp.asarray(shade_bg, dtype=F32)
        if beam is not None:
            hit, voxel, hvox, hpoint, hnormal, rgb, counts = fn(
                self.tree, beam["tree_b"], o, dv, beam["o_b"], beam["d_b"],
                bgc,
            )
        elif st is not None:
            hit, voxel, hvox, hpoint, hnormal, rgb, counts = fn(
                self.tree, o, dv, st, bgc
            )
        else:
            hit, voxel, hvox, hpoint, hnormal, rgb, counts = fn(
                self.tree, o, dv, bgc
            )
        counts_h = np.asarray(counts)  # the frame's one blocking read
        bad, rounds, pre, total_iters = self._counts_verdict(
            counts_h, preb, entries, R
        )
        if bad:
            # plan no longer fits this frame (or left live stragglers the
            # fused program cannot extend): retrace adaptively, bit-exact
            self._plans.pop(plan_key, None)
            return self.trace_compacted(
                origins, directions, start_t=start_t,
                round_iters=round_iters, shrink=shrink,
                min_bucket=min_bucket, shade_bg=shade_bg,
                first_round_iters=first_round_iters, beam=beam,
            )
        self.last_stats = {
            "rays": int(R),
            "total_iters": int(total_iters),
            "rounds": rounds,
            "trace_seconds": round(_time.time() - t_start, 4),
            "planned": True,
            "fused": True,
            "beam_fused": beam is not None,
            "pre": pre,
        }
        self._record_plan(plan_key, plan_from_rounds(
            rounds, shrink=shrink, min_bucket=min_bucket, pre=pre
        ))
        return hit, voxel, hvox, hpoint, hnormal, rgb

    def trace_compacted(
        self, origins, directions, start_t=None, round_iters: int = 14,
        shrink: int = 4, min_bucket: int = 8192, shade_bg=None,
        first_round_iters: int | None = None, plan=None, beam=None,
    ):
        """Trace with straggler compaction: run fixed-iteration rounds and
        periodically pack the still-active rays into a 1/shrink-size buffer,
        so late iterations don't pay full-frame gather costs.  Each bucket
        shape compiles once (cached).

        ``plan``: an optional fixed (iters, bucket) schedule (usually the
        previous frame's, via :func:`plan_from_rounds`) executed WITHOUT
        per-round host syncs — the adaptive loop blocks on each round's
        straggler count to size the next bucket, paying one relay round-trip
        per round; a planned frame enqueues the whole schedule and reads all
        counts in one batched fetch at the end.  If the frame outgrew its
        plan (a compaction bucket overflowed, dropping rays) the frame is
        re-traced adaptively — results are bit-exact either way."""
        import time as _time

        fns = self._compact_fns
        t_start = _time.time()
        rounds = []
        o = jnp.asarray(origins, dtype=F32).reshape(-1, 3)
        dv = jnp.asarray(directions, dtype=F32).reshape(-1, 3)
        R = o.shape[0]
        st = None if start_t is None else jnp.asarray(start_t).reshape(-1)
        # ``beam``: a _beam_spec dict — the frame has a conservative start
        # even when ``start_t`` wasn't materialized on the host (the fused
        # path traces the beam prepass INTO the frame program)
        has_start = (st is not None) or (beam is not None)
        plan_key = (R, has_start, round_iters, first_round_iters)
        if plan is None and self.auto_plan:
            plan = self._plans.get(plan_key)
        # plans come in two shapes: a legacy list of (iters, bucket) pairs,
        # or a dict {"pre": bucket-or-None, "rounds": [...]} that also plans
        # the round-0 compaction bucket (below) so beam frames replay with
        # ZERO blocking host reads before the schedule's one batched fetch
        plan_pre = None
        plan_rounds = plan
        plan_complete = True
        if isinstance(plan, dict):
            plan_pre = plan.get("pre")
            plan_rounds = plan.get("rounds")
            plan_complete = plan.get("complete", True)

        if (plan_rounds and plan_complete and self.fuse_plan
                and shade_bg is not None):
            entries_t = tuple(
                (int(i), (int(b) if b is not None else None))
                for i, b in plan_rounds
            )
            preb_t = int(plan_pre) if (plan_pre and has_start) else None
            beam_key_t = beam["key"] if beam is not None else None
            fkey = (R, preb_t, entries_t, has_start, beam_key_t, None, False)
            if fkey in self._fused_fns or (
                    self._plan_streak.get(plan_key, 0) >= 1
                    and len(self._fused_fns) < self.fuse_compile_cap):
                # whole planned frame as ONE dispatch (init fused in too)
                return self._trace_fused(
                    origins, directions, o, dv, st, plan_pre, plan_rounds,
                    shade_bg, plan_key, start_t, round_iters, shrink,
                    min_bucket, first_round_iters, beam=beam,
                )
            # plan seen only once: replay it NON-fused (no new compiles)
            # until it proves stable
        if st is None and beam is not None:
            # not fusing this frame: the beam prepass runs as its own
            # dispatch, exactly like beam_start()
            st = self._beam_fn(*beam["key"])(
                beam["tree_b"], beam["o_b"], beam["d_b"]
            )

        state = fns["init"](self.tree, o, dv, st)
        orig = None  # None => identity mapping (no compaction happened yet)
        hit = hvox = hnormal = hpoint = None

        total_iters = 0
        R0 = R

        def _pre_compact(state, bucket0):
            # adopt the (all-miss) init accumulators, then pack survivors
            hit, hvox, hnormal, hpoint = (
                state[11], state[12], state[13], state[0]
            )
            orig = jnp.arange(R0, dtype=I32)
            perm = fns["perm"](state[10], bucket0)
            state, orig = fns["apply_perm"](state, orig, perm)
            return state, orig, hit, hvox, hnormal, hpoint

        pre = None
        pre_count_dev = None
        if st is not None:
            # ROUND-0 COMPACTION: a conservative start_t (beam prepass)
            # proves rays dead AT INIT (start >= box exit -> guaranteed
            # miss, deactivated by init).  With sky-heavy cameras that is
            # the MAJORITY of the frame (80.9% dead tiles measured on the
            # 1080p bench scene), and compacting before round 1 takes the
            # expensive full-width round to a ladder bucket sized to the
            # survivors — the first round is ~80% of frame ray-iters.
            if plan_rounds and plan_pre:
                # planned pre bucket: no blocking count read here — the
                # alive count joins the schedule's one batched fetch, where
                # n_alive > bucket flags overflow and retraces adaptively
                pre_count_dev = fns["count"](state)
                state, orig, hit, hvox, hnormal, hpoint = _pre_compact(
                    state, plan_pre
                )
                pre = {"n_alive": None, "bucket": int(plan_pre), "R0": R0,
                       "planned": True}
            else:
                # adaptive: one scalar fetch — the same price the adaptive
                # loop pays per round, but this one cannot overlap already-
                # enqueued work (nothing is enqueued yet), so planned
                # frames avoid it entirely via plan["pre"]
                n0 = int(fns["count"](state))
                bucket0 = R0
                while bucket0 // shrink >= max(n0, min_bucket):
                    bucket0 //= shrink
                if bucket0 < R0:
                    state, orig, hit, hvox, hnormal, hpoint = _pre_compact(
                        state, bucket0
                    )
                pre = {"n_alive": int(n0), "bucket": int(bucket0), "R0": R0}
        done = False
        if plan_rounds:
            counts = []  # (bucket_during_round, iters, count_dev, next_bucket)
            cur = state[0].shape[0]  # may already be pre-round-0 compacted
            for iters, bucket in plan_rounds:
                state, n_active_dev = fns["run"](self.tree, state, iters)
                counts.append((cur, iters, n_active_dev, bucket))
                total_iters += iters
                if bucket is not None and bucket < cur:
                    if orig is None:
                        hit, hvox, hnormal, hpoint = (
                            state[11], state[12], state[13], state[0]
                        )
                        orig = jnp.arange(cur, dtype=I32)
                    else:
                        hit, hvox, hnormal, hpoint = fns["scatter"](
                            state, orig, hit, hvox, hnormal, hpoint
                        )
                    perm = fns["perm"](state[10], bucket)
                    state, orig = fns["apply_perm"](state, orig, perm)
                    cur = bucket
            # the schedule's ONLY blocking read: every straggler count at
            # once (plus the planned-pre alive count, if any)
            stack = [c[2] for c in counts]
            if pre_count_dev is not None:
                stack.append(pre_count_dev)
            counts_h = np.asarray(jnp.stack(stack))
            last_round_n = int(counts_h[len(counts) - 1])
            overflow = False
            if pre_count_dev is not None:
                n0 = int(counts_h[len(counts)])
                pre["n_alive"] = n0
                if n0 > pre["bucket"]:
                    overflow = True  # pre-compaction dropped live rays
            for i, (csize, iters, _c, bucket) in enumerate(counts):
                n = int(counts_h[i])
                rounds.append({"bucket": int(csize), "iters": int(iters),
                               "n_active": n, "seconds": 0.0, "planned": True})
                if bucket is not None and n > bucket:
                    overflow = True  # compaction dropped active rays
            if overflow:
                # drop the stale schedule so auto_plan can't re-enter it
                # (st covers both the caller's start_t and a beam start
                # already materialized above — no second beam dispatch)
                self._plans.pop(plan_key, None)
                return self.trace_compacted(
                    origins, directions, start_t=st,
                    round_iters=round_iters, shrink=shrink,
                    min_bucket=min_bucket, shade_bg=shade_bg,
                    first_round_iters=first_round_iters,
                )
            if last_round_n == 0:
                if orig is None:
                    hit, hvox, hnormal, hpoint = (
                        state[11], state[12], state[13], state[0]
                    )
                else:
                    hit, hvox, hnormal, hpoint = fns["scatter"](
                        state, orig, hit, hvox, hnormal, hpoint
                    )
                done = True
            # else: stragglers the plan didn't cover — adaptive loop finishes
        while not done:
            cur = state[0].shape[0]
            # full-size rounds stay short (compaction opportunity); compacted
            # buckets run long rounds to amortize dispatch latency — except
            # the FIRST round after a round-0 compaction, which is still the
            # whole frame's march and wants the short-round/compact cadence
            iters = round_iters if (cur >= R0 or total_iters == 0) else 4 * round_iters
            if total_iters == 0 and first_round_iters is not None:
                # with a depth prepass most rays hit within a few steps of
                # their start — the expensive full-width round can be shorter
                iters = first_round_iters
            t_round = _time.time()
            state, n_active_dev = fns["run"](self.tree, state, iters)
            total_iters += iters
            n_active = int(n_active_dev)
            rounds.append(
                {"bucket": int(cur), "iters": int(iters),
                 "n_active": int(n_active),
                 "seconds": round(_time.time() - t_round, 4)}
            )
            if n_active == 0 or total_iters >= self._max_iters:
                if orig is None:
                    # never compacted: the state IS the full-frame result
                    hit, hvox, hnormal, hpoint = (
                        state[11], state[12], state[13], state[0]
                    )
                else:
                    hit, hvox, hnormal, hpoint = fns["scatter"](
                        state, orig, hit, hvox, hnormal, hpoint
                    )
                break
            bucket = cur
            while bucket // shrink >= max(n_active, min_bucket):
                bucket //= shrink
            if bucket < cur:
                if orig is None:
                    # first compaction: adopt the in-order state as the
                    # accumulators (no scatter needed — indices are identity)
                    hit, hvox, hnormal, hpoint = (
                        state[11], state[12], state[13], state[0]
                    )
                    orig = jnp.arange(cur, dtype=I32)
                else:
                    hit, hvox, hnormal, hpoint = fns["scatter"](
                        state, orig, hit, hvox, hnormal, hpoint
                    )
                perm = fns["perm"](state[10], bucket)
                state, orig = fns["apply_perm"](state, orig, perm)
        # profiling hook (host-side only): per-round bucket/iters/actives —
        # the whisp fps-overlay analog for headless use (SURVEY §7.2 item 7)
        self.last_stats = {
            "rays": int(R),
            "total_iters": int(total_iters),
            "rounds": rounds,
            "trace_seconds": round(_time.time() - t_start, 4),
            "planned": bool(plan),
            "pre": pre,  # round-0 compaction (beam dead-tile drop), or None
        }
        # remember a schedule for the next same-shaped frame (auto_plan)
        self._record_plan(plan_key, plan_from_rounds(
            rounds, shrink=shrink, min_bucket=min_bucket, pre=pre
        ))
        if shade_bg is not None:
            # fused color + shade: one dispatch for the whole finish
            voxel, rgb = fns["finish"](self.tree, hit, hvox, hnormal, shade_bg)
            return hit, voxel, hvox, hpoint, hnormal, rgb
        voxel = fns["color"](self.tree, hit, hvox)
        return hit, voxel, hvox, hpoint, hnormal

    def render(self, camera, bg=(0.0, 0.0, 0.0), compact: bool = True,
               out_u8: bool = False, out_device: bool = False,
               splat_prepass: bool = False, beam_prepass: bool = False,
               defer_validation: bool = False):
        with self._render_lock:
            return self._render_impl(
                camera, bg=bg, compact=compact, out_u8=out_u8,
                out_device=out_device, splat_prepass=splat_prepass,
                beam_prepass=beam_prepass, defer_validation=defer_validation,
            )

    def _render_impl(self, camera, bg=(0.0, 0.0, 0.0), compact: bool = True,
                     out_u8: bool = False, out_device: bool = False,
                     splat_prepass: bool = False, beam_prepass: bool = False,
                     defer_validation: bool = False):
        """Render a frame.  ``out_u8`` quantizes to uint8 ON DEVICE (the
        reference's rgba8 output-texture convention) — 4x less host
        transfer, which dominates remote-TPU frame time.  ``out_device``
        returns the [h, w, 3] DEVICE array without fetching, so callers can
        overlap the download with the next frame's compute
        (:class:`voxelhex_tpu.render.pipeline.FramePipeline`)."""
        from voxelhex_tpu.render.camera import device_rays

        w, h = camera.resolution
        bgc = jnp.asarray(bg, dtype=F32)
        levels = self.prepass_levels if self.prepass else 0
        while levels and (h % (2**levels) or w % (2**levels)):
            levels -= 1

        if compact and levels == 0 and not splat_prepass:
            # steady state: the WHOLE frame (raygen, beam, trace, shade,
            # u8) as one dispatch from ~60 B of camera params.  With
            # ``defer_validation`` (FramePipeline), the plan-validity
            # counts read moves to the consumer's fetch worker — this
            # thread never blocks on the tunnel round-trip.
            rgb = self._try_render_fused(
                camera, bgc, beam_prepass, out_u8, bg=bg,
                defer=(defer_validation and out_device),
            )
            if isinstance(rgb, self.DeferredFrame):
                return rgb  # consumer resolves (out_device implied)
            if rgb is not None:
                rgb = rgb.reshape(h, w, 3)
                return rgb if out_device else np.asarray(rgb)

        o, dv = device_rays(camera)  # rays never leave the device

        if not compact:
            if levels:
                from voxelhex_tpu.render.camera import Camera

                level_rays = []
                for i in range(levels, 0, -1):
                    f_ = 2**i
                    cam_i = Camera(
                        origin=camera.origin,
                        target=camera.target,
                        up=camera.up,
                        fov_y_deg=camera.fov_y_deg,
                        resolution=(w // f_, h // f_),
                    )
                    level_rays.append(device_rays(cam_i))
                level_rays.append((o, dv))
                rgb = self._prepass_fn(h, w, levels)(self.tree, tuple(level_rays), bgc)
            else:
                rgb = self._shade_batch(self.tree, o, dv, bgc)
            if out_u8:
                rgb = self._to_u8(rgb)
            rgb = rgb.reshape(h, w, 3)
            return rgb if out_device else np.asarray(rgb)

        # compaction path: host-driven rounds, optional multi-level prepass
        from voxelhex_tpu.render.camera import Camera

        if beam_prepass and levels == 0:
            # the beam spec (not materialized starts): planned fused frames
            # trace the beam INTO the one-dispatch frame program; otherwise
            # trace_compacted runs it as its own dispatch, as before
            spec = self._beam_spec(camera)
            if spec is not None:
                _hit, _v, _hv, _hp, _hn, rgb = self.trace_compacted(
                    o, dv, beam=spec, shade_bg=bgc,
                    first_round_iters=self.beam_first_iters,
                )
                if out_u8:
                    rgb = self._to_u8(rgb)
                rgb = rgb.reshape(h, w, 3)
                return rgb if out_device else np.asarray(rgb)

        if splat_prepass and levels == 0 and h % 2 == 0 and w % 2 == 0:
            _hit, _v, _hv, _hp, _hn, rgb = self.trace_compacted(
                o, dv, start_t=self.splat_start(camera), shade_bg=bgc,
                first_round_iters=self.splat_first_iters,
            )
            if out_u8:
                rgb = self._to_u8(rgb)
            rgb = rgb.reshape(h, w, 3)
            return rgb if out_device else np.asarray(rgb)

        start = None
        for i in range(levels, -1, -1):
            f_ = 2**i
            if i > 0:
                cam_i = Camera(
                    origin=camera.origin,
                    target=camera.target,
                    up=camera.up,
                    fov_y_deg=camera.fov_y_deg,
                    resolution=(w // f_, h // f_),
                )
                lo, ld = device_rays(cam_i)
            else:
                lo, ld = o, dv
            if i == 0:
                _hit, _v, _hv, _hp, _hn, rgb = self.trace_compacted(
                    lo, ld,
                    start_t=None if start is None else start.reshape(-1),
                    shade_bg=bgc,
                )
                if out_u8:
                    rgb = self._to_u8(rgb)
                rgb = rgb.reshape(h, w, 3)
                return rgb if out_device else np.asarray(rgb)
            hit, _voxel, _hv, hpoint, _hn = self.trace_compacted(
                lo, ld, start_t=None if start is None else start.reshape(-1)
            )
            start = self._depth_start(hit, hpoint, lo, h // f_, w // f_)
        raise AssertionError("unreachable")
