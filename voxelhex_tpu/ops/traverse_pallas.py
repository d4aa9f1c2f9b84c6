"""CONCLUDED (round 3): Pallas tile-traversal kernel — Mosaic dead end.

The XLA renderer runs all rays in lock-step and pays scalar-core gather
costs per iteration; this kernel processes rays in independent grid tiles
so each tile's loop exits as soon as ITS rays finish, with the occupancy
pyramid resident in VMEM.  It is CORRECT (validated against the XLA tracer
in interpreter mode, tests/test_ops_pallas.py) but CANNOT COMPILE on TPU,
and round 3's systematic probe of every in-kernel gather formulation
(jax 0.9.0 Mosaic, 2026-08-21) confirmed the dead end — see PERF.md
"Pallas verdict" for the full matrix:

* per-lane scalar-store loop: "Cannot store scalars to VMEM";
* ``jnp.take``/fancy row indexing (any table shape): "Shape mismatch in
  input, indices and output" / "Only 2D gather is supported";
* ``take_along_axis`` axis 0 or 1, [N,2]/[N,128]/[8,65536] tables:
  lowering assertion failures (single-vreg tables only, per PERF.md);
* ``pl.ds`` dynamic-slice row loads + where-accumulate: serializes T
  scalar-indexed loads per fetch on the scalar core — measured no faster
  than XLA's out-of-loop gather fast path, with none of its pipelining;
* scalar-prefetch (addresses in SMEM): addresses here are loop-carried
  vector state (the address for iteration k+1 is computed IN iteration k
  from the fetched words), so no prefetch schedule can exist — this is
  inherent to pointer-chasing traversal, not a formulation choice.

The bound it cannot beat: the XLA round loop already runs at the chip's
measured 11.9 ns/ray/iter one-row-gather floor (PERF.md "Floor
accounting"), and beam + round-0 compaction + fused planned frames remove
the round-structure waste a tile kernel would address.  Kept (demoted) as
an interpreter-mode executable spec of the traversal automaton; delete if
Mosaic ever grows a wide vector gather and a fresh attempt supersedes it.

Tile shape: (8, 128) rays per grid program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_S, TILE_L = 8, 128  # sublanes x lanes
TILE = TILE_S * TILE_L

OOB = 64


def _offset_sectant(offset, size):
    """offset [T,3]; size scalar or [T] -> sectant [T]."""
    size = jnp.asarray(size)
    if size.ndim == 1:
        size = size[:, None]
    idx = jnp.clip(jnp.floor(offset * 4.0 / size), 0, 3).astype(jnp.int32)
    return idx[..., 0] + idx[..., 1] * 4 + idx[..., 2] * 16


def _sectant_offset(s):
    return jnp.stack([(s % 4), (s // 4) % 4, s // 16], axis=-1).astype(jnp.float32) * 0.25


def _step_sectant(s, step):
    sg = jnp.sign(step).astype(jnp.int32)
    x = s % 4 + sg[..., 0]
    y = (s // 4) % 4 + sg[..., 1]
    z = s // 16 + sg[..., 2]
    inside = (x >= 0) & (x < 4) & (y >= 0) & (y < 4) & (z >= 0) & (z < 4)
    return jnp.where(inside, x + y * 4 + z * 16, OOB)


def _occ_bit(lo, hi, s):
    sc = jnp.clip(s, 0, 63)
    word = jnp.where(sc < 32, lo, hi)
    return (word >> (sc % 32).astype(jnp.uint32)) & jnp.uint32(1)


def make_kernel(n_levels: int, bases, dims, size: float, max_iters: int = 256):
    cell_sizes = [float(4**l) for l in range(n_levels)]
    top = n_levels - 1
    top_block = cell_sizes[top] * 4.0

    def kernel(o_ref, d_ref, occ_ref, hit_ref, hvox_ref, addr_scr, word_scr):
        o = o_ref[:]  # [TILE, 3]
        dirv = d_ref[:]
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
        tmin_r = jnp.max(jnp.where(jnp.isnan(per_min), -jnp.inf, per_min), axis=-1)
        tmax_r = jnp.min(jnp.where(jnp.isnan(per_max), jnp.inf, per_max), axis=-1)
        root_hit = ~((tmax_r < 0.0) | (tmin_r > tmax_r))
        enter = jnp.maximum(tmin_r, 0.0)
        point = o + dirv * enter[:, None]

        def fetch(level, bmin):
            """One word-pair fetch per ray via a scalar lane loop."""
            addr = jnp.zeros(TILE, dtype=jnp.int32)
            for l in range(n_levels):
                bs = cell_sizes[l] * 4.0
                bc = jnp.floor(bmin / bs).astype(jnp.int32)
                a = bases[l] + bc[:, 0] + bc[:, 1] * dims[l] + bc[:, 2] * dims[l] * dims[l]
                addr = jnp.where(level == l, a, addr)
            addr = jnp.clip(addr, 0, occ_ref.shape[0] - 1)
            addr_scr[:] = addr

            def lane(i, _):
                a = addr_scr[i]
                word_scr[i, 0] = occ_ref[a, 0]
                word_scr[i, 1] = occ_ref[a, 1]
                return 0

            jax.lax.fori_loop(0, TILE, lane, 0)
            return word_scr[:, 0], word_scr[:, 1]

        level = jnp.full(TILE, top, dtype=jnp.int32)
        occ_lo, occ_hi = fetch(level, jnp.zeros((TILE, 3), jnp.float32))
        tsize = jnp.full(TILE, cell_sizes[top], jnp.float32)
        tsect = jnp.where(root_hit, _offset_sectant(point, top_block), OOB).astype(jnp.int32)
        tmin = _sectant_offset(jnp.clip(tsect, 0, 63)) * top_block
        bmin = jnp.zeros((TILE, 3), jnp.float32)
        active = root_hit
        hit = jnp.zeros(TILE, dtype=jnp.int32)
        hvox = jnp.zeros((TILE, 3), dtype=jnp.int32)

        def cond(st):
            return jnp.any(st[8] != 0) & (st[10] < max_iters)

        def dda(p, cmin, csize):
            sg = jnp.sign(dirv)
            steps = csize[:, None] * jnp.maximum(sg, 0.0) - sg * (p - cmin)
            dist = jnp.abs(steps * sf)
            dist = jnp.where(dirv == 0.0, 1e30, dist)
            dist = jnp.where(jnp.isnan(dist), 1e30, dist)
            m = jnp.min(dist, axis=-1, keepdims=True)
            return p + dirv * m, jnp.where(dist == m, sg, 0.0)

        def body(st):
            (point, tsect, tmin, tsize, level, occ_lo, occ_hi, bmin,
             active_i, hit, it, hvox) = st
            active = active_i != 0
            occupied = _occ_bit(occ_lo, occ_hi, tsect) != 0
            at_bottom = level == 0
            found = active & occupied & at_bottom & (tsect < OOB)
            hit = jnp.where(found, 1, hit)
            hvox = jnp.where(found[:, None], tmin.astype(jnp.int32), hvox)
            active = active & (~found)

            descend = active & occupied & (~at_bottom) & (tsect < OOB)
            ascend = active & (tsect >= OOB) & (~descend)
            advance = active & (~descend) & (~ascend)

            d_tsect = _offset_sectant(point - tmin, tsize)
            d_tmin = tmin + _sectant_offset(d_tsect) * tsize[:, None]

            block = tsize * 4.0
            parent_block = block * 4.0
            parent_min = bmin - jnp.mod(bmin, parent_block[:, None])
            a_ts0 = _offset_sectant(bmin + block[:, None] / 2.0 - parent_min, parent_block)
            a_new_p, a_step = dda(point, bmin, block)
            a_ts = _step_sectant(a_ts0, a_step)
            a_tmin = bmin + a_step * block[:, None]

            v_new_p, v_step = dda(point, tmin, tsize)
            v_ts = _step_sectant(tsect, v_step)
            v_tmin = jnp.where((v_ts < OOB)[:, None], tmin + v_step * tsize[:, None], tmin)

            old_tmin = tmin
            point = jnp.where(advance[:, None], v_new_p, point)
            point = jnp.where(ascend[:, None], a_new_p, point)
            tsect = jnp.where(descend, d_tsect, jnp.where(ascend, a_ts, jnp.where(advance, v_ts, tsect)))
            tmin = jnp.where(descend[:, None], d_tmin, jnp.where(ascend[:, None], a_tmin, jnp.where(advance[:, None], v_tmin, tmin)))
            tsize = jnp.where(descend, tsize / 4.0, jnp.where(ascend, block, tsize))
            level = jnp.where(descend, level - 1, jnp.where(ascend, level + 1, level))
            bmin = jnp.where(descend[:, None], old_tmin, jnp.where(ascend[:, None], parent_min, bmin))

            over = active & (level > top)
            active = active & (~over)

            moved = descend | ascend
            new_lo, new_hi = fetch(jnp.clip(level, 0, top), bmin)
            occ_lo = jnp.where(moved, new_lo, occ_lo)
            occ_hi = jnp.where(moved, new_hi, occ_hi)

            return (point, tsect, tmin, tsize, level, occ_lo, occ_hi, bmin,
                    active.astype(jnp.int32), hit, it + 1, hvox)

        st = (point, tsect, tmin, tsize, level, occ_lo, occ_hi, bmin,
              active.astype(jnp.int32), hit, jnp.int32(0), hvox)
        st = jax.lax.while_loop(cond, body, st)
        hit_ref[:] = st[9]
        hvox_ref[:] = st[11]

    return kernel


@functools.partial(jax.jit, static_argnames=("n_levels", "bases", "dims", "size", "interpret"))
def traverse_tiles(origins, dirs, occ_pairs, n_levels, bases, dims, size, interpret=True):
    """Trace rays with the tile kernel.  ``bases``/``dims`` as tuples."""
    R = origins.shape[0]
    padded = ((R + TILE - 1) // TILE) * TILE
    if padded != R:
        pad = padded - R
        origins = jnp.concatenate([origins, jnp.zeros((pad, 3), origins.dtype)])
        dirs = jnp.concatenate([dirs, jnp.ones((pad, 3), dirs.dtype)])
    kernel = make_kernel(n_levels, list(bases), list(dims), float(size))
    grid = padded // TILE
    hit, hvox = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((padded,), jnp.int32),
            jax.ShapeDtypeStruct((padded, 3), jnp.int32),
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((TILE, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full pyramid
        ],
        out_specs=(
            pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((TILE,), jnp.int32),
            pltpu.VMEM((TILE, 2), jnp.uint32),
        ],
        interpret=interpret,
    )(origins, dirs, occ_pairs)
    return hit[:R] != 0, hvox[:R]
