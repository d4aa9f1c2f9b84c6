"""Wavefront renderer: the ray-march automaton as ONE flat batched loop.

Instead of vmapping a scalar tracer full of nested ``while``/``cond`` (which
compiles slowly and serializes divergent lanes), the whole ray batch advances
in lock-step through a single ``lax.while_loop`` whose body is pure vectorized
math + a handful of gathers.  Every ray carries a phase:

* ``NODE``  — one PUSH/POP/ADVANCE automaton step (reference:
  src/raytracing/cpu.rs:296-458);
* ``BRICK`` — one in-brick DDA cell step (reference: cpu.rs:136-232);
* ``DONE``  — hit found or ray exhausted.

Per iteration each lane performs exactly one phase's work; control flow is
``jnp.where`` masking — the natural shape for the TPU VPU and the blueprint
for the Pallas kernel.  Traversal state per ray: the 4-deep wrap-around node
stack, current/target bounds, sectant, brick cursor and hit registers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from voxelhex_tpu.constants import BOX_NODE_CHILDREN_COUNT, BOX_NODE_DIMENSION
from voxelhex_tpu.render.jax_renderer import device_tree, _shade
from voxelhex_tpu.spatial.luts import ray_occupancy_masks_u32
from voxelhex_tpu.tree.flat import EMPTY_DESC, SOLID_FLAG, FlatTree

F32 = jnp.float32
I32 = jnp.int32
U32 = jnp.uint32

OOB = BOX_NODE_CHILDREN_COUNT
_BIG = jnp.float32(1e30)

PH_NODE = 0
PH_BRICK = 1
PH_DONE = 2

_MASK_LO, _MASK_HI = ray_occupancy_masks_u32()


def _offset_sectant_v(offset, size):
    """[R,3],[R] -> [R] sectant indices."""
    idx = jnp.clip(
        jnp.floor(offset * BOX_NODE_DIMENSION / size[:, None]),
        0,
        BOX_NODE_DIMENSION - 1,
    ).astype(I32)
    return idx[:, 0] + idx[:, 1] * 4 + idx[:, 2] * 16


def _sectant_offset_v(sectant):
    """[R] -> [R,3] relative offsets."""
    return (
        jnp.stack([sectant % 4, (sectant // 4) % 4, sectant // 16], axis=-1).astype(F32)
        * 0.25
    )


def _step_sectant_v(sectant, step):
    s = jnp.sign(step).astype(I32)
    x = sectant % 4 + s[:, 0]
    y = (sectant // 4) % 4 + s[:, 1]
    z = sectant // 16 + s[:, 2]
    inside = (x >= 0) & (x < 4) & (y >= 0) & (y < 4) & (z >= 0) & (z < 4)
    return jnp.where(inside, x + y * 4 + z * 16, OOB)


def _dda_step_v(d, sf, point, cell_min, cell_size):
    """[R,*] DDA step; returns (new_point, step [R,3])."""
    signum = jnp.sign(d)
    steps_needed = cell_size[:, None] * jnp.maximum(signum, 0.0) - signum * (
        point - cell_min
    )
    dists = jnp.abs(steps_needed * sf)
    dists = jnp.where(d == 0.0, _BIG, dists)
    dists = jnp.where(jnp.isnan(dists), _BIG, dists)
    min_step = jnp.min(dists, axis=-1, keepdims=True)
    new_point = point + d * min_step
    step = jnp.where(dists == min_step, signum, 0.0)
    return new_point, step


def _impact_normal_v(cell_min, cell_size, point):
    mid_to_impact = cell_min + cell_size[:, None] / 2.0 - point
    a = jnp.abs(mid_to_impact)
    m = jnp.max(a, axis=-1, keepdims=True)
    n = jnp.where(a == m, -mid_to_impact, 0.0)
    norm = jnp.sqrt(jnp.sum(n * n, axis=-1, keepdims=True))
    return n / jnp.maximum(norm, 1e-12)


def _occ_bit_v(lo, hi, sectant):
    s = jnp.clip(sectant, 0, 63)
    word = jnp.where(s < 32, lo, hi)
    return (word >> (s % 32).astype(U32)) & U32(1)


def make_wavefront_tracer(brick_dim: int, max_iters: int = 4096, max_restarts: int = 8):
    """Build ``trace(tree, origins, dirs) -> (hit, voxel, brick, cell, point,
    normal)`` operating on [R]-batched rays."""
    d = brick_dim

    def trace(tree, o, dirv):
        R = o.shape[0]
        size = tree["size"]
        mask_lo_t = jnp.asarray(_MASK_LO)  # [64, 8]
        mask_hi_t = jnp.asarray(_MASK_HI)

        # per-ray constants
        with jax.numpy_dtype_promotion("standard"):
            sf = jnp.stack(
                [
                    jnp.sqrt(
                        1.0
                        + (dirv[:, 2] / dirv[:, 0]) ** 2
                        + (dirv[:, 1] / dirv[:, 0]) ** 2
                    ),
                    jnp.sqrt(
                        (dirv[:, 0] / dirv[:, 1]) ** 2
                        + 1.0
                        + (dirv[:, 2] / dirv[:, 1]) ** 2
                    ),
                    jnp.sqrt(
                        (dirv[:, 0] / dirv[:, 2]) ** 2
                        + (dirv[:, 1] / dirv[:, 2]) ** 2
                        + 1.0
                    ),
                ],
                axis=-1,
            )
        octant = (
            (dirv[:, 0] >= 0).astype(I32)
            + (dirv[:, 2] >= 0).astype(I32) * 2
            + (dirv[:, 1] >= 0).astype(I32) * 4
        )

        # root intersection
        t_lo = (0.0 - o) / dirv
        t_hi = (size - o) / dirv
        per_min = jnp.fmin(t_lo, t_hi)
        per_max = jnp.fmax(t_lo, t_hi)
        tmin_r = jnp.fmax(jnp.fmax(per_min[:, 0], per_min[:, 1]), per_min[:, 2])
        tmax_r = jnp.fmin(jnp.fmin(per_max[:, 0], per_max[:, 1]), per_max[:, 2])
        root_hit = ~((tmax_r < 0.0) | (tmin_r > tmax_r))
        enter = jnp.maximum(tmin_r, 0.0)
        point = o + dirv * enter[:, None]

        tsect = jnp.where(
            root_hit, _offset_sectant_v(point, jnp.full(R, size)), OOB
        ).astype(I32)

        cur_min = jnp.zeros((R, 3), dtype=F32)
        cur_size = jnp.full(R, size, dtype=F32)
        tmin = _sectant_offset_v(jnp.clip(tsect, 0, 63)) * cur_size[:, None]
        tsize = cur_size / BOX_NODE_DIMENSION

        stack = jnp.zeros((R, 4), dtype=I32)
        head = jnp.zeros(R, dtype=I32)
        count = jnp.where(root_hit, 1, 0).astype(I32)
        cur_key = jnp.zeros(R, dtype=I32)
        probed = jnp.zeros(R, dtype=jnp.bool_)
        force_pop = jnp.zeros(R, dtype=jnp.bool_)
        restarts = jnp.zeros(R, dtype=I32)

        phase = jnp.where(root_hit, PH_NODE, PH_DONE).astype(I32)

        # brick cursor
        bidx = jnp.zeros(R, dtype=I32)  # brick pool row
        bcell = jnp.zeros((R, 3), dtype=I32)
        bmin = jnp.zeros((R, 3), dtype=F32)
        bsize = jnp.ones(R, dtype=F32)
        b_uniform = jnp.zeros(R, dtype=jnp.bool_)

        # results
        hit = jnp.zeros(R, dtype=jnp.bool_)
        voxel = jnp.full(R, EMPTY_DESC, dtype=I32)
        hbrick = jnp.full(R, -1, dtype=I32)
        hcell = jnp.full(R, -1, dtype=I32)
        hnormal = jnp.zeros((R, 3), dtype=F32)

        state = (point, tsect, cur_min, cur_size, tmin, tsize, stack, head,
                 count, cur_key, probed, force_pop, restarts, phase,
                 bidx, bcell, bmin, bsize, b_uniform,
                 hit, voxel, hbrick, hcell, hnormal, jnp.int32(0))

        def cond(state):
            phase, it = state[13], state[24]
            return jnp.any(phase != PH_DONE) & (it < max_iters)

        def body(state):
            (point, tsect, cur_min, cur_size, tmin, tsize, stack, head,
             count, cur_key, probed, force_pop, restarts, phase,
             bidx, bcell, bmin, bsize, b_uniform,
             hit, voxel, hbrick, hcell, hnormal, it) = state

            in_node = phase == PH_NODE
            in_brick = phase == PH_BRICK

            # ---------------- BRICK phase: one DDA cell step ----------------
            inb = jnp.all((bcell >= 0) & (bcell < d), axis=-1)
            flat = bcell[:, 0] + bcell[:, 1] * d + bcell[:, 2] * d * d
            bvox = tree["bricks"][
                jnp.clip(bidx, 0, tree["bricks"].shape[0] - 1),
                jnp.clip(flat, 0, d * d * d - 1),
            ]
            b_found = in_brick & inb & (bvox != EMPTY_DESC)
            b_exit = in_brick & (~inb)

            unit = bsize / d
            cell_min = bmin + bcell.astype(F32) * unit[:, None]
            new_p_b, step_b = _dda_step_v(dirv, sf, point, cell_min, unit)

            # record hits from brick march
            bnormal = _impact_normal_v(cell_min, unit, point)
            hit = hit | b_found
            voxel = jnp.where(b_found, bvox, voxel)
            hbrick = jnp.where(b_found, bidx, hbrick)
            hcell = jnp.where(b_found, flat, hcell)
            hnormal = jnp.where(b_found[:, None], bnormal, hnormal)

            # advance brick cursor for continuing lanes
            b_go = in_brick & (~b_found) & inb
            point = jnp.where(b_go[:, None], new_p_b, point)
            bcell = jnp.where(b_go[:, None], bcell + step_b.astype(I32), bcell)

            # lanes leaving the brick: back to NODE with probed flag
            phase = jnp.where(b_found, PH_DONE, phase)
            phase = jnp.where(b_exit, PH_NODE, phase)
            probed = probed | b_exit
            force_pop = force_pop | (b_exit & b_uniform)

            # ---------------- NODE phase: one automaton step ----------------
            top = stack[jnp.arange(R), head]
            occ_lo = tree["node_ocbits"][top, 0]
            occ_hi = tree["node_ocbits"][top, 1]
            meta = tree["node_meta"][cur_key]
            is_leaf = (meta & U32(1)) != 0
            is_uniform = (meta & U32(2)) != 0

            tsect_c = jnp.clip(tsect, 0, 63)
            desc = tree["node_children"][cur_key, tsect_c]

            # probe decision (only once per (node, sectant) visit)
            can_probe = in_node & is_leaf & (tsect < OOB) & (~probed)
            desc_solid = (desc != EMPTY_DESC) & ((desc & SOLID_FLAG) != 0)
            desc_parted = (desc != EMPTY_DESC) & ((desc & SOLID_FLAG) == 0)

            p_bmin = jnp.where(
                is_uniform[:, None],
                cur_min,
                cur_min + _sectant_offset_v(tsect_c) * cur_size[:, None],
            )
            p_bsize = jnp.where(is_uniform, cur_size, cur_size / BOX_NODE_DIMENSION)

            # solid hit
            s_hit = can_probe & desc_solid
            s_normal = _impact_normal_v(p_bmin, p_bsize, point)
            hit = hit | s_hit
            voxel = jnp.where(s_hit, desc & (~SOLID_FLAG), voxel)
            hbrick = jnp.where(s_hit, -1, hbrick)
            hcell = jnp.where(s_hit, -1, hcell)
            hnormal = jnp.where(s_hit[:, None], s_normal, hnormal)
            phase = jnp.where(s_hit, PH_DONE, phase)

            # parted: enter BRICK phase
            enter_brick = can_probe & desc_parted
            rel = (point - p_bmin) * d / p_bsize[:, None]
            start_cell = jnp.clip(rel.astype(I32), 0, d - 1)
            bidx = jnp.where(enter_brick, jnp.maximum(desc, 0), bidx)
            bcell = jnp.where(enter_brick[:, None], start_cell, bcell)
            bmin = jnp.where(enter_brick[:, None], p_bmin, bmin)
            bsize = jnp.where(enter_brick, p_bsize, bsize)
            b_uniform = jnp.where(enter_brick, is_uniform, b_uniform)
            phase = jnp.where(enter_brick, PH_BRICK, phase)

            # empty probe result on a uniform leaf forces a POP
            probe_missed_now = can_probe & (desc == EMPTY_DESC)
            force_pop = force_pop | (probe_missed_now & is_uniform)
            probed = probed | probe_missed_now

            # lanes still in NODE phase now decide POP / PUSH / ADVANCE
            decide = (
                in_node
                & (phase == PH_NODE)
                & (~enter_brick)
                & (~s_hit)
                & ((~can_probe) | probe_missed_now)
            )

            occ_zero = (occ_lo == 0) & (occ_hi == 0)
            m_lo = mask_lo_t[tsect_c, octant]
            m_hi = mask_hi_t[tsect_c, octant]
            no_overlap = ((occ_lo & m_lo) == 0) & ((occ_hi & m_hi) == 0)
            # leaf nodes whose brick at tsect was probed&missed don't force a
            # pop unless uniform; the occupancy tests below handle them
            want_pop = decide & (
                force_pop | (tsect >= OOB) | occ_zero | no_overlap
            )
            occ_target = _occ_bit_v(occ_lo, occ_hi, tsect) != 0
            want_push = decide & (~want_pop) & (~is_leaf) & occ_target & (tsect < OOB)
            want_adv = decide & (~want_pop) & (~want_push)

            # --- POP
            pop_count = count - 1
            pop_head = jnp.mod(head - 1, 4)
            pop_tmin = cur_min
            pop_tsize = cur_size
            pop_cur_size = cur_size * BOX_NODE_DIMENSION
            pop_cur_min = cur_min - jnp.mod(cur_min, pop_cur_size[:, None])
            pop_ts0 = _offset_sectant_v(
                pop_tmin + pop_tsize[:, None] / 2.0 - pop_cur_min, pop_cur_size
            )
            pop_new_p, pop_step = _dda_step_v(dirv, sf, point, pop_tmin, pop_tsize)
            pop_ts = _step_sectant_v(pop_ts0, pop_step)
            pop_tmin2 = pop_tmin + pop_step * pop_tsize[:, None]
            pop_key = stack[jnp.arange(R), pop_head]

            # --- PUSH
            push_key = desc  # children array holds node keys for internals
            push_cur_min = tmin
            push_cur_size = tsize
            push_ts = _offset_sectant_v(point - push_cur_min, push_cur_size)
            push_tmin = (
                push_cur_min + _sectant_offset_v(push_ts) * push_cur_size[:, None]
            )
            push_tsize = push_cur_size / BOX_NODE_DIMENSION
            push_head = jnp.mod(head + 1, 4)
            push_count = jnp.minimum(count + 1, 4)

            # --- ADVANCE (single step; loop re-evaluates next iteration)
            adv_new_p, adv_step = _dda_step_v(dirv, sf, point, tmin, tsize)
            adv_ts = _step_sectant_v(tsect, adv_step)
            adv_tmin = jnp.where(
                (adv_ts < OOB)[:, None], tmin + adv_step * tsize[:, None], tmin
            )

            # apply transitions
            point = jnp.where(want_pop[:, None], pop_new_p, point)
            point = jnp.where(want_adv[:, None], adv_new_p, point)

            tsect = jnp.where(want_pop, pop_ts, tsect)
            tsect = jnp.where(want_push, push_ts, tsect)
            tsect = jnp.where(want_adv, adv_ts, tsect)

            tmin = jnp.where(want_pop[:, None], pop_tmin2, tmin)
            tmin = jnp.where(want_push[:, None], push_tmin, tmin)
            tmin = jnp.where(want_adv[:, None], adv_tmin, tmin)

            tsize = jnp.where(want_pop, pop_tsize, tsize)
            tsize = jnp.where(want_push, push_tsize, tsize)

            cur_min = jnp.where(want_pop[:, None], pop_cur_min, cur_min)
            cur_min = jnp.where(want_push[:, None], push_cur_min, cur_min)
            cur_size = jnp.where(want_pop, pop_cur_size, cur_size)
            cur_size = jnp.where(want_push, push_cur_size, cur_size)

            cur_key = jnp.where(want_pop & (pop_count > 0), pop_key, cur_key)
            cur_key = jnp.where(want_push, push_key, cur_key)

            head = jnp.where(want_pop, pop_head, head)
            head = jnp.where(want_push, push_head, head)
            count = jnp.where(want_pop, pop_count, count)
            count = jnp.where(want_push, push_count, count)
            stack = jnp.where(
                want_push[:, None],
                stack.at[jnp.arange(R), push_head].set(
                    jnp.where(want_push, push_key, stack[jnp.arange(R), push_head])
                ),
                stack,
            )

            # transitions clear the probe bookkeeping
            moved = want_pop | want_push | want_adv
            probed = probed & (~moved)
            force_pop = force_pop & (~moved)

            # ---------------- stack exhausted: restart or give up ----------
            exhausted = (phase == PH_NODE) & (count <= 0)
            re_point = point + dirv * 0.1
            inside = jnp.all((re_point > 0.0) & (re_point < size), axis=-1)
            can_restart = exhausted & inside & (restarts < max_restarts)
            point = jnp.where(exhausted[:, None], re_point, point)
            restarts = restarts + exhausted.astype(I32)

            # reinit for restarting lanes
            r_ts = _offset_sectant_v(point, jnp.full(R, size))
            tsect = jnp.where(can_restart, r_ts, tsect)
            cur_min = jnp.where(can_restart[:, None], jnp.zeros_like(cur_min), cur_min)
            cur_size = jnp.where(can_restart, size, cur_size)
            tmin = jnp.where(
                can_restart[:, None],
                _sectant_offset_v(jnp.clip(r_ts, 0, 63)) * size,
                tmin,
            )
            tsize = jnp.where(can_restart, size / BOX_NODE_DIMENSION, tsize)
            head = jnp.where(can_restart, 0, head)
            count = jnp.where(can_restart, 1, count)
            cur_key = jnp.where(can_restart, 0, cur_key)
            stack = jnp.where(can_restart[:, None], jnp.zeros_like(stack), stack)
            probed = probed & (~can_restart)
            force_pop = force_pop & (~can_restart)
            phase = jnp.where(exhausted & (~can_restart), PH_DONE, phase)

            return (point, tsect, cur_min, cur_size, tmin, tsize, stack, head,
                    count, cur_key, probed, force_pop, restarts, phase,
                    bidx, bcell, bmin, bsize, b_uniform,
                    hit, voxel, hbrick, hcell, hnormal, it + 1)

        state = jax.lax.while_loop(cond, body, state)
        (point, _tsect, _cm, _cs, _tm, _ts, _stk, _h, _c, _ck, _pr, _fp, _re,
         _ph, _bi, _bc, _bm, _bs, _bu, hit, voxel, hbrick, hcell,
         hnormal, _it) = state
        return hit, voxel, hbrick, hcell, point, hnormal

    return trace


class WavefrontRenderer:
    """Whole-frame renderer built on the flat batched tracer."""

    def __init__(self, flat: FlatTree, max_iters: int = 4096):
        self.flat = flat
        self.tree = device_tree(flat)
        self.brick_dim = flat.brick_dim
        self._trace = make_wavefront_tracer(flat.brick_dim, max_iters=max_iters)
        self._trace_jit = jax.jit(self._trace)

        trace = self._trace

        @jax.jit
        def shade_batch(tree, origins, dirs, bg):
            hit, voxel, _hb, _hc, _hp, hnormal = trace(tree, origins, dirs)
            return _shade(tree, hit, voxel, hnormal, bg)

        self._shade_batch = shade_batch

    def trace(self, origins, directions):
        o = jnp.asarray(origins, dtype=F32).reshape(-1, 3)
        dv = jnp.asarray(directions, dtype=F32).reshape(-1, 3)
        return self._trace_jit(self.tree, o, dv)

    def render(self, camera, bg=(0.0, 0.0, 0.0)):
        origins, dirs = camera.rays()
        h, w = origins.shape[:2]
        rgb = self._shade_batch(
            self.tree,
            jnp.asarray(origins.reshape(-1, 3)),
            jnp.asarray(dirs.reshape(-1, 3)),
            jnp.asarray(bg, dtype=F32),
        )
        return np.asarray(rgb).reshape(h, w, 3)
