"""Gather-minimal renderer tuned for the TPU memory system.

On TPU, random gathers execute on the scalar core (~6 ns/element) while
vector math is nearly free — so this renderer restructures the wavefront
automaton (see :mod:`voxelhex_tpu.render.wavefront`) to touch memory as
rarely as possible:

* **bitmap bricks** — for ``brick_dim <= 4`` a brick's 64-bit occupancy word
  pair IS its full-resolution voxel mask; the in-brick DDA becomes pure
  register bit tests (zero gathers per cell), with the word pair fetched once
  per brick entry;
* **meta-in-descriptor** — internal child entries carry the child's
  leaf/uniform bits (bits 28/29), so node metadata needs no separate gather;
  the node stack stores the packed entries, making POP gather-free;
* **fused occupancy row** — one row gather yields both occupancy words;
* **deferred shading** — the march records (brick, cell); voxel color is
  resolved with a single gather per ray after the loop;
* **multi-substep unrolling** — brick/advance steps are arithmetic-only, so
  several run per gather-bearing iteration;
* optional **half-res depth prepass** giving full-res rays a head start
  (reference: src/raytracing/bevy/viewport_render.wgsl:184-203, 702-726).

Falls back to per-cell voxel gathers for ``brick_dim > 4``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from voxelhex_tpu.constants import BOX_NODE_CHILDREN_COUNT, BOX_NODE_DIMENSION
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
from voxelhex_tpu.tree.flat import EMPTY_DESC, SOLID_FLAG, FlatTree

F32 = jnp.float32
I32 = jnp.int32
U32 = jnp.uint32

OOB = BOX_NODE_CHILDREN_COUNT
_BIG = jnp.float32(1e30)

PH_NODE = 0
PH_BRICK = 1
PH_DONE = 2

META_SHIFT = 28
KEY_MASK = (1 << META_SHIFT) - 1

_MASK_LO, _MASK_HI = ray_occupancy_masks_u32()


def pack_device_tree(flat: FlatTree) -> dict:
    """Device arrays with child-meta packed into internal node entries."""
    if flat.bricks.shape[0] == 0:
        flat = flat.with_padding(node_multiple=1, brick_multiple=1)
    children = flat.node_children.astype(np.int64).copy()
    meta = flat.node_meta.astype(np.int64)
    n = children.shape[0]
    internal = (meta & 1) == 0
    for key in np.nonzero(internal)[0]:
        row = children[key]
        valid = row >= 0
        child_keys = np.clip(row[valid], 0, n - 1)
        row[valid] = row[valid] | (meta[child_keys] << META_SHIFT)
        children[key] = row
    assert flat.brick_ocbits is not None, "flat snapshot missing brick_ocbits"
    return {
        "node_children": jnp.asarray(children.astype(np.int32)),
        "node_ocbits": jnp.asarray(flat.node_ocbits, dtype=U32),
        "bricks": jnp.asarray(flat.bricks, dtype=I32),
        "brick_ocbits": jnp.asarray(flat.brick_ocbits, dtype=U32),
        "palette": jnp.asarray(flat.palette, dtype=F32),
        "size": jnp.asarray(float(flat.size), dtype=F32),
        "root_meta": jnp.asarray(int(flat.node_meta[0]), dtype=I32),
    }


def make_fast_tracer(
    brick_dim: int,
    max_iters: int = 4096,
    max_restarts: int = 8,
    brick_substeps: int = 4,
    advance_substeps: int = 2,
):
    d = brick_dim
    bitmap_mode = d <= 4
    bit_scale = 4 // d if bitmap_mode else 1

    def trace(tree, o, dirv, start_t=None):
        R = o.shape[0]
        size = tree["size"]
        mask_lo_t = jnp.asarray(_MASK_LO)
        mask_hi_t = jnp.asarray(_MASK_HI)

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
            enter = jnp.clip(
                jnp.maximum(enter, start_t), 0.0, jnp.maximum(tmax_r - 1e-3, 0.0)
            )
        point = o + dirv * enter[:, None]

        tsect = jnp.where(
            root_hit, _offset_sectant_v(point, jnp.full(R, size)), OOB
        ).astype(I32)

        cur_min = jnp.zeros((R, 3), dtype=F32)
        cur_size = jnp.full(R, size, dtype=F32)
        tmin = _sectant_offset_v(jnp.clip(tsect, 0, 63)) * cur_size[:, None]
        tsize = cur_size / BOX_NODE_DIMENSION

        root_entry = jnp.broadcast_to(tree["root_meta"] << META_SHIFT, (R,)).astype(I32)
        stack = jnp.zeros((R, 4), dtype=I32)
        stack = stack.at[:, 0].set(root_entry)
        head = jnp.zeros(R, dtype=I32)
        count = jnp.where(root_hit, 1, 0).astype(I32)
        cur_entry = root_entry  # key | meta << 28
        probed = jnp.zeros(R, dtype=jnp.bool_)
        force_pop = jnp.zeros(R, dtype=jnp.bool_)
        restarts = jnp.zeros(R, dtype=I32)

        phase = jnp.where(root_hit, PH_NODE, PH_DONE).astype(I32)

        b_lo = jnp.zeros(R, dtype=U32)
        b_hi = jnp.zeros(R, dtype=U32)
        bidx = jnp.zeros(R, dtype=I32)
        bcell = jnp.zeros((R, 3), dtype=I32)
        bmin = jnp.zeros((R, 3), dtype=F32)
        bsize = jnp.ones(R, dtype=F32)
        b_uniform = jnp.zeros(R, dtype=jnp.bool_)

        hit = jnp.zeros(R, dtype=jnp.bool_)
        hsolid = jnp.full(R, EMPTY_DESC, dtype=I32)
        hbrick = jnp.full(R, -1, dtype=I32)
        hcell = jnp.full(R, -1, dtype=I32)
        hnormal = jnp.zeros((R, 3), dtype=F32)

        state = (point, tsect, cur_min, cur_size, tmin, tsize, stack, head,
                 count, cur_entry, probed, force_pop, restarts, phase,
                 b_lo, b_hi, bidx, bcell, bmin, bsize, b_uniform,
                 hit, hsolid, hbrick, hcell, hnormal, jnp.int32(0))

        def cond(state):
            phase, it = state[13], state[26]
            return jnp.any(phase != PH_DONE) & (it < max_iters)

        def brick_bit(lo, hi, cell):
            b = (
                cell[:, 0] * bit_scale
                + cell[:, 1] * bit_scale * 4
                + cell[:, 2] * bit_scale * 16
            )
            return _occ_bit_v(lo, hi, b) != 0

        def body(state):
            (point, tsect, cur_min, cur_size, tmin, tsize, stack, head,
             count, cur_entry, probed, force_pop, restarts, phase,
             b_lo, b_hi, bidx, bcell, bmin, bsize, b_uniform,
             hit, hsolid, hbrick, hcell, hnormal, it) = state

            in_node = phase == PH_NODE
            in_brick = phase == PH_BRICK

            # ---------------- BRICK phase: bitmap march, no gathers --------
            unit = bsize / d
            marching = in_brick
            if bitmap_mode:
                for _ in range(brick_substeps):
                    inb = jnp.all((bcell >= 0) & (bcell < d), axis=-1)
                    found = marching & inb & brick_bit(b_lo, b_hi, bcell)
                    cell_min = bmin + bcell.astype(F32) * unit[:, None]
                    new_p, step = _dda_step_v(dirv, sf, point, cell_min, unit)
                    bnormal = _impact_normal_v(cell_min, unit, point)
                    hit = hit | found
                    flat_cell = bcell[:, 0] + bcell[:, 1] * d + bcell[:, 2] * d * d
                    hbrick = jnp.where(found, bidx, hbrick)
                    hcell = jnp.where(found, flat_cell, hcell)
                    hnormal = jnp.where(found[:, None], bnormal, hnormal)
                    b_exit0 = marching & (~inb)
                    go = marching & (~found) & inb
                    point = jnp.where(go[:, None], new_p, point)
                    bcell = jnp.where(go[:, None], bcell + step.astype(I32), bcell)
                    phase = jnp.where(found, PH_DONE, phase)
                    phase = jnp.where(b_exit0, PH_NODE, phase)
                    probed = probed | b_exit0
                    force_pop = force_pop | (b_exit0 & b_uniform)
                    marching = go
            else:
                # general mode: one voxel gather per cell step
                inb = jnp.all((bcell >= 0) & (bcell < d), axis=-1)
                flat_cell = bcell[:, 0] + bcell[:, 1] * d + bcell[:, 2] * d * d
                bvox = tree["bricks"][
                    jnp.clip(bidx, 0, tree["bricks"].shape[0] - 1),
                    jnp.clip(flat_cell, 0, d * d * d - 1),
                ]
                found = marching & inb & (bvox != EMPTY_DESC)
                cell_min = bmin + bcell.astype(F32) * unit[:, None]
                new_p, step = _dda_step_v(dirv, sf, point, cell_min, unit)
                bnormal = _impact_normal_v(cell_min, unit, point)
                hit = hit | found
                hbrick = jnp.where(found, bidx, hbrick)
                hcell = jnp.where(found, flat_cell, hcell)
                hnormal = jnp.where(found[:, None], bnormal, hnormal)
                b_exit0 = marching & (~inb)
                go = marching & (~found) & inb
                point = jnp.where(go[:, None], new_p, point)
                bcell = jnp.where(go[:, None], bcell + step.astype(I32), bcell)
                phase = jnp.where(found, PH_DONE, phase)
                phase = jnp.where(b_exit0, PH_NODE, phase)
                probed = probed | b_exit0
                force_pop = force_pop | (b_exit0 & b_uniform)

            # ---------------- NODE phase ----------------
            cur_key = cur_entry & KEY_MASK
            is_leaf = ((cur_entry >> META_SHIFT) & 1) != 0
            is_uniform = ((cur_entry >> META_SHIFT) & 2) != 0

            ocrow = tree["node_ocbits"][cur_key]  # [R, 2] one row gather
            occ_lo, occ_hi = ocrow[:, 0], ocrow[:, 1]

            tsect_c = jnp.clip(tsect, 0, 63)
            desc = tree["node_children"][cur_key, tsect_c]

            can_probe = in_node & is_leaf & (tsect < OOB) & (~probed)
            desc_solid = (desc != EMPTY_DESC) & ((desc & SOLID_FLAG) != 0)
            desc_parted = (desc != EMPTY_DESC) & ((desc & SOLID_FLAG) == 0)

            p_bmin = jnp.where(
                is_uniform[:, None],
                cur_min,
                cur_min + _sectant_offset_v(tsect_c) * cur_size[:, None],
            )
            p_bsize = jnp.where(is_uniform, cur_size, cur_size / BOX_NODE_DIMENSION)

            s_hit = can_probe & desc_solid
            s_normal = _impact_normal_v(p_bmin, p_bsize, point)
            hit = hit | s_hit
            hsolid = jnp.where(s_hit, desc & (SOLID_FLAG - 1), hsolid)
            hbrick = jnp.where(s_hit, -1, hbrick)
            hcell = jnp.where(s_hit, -1, hcell)
            hnormal = jnp.where(s_hit[:, None], s_normal, hnormal)
            phase = jnp.where(s_hit, PH_DONE, phase)

            enter_brick = can_probe & desc_parted
            safe_bidx = jnp.clip(desc, 0, tree["brick_ocbits"].shape[0] - 1)
            borow = tree["brick_ocbits"][safe_bidx]  # [R, 2] one row gather
            rel = (point - p_bmin) * d / p_bsize[:, None]
            start_cell = jnp.clip(rel.astype(I32), 0, d - 1)
            b_lo = jnp.where(enter_brick, borow[:, 0], b_lo)
            b_hi = jnp.where(enter_brick, borow[:, 1], b_hi)
            bidx = jnp.where(enter_brick, jnp.maximum(desc, 0), bidx)
            bcell = jnp.where(enter_brick[:, None], start_cell, bcell)
            bmin = jnp.where(enter_brick[:, None], p_bmin, bmin)
            bsize = jnp.where(enter_brick, p_bsize, bsize)
            b_uniform = jnp.where(enter_brick, is_uniform, b_uniform)
            phase = jnp.where(enter_brick, PH_BRICK, phase)

            probe_missed_now = can_probe & (desc == EMPTY_DESC)
            force_pop = force_pop | (probe_missed_now & is_uniform)
            probed = probed | probe_missed_now

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
            want_pop = decide & (force_pop | (tsect >= OOB) | occ_zero | no_overlap)
            occ_target = _occ_bit_v(occ_lo, occ_hi, tsect) != 0
            want_push = decide & (~want_pop) & (~is_leaf) & occ_target & (tsect < OOB)
            want_adv = decide & (~want_pop) & (~want_push)

            # --- POP (gather-free: parent entry lives in the stack)
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
            pop_entry = stack[jnp.arange(R), pop_head]

            # --- PUSH
            push_entry = desc
            push_cur_min = tmin
            push_cur_size = tsize
            push_ts = _offset_sectant_v(point - push_cur_min, push_cur_size)
            push_tmin = push_cur_min + _sectant_offset_v(push_ts) * push_cur_size[:, None]
            push_tsize = push_cur_size / BOX_NODE_DIMENSION
            push_head = jnp.mod(head + 1, 4)
            push_count = jnp.minimum(count + 1, 4)

            # --- ADVANCE: several arithmetic substeps
            adv_ts = tsect
            adv_tmin = tmin
            adv_p = point
            adv_go = want_adv
            for _ in range(advance_substeps):
                a_new_p, a_step = _dda_step_v(dirv, sf, adv_p, adv_tmin, tsize)
                a_ts = _step_sectant_v(adv_ts, a_step)
                a_tmin = jnp.where(
                    (a_ts < OOB)[:, None], adv_tmin + a_step * tsize[:, None], adv_tmin
                )
                adv_p = jnp.where(adv_go[:, None], a_new_p, adv_p)
                adv_ts2 = jnp.where(adv_go, a_ts, adv_ts)
                adv_tmin = jnp.where(adv_go[:, None], a_tmin, adv_tmin)
                adv_ts = adv_ts2
                stop = (adv_ts >= OOB) | (_occ_bit_v(occ_lo, occ_hi, adv_ts) != 0)
                adv_go = adv_go & (~stop)

            point = jnp.where(want_pop[:, None], pop_new_p, point)
            point = jnp.where(want_adv[:, None], adv_p, point)

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

            cur_entry = jnp.where(want_pop & (pop_count > 0), pop_entry, cur_entry)
            cur_entry = jnp.where(want_push, push_entry, cur_entry)

            head = jnp.where(want_pop, pop_head, head)
            head = jnp.where(want_push, push_head, head)
            count = jnp.where(want_pop, pop_count, count)
            count = jnp.where(want_push, push_count, count)
            stack = stack.at[jnp.arange(R), push_head].set(
                jnp.where(want_push, push_entry, stack[jnp.arange(R), push_head])
            )

            moved = want_pop | want_push | want_adv
            probed = probed & (~moved)
            force_pop = force_pop & (~moved)

            exhausted = (phase == PH_NODE) & (count <= 0)
            re_point = point + dirv * 0.1
            inside = jnp.all((re_point > 0.0) & (re_point < size), axis=-1)
            can_restart = exhausted & inside & (restarts < max_restarts)
            point = jnp.where(exhausted[:, None], re_point, point)
            restarts = restarts + exhausted.astype(I32)

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
            cur_entry = jnp.where(can_restart, root_entry, cur_entry)
            stack = jnp.where(
                can_restart[:, None],
                jnp.zeros_like(stack).at[:, 0].set(root_entry),
                stack,
            )
            probed = probed & (~can_restart)
            force_pop = force_pop & (~can_restart)
            phase = jnp.where(exhausted & (~can_restart), PH_DONE, phase)

            return (point, tsect, cur_min, cur_size, tmin, tsize, stack, head,
                    count, cur_entry, probed, force_pop, restarts, phase,
                    b_lo, b_hi, bidx, bcell, bmin, bsize, b_uniform,
                    hit, hsolid, hbrick, hcell, hnormal, it + 1)

        state = jax.lax.while_loop(cond, body, state)
        (point, *_rest) = state
        hit = state[21]
        hsolid = state[22]
        hbrick = state[23]
        hcell = state[24]
        hnormal = state[25]

        # deferred color resolve: one gather for parted hits
        parted_hit = hit & (hbrick >= 0)
        bvox = tree["bricks"][
            jnp.clip(hbrick, 0, tree["bricks"].shape[0] - 1),
            jnp.clip(hcell, 0, d * d * d - 1),
        ]
        voxel = jnp.where(parted_hit, bvox, hsolid)
        return hit, voxel, hbrick, hcell, state[0], hnormal

    return trace


class FastRenderer:
    """Whole-frame renderer over the gather-minimal tracer, with an optional
    half-res depth prepass."""

    def __init__(self, flat: FlatTree, max_iters: int = 4096, prepass: bool = False):
        self.flat = flat
        self.tree = pack_device_tree(flat)
        self.brick_dim = flat.brick_dim
        self.prepass = prepass
        self._trace = make_fast_tracer(flat.brick_dim, max_iters=max_iters)
        self._trace_jit = jax.jit(self._trace)

        trace = self._trace

        @jax.jit
        def shade_batch(tree, origins, dirs, bg):
            hit, voxel, _hb, _hc, _hp, hnormal = trace(tree, origins, dirs)
            return _shade(tree, hit, voxel, hnormal, bg)

        self._shade_batch = shade_batch
        self._prepass_cache = {}

    def _prepass_fn(self, h2, w2):
        """Per-resolution jitted prepass renderer (shape must be static)."""
        key = (h2, w2)
        if key in self._prepass_cache:
            return self._prepass_cache[key]
        trace = self._trace

        @jax.jit
        def shade_batch_prepass(tree, origins, dirs, pre_o, pre_d, bg):
            """Half-res depth prepass -> full-res with head start."""
            p_hit, _v, _hb, _hc, p_point, _n = trace(tree, pre_o, pre_d)
            depth = jnp.where(
                p_hit,
                jnp.linalg.norm(p_point - pre_o, axis=-1),
                0.0,  # conservative: unknown depth -> start from entry
            ).reshape(h2, w2)
            # min over the 2x2 neighborhood (cheap via pooling)
            dpad = jnp.pad(depth, ((0, 1), (0, 1)), mode="edge")
            dmin = jnp.minimum(
                jnp.minimum(dpad[:-1, :-1], dpad[1:, :-1]),
                jnp.minimum(dpad[:-1, 1:], dpad[1:, 1:]),
            )
            # upsample to full res and give a safety margin
            start = jnp.repeat(jnp.repeat(dmin, 2, axis=0), 2, axis=1)
            start = jnp.maximum(start.reshape(-1) - 2.0, 0.0)
            hit, voxel, _hb2, _hc2, _hp2, hnormal = trace(
                tree, origins, dirs, start_t=start
            )
            return _shade(tree, hit, voxel, hnormal, bg)

        self._prepass_cache[key] = shade_batch_prepass
        return shade_batch_prepass

    def trace(self, origins, directions):
        o = jnp.asarray(origins, dtype=F32).reshape(-1, 3)
        dv = jnp.asarray(directions, dtype=F32).reshape(-1, 3)
        return self._trace_jit(self.tree, o, dv)

    def render(self, camera, bg=(0.0, 0.0, 0.0)):
        origins, dirs = camera.rays()
        h, w = origins.shape[:2]
        o = jnp.asarray(origins.reshape(-1, 3))
        dv = jnp.asarray(dirs.reshape(-1, 3))
        bg = jnp.asarray(bg, dtype=F32)
        if self.prepass and h % 2 == 0 and w % 2 == 0:
            from voxelhex_tpu.render.camera import Camera

            half_cam = Camera(
                origin=camera.origin,
                target=camera.target,
                up=camera.up,
                fov_y_deg=camera.fov_y_deg,
                resolution=(w // 2, h // 2),
            )
            po, pd = half_cam.rays()
            rgb = self._prepass_fn(h // 2, w // 2)(
                self.tree,
                o,
                dv,
                jnp.asarray(po.reshape(-1, 3)),
                jnp.asarray(pd.reshape(-1, 3)),
                bg,
            )
        else:
            rgb = self._shade_batch(self.tree, o, dv, bg)
        return np.asarray(rgb).reshape(h, w, 3)
