"""Soft-occupancy differentiable rendering: transmittance compositing.

Extends the albedo-only differentiable path (:mod:`voxelhex_tpu.diff.render`)
with gradients w.r.t. **occupancy**: each ray records its first K occupied
voxels (multi-hit march), and the image is composited with soft per-voxel
opacities

    C = sum_i T_{i-1} * a_i * c_i + T_K * bg,   T_i = prod_{j<=i} (1 - a_j)

where ``a = sigmoid(occupancy_logit)``.  Pixel gradients then flow into both
the albedo and the opacity of every voxel on the ray — voxels that should
vanish are carved away by gradient descent (annealed carving).  Voxels that
do not yet exist receive no gradient through the plain path; use
:func:`with_candidates` to dilate the traced occupancy so the empty shell
around existing geometry is recorded with near-zero opacity — gradients can
then GROW geometry as well as carve it.

The multi-hit march reuses the BitGrid automaton: when a voxel is recorded
its bit is cleared in the *register copy* of the block's occupancy words, so
the ray marches on without re-testing it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from voxelhex_tpu.render import bitgrid as bgmod
from voxelhex_tpu.render.bitgrid import (
    COLOR_EMPTY,
    BitGrid,
    device_bitgrid,
)

F32 = jnp.float32
I32 = jnp.int32


@jax.custom_vjp
def _gather_rows_flatbwd(albedo, addr):
    """``albedo[addr]`` with a custom backward that scatters FLAT.

    Forward is the unchanged [R, K] row gather from the [N, 3] albedo grid
    (the fast layout — PERF.md "soft backward scatter layout").  The
    default VJP of that gather is an [N, 3] ROW scatter-add, measured at a
    9x per-element layout penalty vs a 1-D scatter (86 ms/step at 1080p).
    This backward instead scatter-adds the cotangent through a flat
    [N*3] buffer at indices ``addr*3 + component`` and reshapes once —
    same values, 1-D scatter lowering.
    """
    return albedo[addr]


def _gather_rows_flatbwd_fwd(albedo, addr):
    return albedo[addr], (addr, albedo.shape[0])


def _gather_rows_flatbwd_bwd(res, g):
    addr, n = res
    comp = jnp.arange(3, dtype=jnp.int32)
    flat_idx = (addr[..., None] * 3 + comp).reshape(-1)
    ga = (
        jnp.zeros(n * 3, dtype=g.dtype)
        .at[flat_idx]
        .add(g.reshape(-1))
        .reshape(n, 3)
    )
    return ga, None


_gather_rows_flatbwd.defvjp(_gather_rows_flatbwd_fwd, _gather_rows_flatbwd_bwd)


@jax.custom_vjp
def _gather_rows_flat_params(albedo_flat, addr):
    """Row gather from a FLAT [N*3] albedo with a flat backward.

    The end-to-end flat layout (PERF.md "soft backward scatter layout",
    VERDICT r3 next #6): with params stored flat, the VJP scatter-adds
    into [N*3] and returns it AS the gradient — the [3N]->[N,3] reshape
    copy of the ~200 MB cotangent that `_gather_rows_flatbwd` still pays
    (the priced ~60 ms/step residual) disappears, because the optimizer,
    clamps, checkpoint and sharding all consume the flat array directly.
    Forward is ``albedo_flat.reshape(-1, 3)[addr]`` — the reshape is a
    row-major view (element (i, c) at i*3+c), so the fast [R, K] row
    gather lowering is unchanged."""
    return albedo_flat.reshape(-1, 3)[addr]


def _gather_rows_flat_params_fwd(albedo_flat, addr):
    return albedo_flat.reshape(-1, 3)[addr], (addr, albedo_flat.shape[0])


def _gather_rows_flat_params_bwd(res, g):
    addr, n3 = res
    comp = jnp.arange(3, dtype=jnp.int32)
    flat_idx = (addr[..., None] * 3 + comp).reshape(-1)
    ga = jnp.zeros(n3, dtype=g.dtype).at[flat_idx].add(g.reshape(-1))
    return ga, None  # stays flat: no [3N]->[N,3] reshape copy


_gather_rows_flat_params.defvjp(
    _gather_rows_flat_params_fwd, _gather_rows_flat_params_bwd
)


def make_multihit_tracer(bg: BitGrid, max_hits: int = 4, max_iters: int = 2048):
    """``trace(tree, o, d) -> (hit_count [R], voxels [R,K,3], ts [R,K])``.

    Built on the single-hit automaton: run, record, clear the hit voxel's
    bit in the live register words, continue.
    """
    base = bgmod.make_bitgrid_tracer(bg, max_iters=max_iters)

    def trace(tree, o, dirv):
        R = o.shape[0]
        K = max_hits
        voxels = jnp.full((R, K, 3), -1, dtype=I32)
        dists = jnp.full((R, K), jnp.inf, dtype=F32)

        state = base.init(tree, o, dirv, None)

        def record(state, voxels, dists, k):
            state, _n_active = base.run(tree, state, max_iters)
            hit, hvox = state[11], state[12]
            point = state[0]
            voxels = voxels.at[:, k, :].set(jnp.where(hit[:, None], hvox, -1))
            d = jnp.linalg.norm(point - o, axis=-1)
            dists = dists.at[:, k].set(jnp.where(hit, d, jnp.inf))

            # resume: clear the recorded voxel's bit in the register words and
            # reactivate rays that hit
            tsect = state[1]
            occ_lo, occ_hi = state[5], state[6]
            s = jnp.clip(tsect, 0, 63)
            bit_lo = jnp.where(s < 32, jnp.uint32(1) << s.astype(jnp.uint32), 0)
            bit_hi = jnp.where(s >= 32, jnp.uint32(1) << (s - 32).astype(jnp.uint32), 0)
            occ_lo = jnp.where(hit, occ_lo & ~bit_lo, occ_lo)
            occ_hi = jnp.where(hit, occ_hi & ~bit_hi, occ_hi)
            active = state[10] | hit
            hit_new = jnp.zeros_like(hit)
            state = (state[0], state[1], state[2], state[3], state[4],
                     occ_lo, occ_hi, state[7], state[8], state[9],
                     active, hit_new) + tuple(state[12:])
            return state, voxels, dists

        for k in range(K):
            state, voxels, dists = record(state, voxels, dists, k)
        count = jnp.sum(voxels[:, :, 0] >= 0, axis=1)
        return count, voxels, dists

    return trace


class SoftRenderer:
    """Differentiable renderer over dense per-voxel (albedo, opacity) params."""

    def __init__(self, source, max_hits: int = 4, max_iters: int = 2048,
                 tracer: str = "stack", flat_albedo_bwd: bool = True,
                 flat_params: bool = True):
        bg = source if isinstance(source, BitGrid) else bgmod.build_bitgrid(source)
        self.bitgrid = bg
        self.tracer_kind = tracer
        # Route the albedo gather's backward through a flat 1-D scatter
        # (see _gather_rows_flatbwd); forward math is identical.
        self.flat_albedo_bwd = bool(flat_albedo_bwd)
        # END-TO-END flat albedo layout ([S^3*3] through composite, VJP,
        # optimizer, checkpoint, sharding): kills the [3N]->[N,3] reshape
        # copy of the 200 MB albedo cotangent that flat_albedo_bwd still
        # pays (see _gather_rows_flat_params).  DEFAULT since the TPU A/B
        # measured 1.12x on the full training step (724 -> 646 ms,
        # benches/ab_flat_params.py, grads bit-identical); pass
        # flat_params=False for the [S^3, 3] row layout — checkpoints and
        # external param consumers must agree with the choice.
        self.flat_params = bool(flat_params)
        self.tree = device_bitgrid(bg, skip_rows=(tracer == "skip"))
        self.size = int(bg.size)
        self.max_hits = int(max_hits)
        self._max_iters = int(max_iters)
        self._trace = jax.jit(make_multihit_tracer(bg, max_hits=max_hits,
                                                   max_iters=max_iters))
        self._compact_renderer = None
        self._grad_fns = {}
        self._grad_plans = {}  # R -> last ladder bucket (planned backward)

        K = self.max_hits

        def _hit_step(voxels, dists, state, orig, cursor, o_full):
            """Record this round's hits at each ray's cursor slot, clear the
            hit voxel's bit in the register words, and reactivate rays that
            still want more hits.  Returns the live count so the host round
            loop can compact on it — finished rays (missed, or K hits) are
            the ONLY rays compaction drops."""
            hit, hvox, point = state[11], state[12], state[0]
            kidx = jnp.clip(cursor, 0, K - 1)
            dnorm = jnp.linalg.norm(point - o_full[orig], axis=-1)
            row = jnp.where(hit, orig, voxels.shape[0])  # non-hit -> dropped
            voxels = voxels.at[row, kidx].set(hvox, mode="drop")
            dists = dists.at[row, kidx].set(dnorm, mode="drop")
            new_cursor = cursor + hit
            reactivate = hit & (new_cursor < K)

            if tracer == "skip":
                v, rows = state[1], state[2]
                w = v & 3
                s = w[:, 0] + w[:, 1] * 4 + w[:, 2] * 16
            else:
                s = jnp.clip(state[1], 0, 63)
            bit_lo = jnp.where(s < 32, jnp.uint32(1) << s.astype(jnp.uint32), 0)
            bit_hi = jnp.where(
                s >= 32, jnp.uint32(1) << (s - 32).astype(jnp.uint32), 0
            )
            active = state[10] | reactivate
            no_hit = jnp.zeros_like(hit)
            if tracer == "skip":
                rows = rows.at[:, 0].set(
                    jnp.where(reactivate, rows[:, 0] & ~bit_lo, rows[:, 0])
                )
                rows = rows.at[:, 1].set(
                    jnp.where(reactivate, rows[:, 1] & ~bit_hi, rows[:, 1])
                )
                state = (state[0], state[1], rows) + tuple(state[3:10]) + (
                    active, no_hit) + tuple(state[12:])
            else:
                occ_lo = jnp.where(reactivate, state[5] & ~bit_lo, state[5])
                occ_hi = jnp.where(reactivate, state[6] & ~bit_hi, state[6])
                state = (state[0], state[1], state[2], state[3], state[4],
                         occ_lo, occ_hi, state[7], state[8], state[9],
                         active, no_hit) + tuple(state[12:])
            return voxels, dists, new_cursor, state, jnp.sum(active)

        self._hit_step_raw = _hit_step
        self._hit_step = jax.jit(_hit_step)
        self._soft_plans = {}
        self._fused_hits_fns = {}
        self._step_fns = {}  # ONE-dispatch training-step programs
        self._finish_fns = {}  # recording path's jitted update tails
        self._step_validated = None  # last validated (plan, rays) pair

    def init_params(self, init_opacity: float = 0.99):
        """Dense albedo [S^3, 3] + opacity logits [S^3] from the scene."""
        S = self.size
        colors = np.asarray(self.bitgrid.colors)
        pal = np.asarray(self.bitgrid.palette)
        occupied = colors != COLOR_EMPTY
        ci = np.clip(colors, 0, pal.shape[0] - 1).astype(np.int64)
        albedo = pal[ci][:, :3].astype(np.float32)
        albedo[~occupied] = 0.0
        logit = np.float32(np.log(init_opacity / (1 - init_opacity)))
        logits = np.where(occupied, logit, -10.0).astype(np.float32)
        if self.flat_params:
            albedo = albedo.reshape(-1)  # row-major: (i, c) at i*3+c
        return {"albedo": jnp.asarray(albedo), "logits": jnp.asarray(logits)}

    def _ensure_compact_renderer(self):
        if self._compact_renderer is None:
            from voxelhex_tpu.render.bitgrid import BitGridRenderer

            self._compact_renderer = BitGridRenderer(
                self.bitgrid, max_iters=self._max_iters, prepass=False,
                tracer=self.tracer_kind,
            )
        return self._compact_renderer

    def beam_spec(self, camera):
        """Beam-prepass spec for :meth:`trace_hits` (None if unsupported).

        Valid for the multi-hit march: the beam proves no OCCUPIED voxel
        lies before each tile's conservative start (occupancy read from the
        traversal pyramid, so dilated candidate grids are honored), hence
        the first K hits — and therefore all gradients — are unchanged.
        Dead tiles record zero hits, exactly like marching them would."""
        return self._ensure_compact_renderer()._beam_spec(camera)

    def trace_hits(self, origins, dirs, compact: bool | None = None,
                   beam=None):
        o = jnp.asarray(origins, dtype=F32).reshape(-1, 3)
        d = jnp.asarray(dirs, dtype=F32).reshape(-1, 3)
        if compact is None:
            compact = o.shape[0] >= 262144  # frame-scale ray counts
        if compact:
            return self.trace_hits_compacted(o, d, beam=beam)
        return self._trace(self.tree, o, d)

    def trace_hits_compacted(
        self, origins, dirs, round_iters: int = 14, shrink: int = 4,
        min_bucket: int = 8192, fuse: bool = True, start_t=None, beam=None,
    ):
        """Multi-hit march with straggler compaction, single pass: each ray
        records hits at its own cursor slot and resumes immediately (the
        plain tracer pays K serial full-width marches); only FINISHED rays
        (missed, or already holding K hits) drop out at compactions.  Same
        results as :func:`make_multihit_tracer`, host-driven like
        ``BitGridRenderer.trace_compacted`` and reusing its cached round
        programs.

        (The round-1 segmented variant compacted on the ACTIVE mask between
        segment rounds, silently dropping rays that had already hit — their
        segment hit and all later hits were lost whenever a compaction fired
        mid-segment.  The per-ray-cursor design removes the segment barrier
        entirely.)

        ``start_t`` / ``beam``: a conservative per-ray start distance (or a
        beam-prepass spec from :meth:`beam_spec` that computes one) enables
        ROUND-0 COMPACTION — beam-proved-dead rays (start >= box exit,
        deactivated at init) are packed away before the expensive
        full-width first round, the same lever that cut the forward path's
        round-1 ray-iters 4x on the 80%-sky bench scene (PERF.md "Beam
        prepass"); on fused replays the beam traces into the ONE program."""
        r = self._ensure_compact_renderer()
        fns = r._compact_fns
        o = jnp.asarray(origins, dtype=F32).reshape(-1, 3)
        d = jnp.asarray(dirs, dtype=F32).reshape(-1, 3)
        R = o.shape[0]
        K = self.max_hits
        has_start = (start_t is not None) or (beam is not None)
        plan_key = (R, has_start)

        # fused replay: once a frame shape has a recorded (iters, bucket)
        # schedule, the whole multi-hit march — beam prepass (if any),
        # init, round-0 compaction, rounds, hit recording, compactions —
        # runs as ONE jitted program with a single blocking read (the
        # per-round live counts, checked for plan overflow).  Mirrors
        # BitGridRenderer's fused planned frames.
        plan = self._soft_plans.get(plan_key) if fuse else None
        if plan is not None:
            out = self._run_fused_hits(o, d, R, plan, start_t=start_t,
                                       beam=beam)
            if out is not None:
                return out
            # plan no longer fits: fall through to the adaptive loop

        st = None if start_t is None else jnp.asarray(start_t).reshape(-1)
        if st is None and beam is not None:
            st = r._beam_fn(*beam["key"])(
                beam["tree_b"], beam["o_b"], beam["d_b"]
            )

        voxels = jnp.full((R, K, 3), -1, dtype=I32)
        dists = jnp.full((R, K), jnp.inf, dtype=F32)
        state = fns["init"](r.tree, o, d, st)
        orig = jnp.arange(R, dtype=I32)
        cursor = jnp.zeros(R, dtype=I32)

        def shrink_to(cur, n_live):
            bucket = cur
            while bucket // shrink >= max(n_live, min_bucket):
                bucket //= shrink
            return bucket

        pre = None
        if st is not None:
            # round-0 compaction: one blocking count read (adaptive frames
            # only — fused replays fold it into the batched fetch)
            n0 = int(fns["count"](state))
            bucket0 = shrink_to(R, n0)
            if bucket0 < R:
                perm = fns["perm"](state[10], bucket0)
                state, orig = fns["apply_perm"](state, orig, perm)
                cursor = cursor[perm]
                pre = bucket0

        # cap matching the plain tracer: K marches of max_iters each
        total_iters = 0
        budget = self._max_iters * K
        entries = []
        while True:
            cur = state[0].shape[0]
            # SHORT rounds throughout: multi-hit live counts collapse far
            # faster than single-hit stragglers (hit rays reactivate and
            # die within a round or two — measured 330k -> 51k -> 3.5k ->
            # 247 per 14 iters on the bench scene), so the render path's
            # 4x amortizing rounds overshoot by ~2.5x ray-iters here.
            # Fused replays batch every round's count into one read, so
            # the extra rounds cost nothing in steady state; only the
            # first (adaptive, plan-recording) frame pays per-round reads.
            iters = min(round_iters, budget - total_iters)
            state, _n = fns["run"](r.tree, state, iters)
            total_iters += iters
            voxels, dists, cursor, state, n_live_dev = self._hit_step(
                voxels, dists, state, orig, cursor, o
            )
            n_live = int(n_live_dev)
            if n_live == 0 or total_iters >= budget:
                entries.append((iters, None, n_live))
                break
            bucket = shrink_to(cur, n_live)
            entries.append((iters, bucket if bucket < cur else None, n_live))
            if bucket < cur:
                perm = fns["perm"](state[10], bucket)
                state, orig = fns["apply_perm"](state, orig, perm)
                cursor = cursor[perm]
        if entries[-1][2] == 0:
            # remember the schedule (with one ladder step of headroom per
            # bucket if nearly full is unnecessary: overflow just retraces)
            self._soft_plans[plan_key] = {
                "pre": pre,
                "rounds": tuple((it, b) for it, b, _n in entries),
            }
        count = jnp.sum(voxels[:, :, 0] >= 0, axis=1)
        return count, voxels, dists

    def _hits_body(self, R, entries, pre):
        """TRACEABLE planned multi-hit march body ``build(tree, o, d, st)
        -> (count, voxels, dists, counts)`` — shared by the fused hits
        replay (:meth:`_run_fused_hits`) and the ONE-dispatch training
        step (:meth:`train_step_fused`)."""
        r = self._ensure_compact_renderer()
        trace = r._trace
        raw = r._raw_fns
        hit_step = self._hit_step_raw
        K = self.max_hits

        def build(tree, o, d, st):
            voxels = jnp.full((R, K, 3), -1, dtype=I32)
            dists = jnp.full((R, K), jnp.inf, dtype=F32)
            state = trace.init(tree, o, d, st)
            orig = jnp.arange(R, dtype=I32)
            cursor = jnp.zeros(R, dtype=I32)
            counts = []
            if pre is not None:
                # planned round-0 compaction: alive count joins the
                # batched fetch, no separate blocking read
                counts.append(jnp.sum(state[10].astype(I32)))
                p = raw["perm"](state[10], pre)
                state, orig = raw["apply_perm"](state, orig, p)
                cursor = cursor[p]
            for iters, bucket in entries:
                state, _n = trace.run(tree, state, iters)
                voxels, dists, cursor, state, n_live = hit_step(
                    voxels, dists, state, orig, cursor, o
                )
                counts.append(n_live.astype(I32))
                cur = state[0].shape[0]
                if bucket is not None and bucket < cur:
                    perm = raw["perm"](state[10], bucket)
                    state, orig = raw["apply_perm"](state, orig, perm)
                    cursor = cursor[perm]
            count = jnp.sum(voxels[:, :, 0] >= 0, axis=1)
            return count, voxels, dists, jnp.stack(counts)

        return build

    def _run_fused_hits(self, o, d, R, plan, start_t=None, beam=None):
        """Execute a recorded multi-hit schedule as one jitted program —
        including the beam prepass and round-0 compaction when the plan
        carries them.  Returns (count, voxels, dists) or None when the plan
        overflowed (the pre bucket or a round's live count exceeded its
        compaction bucket, or the last round still had live rays)."""
        entries = plan["rounds"] if isinstance(plan, dict) else plan
        pre = plan.get("pre") if isinstance(plan, dict) else None
        has_start = (start_t is not None) or (beam is not None)
        if pre is not None and not has_start:
            pre = None  # a pre bucket is only meaningful with a start
        beam_key = beam["key"] if beam is not None else None
        plan_key = (R, has_start)
        key = (R, entries, pre, has_start, beam_key)
        fn = self._fused_hits_fns.get(key)
        if fn is None:
            r = self._compact_renderer
            beam_body = r._beam_body(*beam_key) if beam_key else None
            build = self._hits_body(R, entries, pre)

            if beam_key is not None:
                fn = jax.jit(
                    lambda tree, tree_b, o, d, o_b, d_b: build(
                        tree, o, d, beam_body(tree_b, o_b, d_b)
                    )
                )
            elif has_start:
                fn = jax.jit(build)
            else:
                fn = jax.jit(lambda tree, o, d: build(tree, o, d, None))
            self._fused_hits_fns[key] = fn
        tree = self._compact_renderer.tree
        if beam is not None:
            count, voxels, dists, counts = fn(
                tree, beam["tree_b"], o, d, beam["o_b"], beam["d_b"]
            )
        elif start_t is not None:
            count, voxels, dists, counts = fn(
                tree, o, d, jnp.asarray(start_t).reshape(-1)
            )
        else:
            count, voxels, dists, counts = fn(tree, o, d)
        counts_h = np.asarray(counts)  # the ONE blocking read
        k = 0
        if pre is not None:
            k = 1
            if int(counts_h[0]) > pre:
                self._soft_plans.pop(plan_key, None)
                return None  # pre bucket overflow: live rays were dropped
        for i, (iters, bucket) in enumerate(entries):
            n = int(counts_h[k + i])
            if bucket is not None and n > bucket:
                self._soft_plans.pop(plan_key, None)
                return None  # bucket overflow: hits after it may be lost
        if int(counts_h[-1]) != 0:
            self._soft_plans.pop(plan_key, None)
            return None  # live stragglers the plan didn't cover
        return count, voxels, dists

    # ------------------------------------------------------------------
    # ONE-dispatch training step (VERDICT r3 #1): trace + backward + update

    def _fused_loss_grads(self, build, grad_f, opacity_l1, fit_albedo):
        """Traceable march + hit-compacted backward + L1 + albedo-freeze
        core shared by the single fused step (:meth:`_make_step_fn`) and
        the scanned chain (:meth:`_make_chain_fn`) — ONE definition, so
        the chain-vs-loop and sharded parity claims can't drift."""

        def f(tree, params, o, d, st, target):
            count, voxels, _dists, counts = build(tree, o, d, st)
            voxels = jax.lax.stop_gradient(voxels)
            mask = count > 0
            loss, grads, nh = grad_f(params, mask, voxels, target)
            if opacity_l1:
                l1_loss, l1_grads = jax.value_and_grad(
                    lambda p: opacity_l1
                    * jnp.mean(jax.nn.sigmoid(p["logits"]))
                )(params)
                grads = jax.tree.map(jnp.add, grads, l1_grads)
                loss = loss + l1_loss
            if not fit_albedo:
                grads = dict(grads, albedo=jnp.zeros_like(grads["albedo"]))
            return loss, grads, counts, nh

        return f

    @staticmethod
    def _apply_update(opt, params, opt_state, grads):
        """Optimizer update + the param clamps — the step programs' tail
        (one definition for the same reason as _fused_loss_grads)."""
        import optax

        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        params = {
            "albedo": jnp.clip(params["albedo"], 0.0, 1.0),
            "logits": jnp.clip(params["logits"], -12.0, 12.0),
        }
        return params, opt_state

    def _make_step_fn(self, R, entries, pre, has_start, beam_key, bucket,
                      opt, opacity_l1, fit_albedo, with_update):
        """Compose the planned multi-hit march (:meth:`_hits_body`), the
        hit-compacted backward (:meth:`_make_grad_fn`), the opacity-L1
        term, and (``with_update``) the optimizer update + param clamps
        into ONE traceable program.  Outputs carry the march's straggler
        counts and the backward's hit count so plan validation needs no
        extra dispatch."""
        build = self._hits_body(R, entries, pre)
        grad_f = self._make_grad_fn(R, bucket, with_count=True)
        r = self._compact_renderer
        beam_body = r._beam_body(*beam_key) if beam_key else None
        loss_grads = self._fused_loss_grads(build, grad_f, opacity_l1,
                                            fit_albedo)

        def step(tree, params, opt_state, o, d, st, target):
            loss, grads, counts, nh = loss_grads(tree, params, o, d, st,
                                                 target)
            if not with_update:
                return loss, grads, counts, nh
            params, opt_state = self._apply_update(opt, params, opt_state,
                                                   grads)
            return params, opt_state, loss, counts, nh

        if beam_key is not None:
            return jax.jit(
                lambda tree, tree_b, params, opt_state, o, d, o_b, d_b,
                target: step(
                    tree, params, opt_state, o, d,
                    beam_body(tree_b, o_b, d_b), target,
                )
            )
        if has_start:
            return jax.jit(step)
        return jax.jit(
            lambda tree, params, opt_state, o, d, target: step(
                tree, params, opt_state, o, d, None, target
            )
        )

    def _finish_step_fn(self, opt, opacity_l1, fit_albedo):
        """Jitted L1 + optimizer update + clamps — the recording path's
        tail, numerically identical to the fused step's."""
        key = (id(opt), float(opacity_l1), bool(fit_albedo))
        fn = self._finish_fns.get(key)
        if fn is None:
            import optax

            @jax.jit
            def fin(params, opt_state, loss, grads):
                if opacity_l1:
                    l1_loss, l1_grads = jax.value_and_grad(
                        lambda p: opacity_l1
                        * jnp.mean(jax.nn.sigmoid(p["logits"]))
                    )(params)
                    grads = jax.tree.map(jnp.add, grads, l1_grads)
                    loss = loss + l1_loss
                if not fit_albedo:
                    grads = dict(
                        grads, albedo=jnp.zeros_like(grads["albedo"])
                    )
                updates, opt_state = opt.update(grads, opt_state)
                params = optax.apply_updates(params, updates)
                params = {
                    "albedo": jnp.clip(params["albedo"], 0.0, 1.0),
                    "logits": jnp.clip(params["logits"], -12.0, 12.0),
                }
                return params, opt_state, loss

            self._finish_fns[key] = fn = fin
        return fn

    def _train_step_recording(self, params, opt_state, opt, o, d, target,
                              beam, opacity_l1, fit_albedo):
        """Adaptive multi-dispatch step used while plans record (or after
        an overflow); records the march schedule and the backward bucket
        that the fused step replays.  Numerically identical to the fused
        step (same per-ray math, same update)."""
        count, voxels, _dists = self.trace_hits(o, d, compact=True,
                                                beam=beam)
        voxels = jax.lax.stop_gradient(voxels)
        loss, grads = self.grad_on_hits(params, count, voxels, target)
        fin = self._finish_step_fn(opt, opacity_l1, fit_albedo)
        return fin(params, opt_state, loss, grads)

    def train_step_fused(self, params, opt_state, opt, origins, dirs,
                         target, beam=None, opacity_l1: float = 0.0,
                         fit_albedo: bool = True, validate=None):
        """ONE-dispatch training step: the planned multi-hit march (with
        the beam prepass traced in when ``beam`` is a :meth:`beam_spec`
        dict), the hit-compacted backward, the opacity-L1 term, the
        optimizer update and the param clamps run as a single jitted
        program — one tunnel dispatch per step instead of the
        trace + grad two-dispatch shape (each dispatch costs a host
        round-trip through the axon relay; PERF.md "fwd+bwd").

        Returns ``(params, opt_state, loss)`` as DEVICE values, so a
        training loop chains steps with no host synchronization — enqueue
        N steps back-to-back and block once at the end (the loss array,
        when fetched, carries the step's completion).

        Exactness: while the plans are still recording the step runs the
        adaptive multi-dispatch path (identical math).  Plan validity
        (compaction-bucket overflows, leftover stragglers, backward-bucket
        overflow) is checked from the program's own count outputs the
        FIRST time each (plan, rays) pair is seen; later steps skip that
        blocking read because the march is deterministic in (tree, rays) —
        identical inputs reproduce the validated counts exactly.  The
        token holds WEAKREFS to the ray arrays (a new batch that recycles
        a dead array's id re-validates) and to the device tree's
        occupancy array (a scene edit / tree swap re-validates against
        the new content), plus, for host (numpy) arrays, a content
        fingerprint (an in-place refill of the same buffer re-validates;
        device arrays are immutable so identity suffices).  Pass
        ``validate=True`` to force the check.  On overflow the plans
        drop and the step recomputes adaptively, so returned values are
        always exact."""
        beam_tok = beam["key"] if beam is not None else None
        o = jnp.asarray(origins, dtype=F32).reshape(-1, 3)
        d = jnp.asarray(dirs, dtype=F32).reshape(-1, 3)
        target = jnp.asarray(target, dtype=F32).reshape(-1, 3)
        R = o.shape[0]
        has_start = beam is not None
        plan_key = (R, has_start)
        plan = self._soft_plans.get(plan_key)
        bucket = self._grad_plans.get(R)
        if plan is None or bucket is None:
            return self._train_step_recording(
                params, opt_state, opt, o, d, target, beam, opacity_l1,
                fit_albedo,
            )
        entries = tuple(plan["rounds"])
        pre = plan.get("pre") if has_start else None
        beam_key = beam["key"] if beam is not None else None
        fkey = (R, entries, pre, has_start, beam_key, bucket, id(opt),
                float(opacity_l1), bool(fit_albedo))
        fn = self._step_fns.get(fkey)
        if fn is None:
            fn = self._make_step_fn(
                R, entries, pre, has_start, beam_key, bucket, opt,
                opacity_l1, fit_albedo, with_update=True,
            )
            self._step_fns[fkey] = fn
        tree = self._compact_renderer.tree
        if beam is not None:
            out = fn(tree, beam["tree_b"], params, opt_state, o, d,
                     beam["o_b"], beam["d_b"], target)
        else:
            out = fn(tree, params, opt_state, o, d, target)
        new_params, new_opt_state, loss, counts, nh = out
        vkey = (fkey, beam_tok)
        skip_read = (not validate) and (
            validate is False or self._step_token_matches(vkey, origins,
                                                          dirs)
        )
        if not skip_read:
            # the one blocking fetch (both count families in one RTT)
            counts_h, nh_h = jax.device_get((counts, nh))
            bad = int(counts_h[-1]) != 0
            k = 0
            if pre is not None:
                k = 1
                if int(counts_h[0]) > pre:
                    bad = True
            for i, (_iters, b) in enumerate(entries):
                if b is not None and int(counts_h[k + i]) > b:
                    bad = True
            if bucket < R and int(nh_h) > bucket:
                bad = True
            if bad:
                self._soft_plans.pop(plan_key, None)
                self._grad_plans.pop(R, None)
                self._step_validated = None
                return self._train_step_recording(
                    params, opt_state, opt, o, d, target, beam,
                    opacity_l1, fit_albedo,
                )
            self._step_validated = self._make_step_token(vkey, origins,
                                                         dirs)
        return new_params, new_opt_state, loss

    @staticmethod
    def _rays_fp(arr):
        """Cheap content fingerprint for HOST ray arrays: shape/dtype plus
        a 4096-element strided sample's bytes — an in-place refill of the
        same numpy buffer then fails the validate-once token and forces a
        fresh counts read.  The sample stride bounds the blind spot: any
        contiguous in-place change of >= n/4096 elements (a single pixel
        ROW at 1080p is ~1.4x the stride) is guaranteed caught; smaller
        scattered writes are caught probabilistically — pass
        ``validate=True`` when mutating rays in place below that grain.
        Device (jax) arrays are immutable, so object identity (held by
        weakref in the token) already implies identical content -> None."""
        if isinstance(arr, np.ndarray):
            a = np.ascontiguousarray(arr).reshape(-1)
            n = a.shape[0]
            idx = np.linspace(0, n - 1, num=min(4096, max(n, 1)),
                              dtype=np.int64) if n else np.zeros(0, np.int64)
            return (arr.shape, arr.dtype.str,
                    hash(a[idx].tobytes()))
        return None

    def _tree_key_array(self):
        # the device tree is a plain dict (not weakref-able); its
        # occupancy-pairs array IS weakref-able and pins both identity
        # and content (jax arrays are immutable; every tree swap or
        # streaming in-place refresh replaces this array)
        return self._compact_renderer.tree["occ_pairs"]

    def _make_step_token(self, vkey, origins, dirs):
        import weakref

        def _ref(x):
            try:
                return weakref.ref(x)
            except TypeError:
                return None

        return (vkey, _ref(origins), _ref(dirs), self._rays_fp(origins),
                self._rays_fp(dirs), _ref(self._tree_key_array()))

    def _step_token_matches(self, vkey, origins, dirs):
        st = self._step_validated
        if st is None or st[0] != vkey:
            return False
        ro, rd, fpo, fpd, rt = st[1], st[2], st[3], st[4], st[5]
        if ro is None or rd is None or rt is None:
            return False  # un-weakref-able inputs: re-validate
        if ro() is not origins or rd() is not dirs:
            return False
        if rt() is not self._tree_key_array():
            return False  # scene content changed: validate vs the new tree
        return (fpo == self._rays_fp(origins)
                and fpd == self._rays_fp(dirs))

    def _make_chain_fn(self, R, entries, pre, has_start, beam_key, bucket,
                       opt, opacity_l1, fit_albedo, n_steps):
        """N whole training steps as ONE jitted program: ``lax.scan`` over
        the fused step body (march + hit-compacted backward + L1 +
        optimizer update + clamps — the identical math of
        :meth:`_make_step_fn`) with (params, opt_state) carried through
        the scan.  With a beam spec the conservative starts compute ONCE
        before the scan (they depend only on (beam tree, beam rays), both
        loop-invariant).  One dispatch then advances N steps — the
        forward path's K-frame lever applied to training, killing the
        per-step dispatch residual that made step time session-dependent
        (406 ms best vs 649 ms in a dispatch-bound session, PERF.md)."""
        build = self._hits_body(R, entries, pre)
        grad_f = self._make_grad_fn(R, bucket, with_count=True)
        r = self._compact_renderer
        beam_body = r._beam_body(*beam_key) if beam_key else None
        loss_grads = self._fused_loss_grads(build, grad_f, opacity_l1,
                                            fit_albedo)

        def body(tree, params, opt_state, o, d, st, target):
            loss, grads, counts, nh = loss_grads(tree, params, o, d, st,
                                                 target)
            params, opt_state = self._apply_update(opt, params, opt_state,
                                                   grads)
            return params, opt_state, loss, counts, nh

        def chain(tree, params, opt_state, o, d, st, target):
            def one(carry, _):
                p, s = carry
                p, s, loss, counts, nh = body(tree, p, s, o, d, st,
                                              target)
                return (p, s), (loss, counts, nh)

            (p, s), (losses, counts, nhs) = jax.lax.scan(
                one, (params, opt_state), None, length=n_steps
            )
            return p, s, losses, counts, nhs

        if beam_key is not None:
            return jax.jit(
                lambda tree, tree_b, params, opt_state, o, d, o_b, d_b,
                target: chain(
                    tree, params, opt_state, o, d,
                    beam_body(tree_b, o_b, d_b), target,
                )
            )
        if has_start:
            return jax.jit(chain)
        return jax.jit(
            lambda tree, params, opt_state, o, d, target: chain(
                tree, params, opt_state, o, d, None, target
            )
        )

    def train_steps_fused(self, params, opt_state, opt, origins, dirs,
                          target, n_steps: int, beam=None,
                          opacity_l1: float = 0.0, fit_albedo: bool = True,
                          validate=None):
        """N chained one-dispatch training steps as ONE program (see
        :meth:`_make_chain_fn`) — bit-identical to calling
        :meth:`train_step_fused` ``n_steps`` times, with the per-step
        dispatch residual amortized N-fold.  Returns ``(params,
        opt_state, losses[n_steps])`` as device values.

        Falls back to looping :meth:`train_step_fused` while the plans
        are still recording (identical results either way).  Validation
        follows the same once-per-(plan, rays) policy: the scanned
        program's per-step counts are folded by max (the march is
        identical every step — geometry-only — so one bad step means a
        bad plan) and checked on first sight of the pair."""
        # ray count from host-side shape math only — converting the whole
        # buffer to a device array just to read .shape would ship ~24 MB
        # per call at 1080p through the tunnel (transfer discipline)
        plan_key_probe = (int(np.size(origins)) // 3, beam is not None)
        if (self._soft_plans.get(plan_key_probe) is None
                or self._grad_plans.get(plan_key_probe[0]) is None):
            losses = []
            for _ in range(int(n_steps)):
                params, opt_state, loss = self.train_step_fused(
                    params, opt_state, opt, origins, dirs, target,
                    beam=beam, opacity_l1=opacity_l1,
                    fit_albedo=fit_albedo, validate=validate,
                )
                losses.append(loss)
            return params, opt_state, jnp.stack(losses)
        beam_tok = beam["key"] if beam is not None else None
        o = jnp.asarray(origins, dtype=F32).reshape(-1, 3)
        d = jnp.asarray(dirs, dtype=F32).reshape(-1, 3)
        target = jnp.asarray(target, dtype=F32).reshape(-1, 3)
        R = o.shape[0]
        has_start = beam is not None
        plan = self._soft_plans.get((R, has_start))
        bucket = self._grad_plans.get(R)
        entries = tuple(plan["rounds"])
        pre = plan.get("pre") if has_start else None
        beam_key = beam["key"] if beam is not None else None
        fkey = (R, entries, pre, has_start, beam_key, bucket, id(opt),
                float(opacity_l1), bool(fit_albedo), int(n_steps),
                "chain")
        fn = self._step_fns.get(fkey)
        if fn is None:
            fn = self._make_chain_fn(
                R, entries, pre, has_start, beam_key, bucket, opt,
                opacity_l1, fit_albedo, int(n_steps),
            )
            self._step_fns[fkey] = fn
        tree = self._compact_renderer.tree
        if beam is not None:
            out = fn(tree, beam["tree_b"], params, opt_state, o, d,
                     beam["o_b"], beam["d_b"], target)
        else:
            out = fn(tree, params, opt_state, o, d, target)
        new_params, new_opt_state, losses, counts, nhs = out
        vkey = (fkey, beam_tok)
        skip_read = (not validate) and (
            validate is False or self._step_token_matches(vkey, origins,
                                                          dirs)
        )
        if not skip_read:
            # ONE blocking fetch for both count families (each read is a
            # tunnel round-trip); fold over steps by max — the march is
            # identical every step, so any bad step means a bad plan
            counts_a, nhs_h = jax.device_get((counts, nhs))
            counts_h = counts_a.max(axis=0)
            bad = int(counts_h[-1]) != 0
            k = 0
            if pre is not None:
                k = 1
                if int(counts_h[0]) > pre:
                    bad = True
            for i, (_iters, b) in enumerate(entries):
                if b is not None and int(counts_h[k + i]) > b:
                    bad = True
            if bucket < R and int(nhs_h.max()) > bucket:
                bad = True
            if bad:
                self._soft_plans.pop((R, has_start), None)
                self._grad_plans.pop(R, None)
                self._step_validated = None
                losses = []
                for _ in range(int(n_steps)):
                    params, opt_state, loss = self.train_step_fused(
                        params, opt_state, opt, origins, dirs, target,
                        beam=beam, opacity_l1=opacity_l1,
                        fit_albedo=fit_albedo,
                    )
                    losses.append(loss)
                return params, opt_state, jnp.stack(losses)
            self._step_validated = self._make_step_token(vkey, origins,
                                                         dirs)
        return new_params, new_opt_state, losses

    def grad_on_hits(self, params, count, voxels, target,
                     min_bucket: int = 8192, shrink: int = 4):
        """``value_and_grad`` of :meth:`loss`, computed only on rays that
        recorded at least one hit.

        A no-hit ray's composite is a params-free constant (every slot's
        alpha is masked to zero in :meth:`composite`), so its gradient is
        exactly zero and its squared error a constant — compacting those
        rays away before the backward pass cuts its cost by the frame's
        miss fraction (~80% on sky-heavy scenes) while returning the
        IDENTICAL loss value and gradients: pad rows are masked, the
        no-hit constant term is added back, and the full-frame mean
        normalization is kept.  Costs one blocking read (the hit-ray
        count, to pick the compaction bucket)."""
        target = jnp.asarray(target, dtype=F32).reshape(-1, 3)
        voxels = jax.lax.stop_gradient(voxels)
        R = voxels.shape[0]
        mask = count > 0

        # PLANNED bucket: repeat shapes (training loops) reuse the last
        # step's ladder bucket and validate the hit count IN the program —
        # the old path paid a blocking hit-count read (one tunnel RTT)
        # BEFORE it could even dispatch the backward.  Overflow (more hits
        # than the planned bucket would keep) falls back to the adaptive
        # path below, bit-exact.
        planned = self._grad_plans.get(R)
        if planned is not None and planned < R:
            fnp = self._grad_fns.get((R, planned, "planned"))
            if fnp is None:
                fnp = jax.jit(self._make_grad_fn(R, planned, with_count=True))
                self._grad_fns[(R, planned, "planned")] = fnp
            loss, grads, n_dev = fnp(params, mask, voxels, target)
            if int(n_dev) <= planned:  # blocks AFTER the backward ran
                return loss, grads
            self._grad_plans.pop(R, None)  # overflow: recompute adaptively

        n = int(jnp.sum(mask))
        bucket = R
        while bucket // shrink >= max(n, min_bucket):
            bucket //= shrink
        self._grad_plans[R] = bucket
        # keyed on (R, bucket): two ray counts can ladder to the same bucket
        # (or a bucket can equal a smaller call's R), and the plain-vs-
        # compacted branch below depends on BOTH
        fn = self._grad_fns.get((R, bucket))
        if fn is None:
            fn = jax.jit(self._make_grad_fn(R, bucket))
            self._grad_fns[(R, bucket)] = fn
        return fn(params, mask, voxels, target)

    def _make_grad_fn(self, R, bucket, with_count: bool = False):
        """value_and_grad of the hit-compacted loss at a fixed bucket;
        ``with_count`` additionally returns the hit count so callers can
        validate a PLANNED bucket without a pre-dispatch blocking read."""
        composite = self.composite

        if bucket >= R:

            def f(params, mask, voxels, target):
                def loss_fn(p):
                    rgb = composite(p, voxels)
                    return jnp.mean((rgb - target) ** 2)

                out = jax.value_and_grad(loss_fn)(params)
                if with_count:
                    return out[0], out[1], jnp.sum(mask.astype(I32))
                return out

        else:
            b = bucket

            def f(params, mask, voxels, target):
                Rf = mask.shape[0]
                pos = jnp.cumsum(mask.astype(I32)) - 1
                tgt = jnp.where(mask, pos, b)
                idx = (
                    jnp.zeros(b, dtype=I32)
                    .at[tgt]
                    .set(jnp.arange(Rf, dtype=I32), mode="drop")
                )
                vb = voxels[idx]
                tb = target[idx]
                rowvalid = jnp.arange(b) < jnp.sum(mask)
                const = jnp.sum(
                    jnp.where(mask[:, None], 0.0, target**2)
                )

                def loss_fn(p):
                    rgb = composite(p, vb)
                    se = jnp.where(
                        rowvalid[:, None], (rgb - tb) ** 2, 0.0
                    )
                    return (jnp.sum(se) + const) / target.size

                out = jax.value_and_grad(loss_fn)(params)
                if with_count:
                    return out[0], out[1], jnp.sum(mask.astype(I32))
                return out

        return f

    def composite(self, params, voxels, bg_color=None):
        """Differentiable transmittance compositing over recorded voxels."""
        S = self.size
        valid = voxels[:, :, 0] >= 0  # [R, K]
        v = jnp.clip(voxels, 0, S - 1)
        addr = v[:, :, 0] + v[:, :, 1] * S + v[:, :, 2] * S * S
        # NOTE on the backward scatter (xprof, PERF.md "soft backward
        # scatter layout"): the [N,3] row scatter-add this gather's VJP
        # produces costs ~86 ms/step — 9x the per-element rate of the
        # flat logits scatter.  A flat per-component FORWARD gather was
        # tried and measured WORSE overall (+42 ms: the forward becomes
        # 3.1M scalar gathers and XLA inserts ~51 ms of layout copies), so
        # the forward row gather stays; ``flat_albedo_bwd`` keeps it and
        # reroutes only the BACKWARD through a flat 1-D scatter.
        # layout guard: flat_params=True expects [S^3*3] albedo, the row
        # layout [S^3, 3].  A mismatched checkpoint (saved under the other
        # layout) would otherwise pass the forward silently — reshape(-1)
        # of either layout composites the same — and only blow up deep in
        # the first backward with an opaque cotangent-shape error, so fail
        # HERE with the actionable message (advisor finding).
        want_ndim = 1 if self.flat_params else 2
        if params["albedo"].ndim != want_ndim:
            raise ValueError(
                f"params['albedo'] has ndim {params['albedo'].ndim} but this"
                f" SoftRenderer(flat_params={self.flat_params}) expects ndim"
                f" {want_ndim} — a checkpoint saved under the other layout?"
                " Convert with albedo.reshape(-1) (flat) or"
                " albedo.reshape(-1, 3) (rows), or construct the renderer"
                " with the matching flat_params."
            )
        if self.flat_params:
            alb = _gather_rows_flat_params(params["albedo"], addr)
        elif self.flat_albedo_bwd:
            alb = _gather_rows_flatbwd(params["albedo"], addr)  # [R, K, 3]
        else:
            alb = params["albedo"][addr]  # [R, K, 3]
        alpha = jax.nn.sigmoid(params["logits"][addr])  # [R, K]
        alpha = jnp.where(valid, alpha, 0.0)
        trans = jnp.cumprod(1.0 - alpha + 1e-9, axis=1)
        w = alpha * jnp.concatenate(
            [jnp.ones_like(trans[:, :1]), trans[:, :-1]], axis=1
        )
        rgb = jnp.sum(w[:, :, None] * alb, axis=1)
        if bg_color is not None:
            rgb = rgb + trans[:, -1][:, None] * jnp.asarray(bg_color, dtype=F32)
        return rgb

    def render(self, params, origins, dirs, bg_color=None):
        _count, voxels, _d = self.trace_hits(origins, dirs)
        voxels = jax.lax.stop_gradient(voxels)
        return self.composite(params, voxels, bg_color)

    def loss(self, params, voxels, target):
        rgb = self.composite(params, voxels)
        return jnp.mean((rgb - target) ** 2)


def with_candidates(
    source,
    radius: int = 1,
    max_hits: int = 6,
    candidate_logit: float = -3.0,
    candidate_albedo: float = 0.5,
    max_iters: int = 2048,
):
    """Grow-geometry setup: a SoftRenderer whose traced occupancy is the
    scene DILATED by ``radius`` voxels (6-neighborhood), plus params where
    the candidate voxels start nearly transparent.

    The multi-hit march only records voxels present in the occupancy
    bitmap, so absent voxels receive no gradient; dilating the bitmap lets
    rays record the empty shell around existing geometry, and fitting can
    then raise a candidate's opacity (grow) as well as carve real voxels.
    Returns ``(renderer, params, candidate_mask)`` with the mask flat in
    voxel-address order ([S^3], x fastest).
    """
    bg = source if isinstance(source, BitGrid) else bgmod.build_bitgrid(source)
    S = int(bg.size)
    occ = (np.asarray(bg.colors) != COLOR_EMPTY).reshape(S, S, S)  # [z,y,x]
    dil = occ.copy()
    for _ in range(radius):
        grown = dil.copy()
        for ax in (0, 1, 2):
            shifted = np.roll(dil, 1, axis=ax)
            sl = [slice(None)] * 3
            sl[ax] = 0
            shifted[tuple(sl)] = False
            grown |= shifted
            shifted = np.roll(dil, -1, axis=ax)
            sl[ax] = -1
            shifted[tuple(sl)] = False
            grown |= shifted
        dil = grown

    # rebuild the occupancy pyramid from the dilated mask ([x,y,z] order for
    # the packer); colors stay as-is — compositing shades from the params'
    # albedo, and init_params treats COLOR_EMPTY voxels as unoccupied
    levels_lo, levels_hi, bases = bgmod._pack_pyramid(dil.transpose(2, 1, 0))
    bg2 = BitGrid(
        size=S,
        n_levels=len(levels_lo),
        level_bases=bases,
        occ_lo=np.concatenate(levels_lo),
        occ_hi=np.concatenate(levels_hi),
        colors=np.asarray(bg.colors),
        palette=np.asarray(bg.palette),
    )
    renderer = SoftRenderer(bg2, max_hits=max_hits, max_iters=max_iters)
    params = renderer.init_params()
    # voxel-address order is x + y*S + z*S^2; occ is [z,y,x], whose ravel is
    # x-fastest already
    cand = (dil & ~occ).ravel()
    cand_j = jnp.asarray(cand)
    params["logits"] = jnp.where(
        cand_j, jnp.float32(candidate_logit), params["logits"]
    )
    alb = params["albedo"]
    if renderer.flat_params:
        alb = alb.reshape(-1, 3)
    alb = jnp.where(cand_j[:, None], jnp.float32(candidate_albedo), alb)
    params["albedo"] = alb.reshape(-1) if renderer.flat_params else alb
    return renderer, params, cand


def params_to_tree(renderer: SoftRenderer, params, threshold: float = 0.5,
                   brick_dim: int = 4, simplify: bool = True):
    """Bake fitted soft params back into an editable :class:`BoxTree`.

    Closes the training loop: after ``fit_soft`` carves/grows geometry,
    voxels whose ``sigmoid(logit) >= threshold`` become occupied tree
    voxels with their learned albedo (quantized to u8 RGB, alpha 255);
    everything else is carved away.  The result is a first-class tree —
    editable, bencode/npz-checkpointable, streamable, and renderable by
    the production tracer (the reference workflow operates on trees
    end-to-end; this is the TPU training path's road back into it).

    ``params`` may use either albedo layout (row [S^3, 3] or flat
    [S^3*3]).  An identity bake of ``init_params()`` (default opacity
    0.99) reproduces the source scene's voxels and colors exactly."""
    from voxelhex_tpu.tree.build import from_voxels

    S = renderer.size
    logits = np.asarray(params["logits"]).reshape(-1)
    alb = np.asarray(params["albedo"]).reshape(-1, 3)
    keep = 1.0 / (1.0 + np.exp(-logits)) >= threshold
    idx = np.flatnonzero(keep)
    # voxel address order is x + y*S + z*S^2
    x = idx % S
    y = (idx // S) % S
    z = idx // (S * S)
    positions = np.stack([x, y, z], axis=1).astype(np.int64)
    rgb = np.clip(np.round(alb[idx] * 255.0), 0, 255).astype(np.uint8)
    colors = np.concatenate(
        [rgb, np.full((idx.shape[0], 1), 255, dtype=np.uint8)], axis=1
    )
    return from_voxels(positions, colors, size=S, brick_dim=brick_dim,
                       simplify=simplify)


def fit_soft(
    renderer: SoftRenderer,
    origins,
    dirs,
    targets,
    steps: int = 300,
    lr: float = 0.05,
    params0=None,
    opacity_l1: float = 0.0,
    fit_albedo: bool = True,
    checkpoint_path=None,
    checkpoint_every: int = 0,
    chain: int = 8,
):
    """Optimize albedo + occupancy logits against target pixels.

    ``opacity_l1`` optionally penalizes total opacity (encourages carving);
    ``fit_albedo=False`` freezes colors so only geometry adapts.
    ``checkpoint_path`` enables checkpoint/resume: the fit saves
    (step, params, optimizer state) every ``checkpoint_every`` steps (and at
    the end), and an interrupted fit restarted with the same path resumes
    from the last checkpoint with identical results to an uninterrupted run
    (the SURVEY §5 checkpoint/resume subsystem applied to training).

    ``chain``: grad steps per dispatch — full ``chain``-sized blocks run
    as ONE scanned program with ONE blocking loss fetch (the per-step
    loop paid a dispatch + a host round-trip PER STEP; through the
    remote tunnel those dominate the ~120 ms grad program).  Remainder
    blocks (tail, checkpoint boundaries) run per-step; the loss history
    and final params are bit-identical either way.

    Scale note: this trainer's backward is FULL-WIDTH over the ray
    batch; for frame-scale ray counts (1080p) use
    :meth:`SoftRenderer.train_step_fused` / :meth:`train_steps_fused`
    instead — their hit-compacted backward is both faster and far
    lighter on HBM (the bench path).  Returns (params, losses)."""
    import optax

    targets = jnp.asarray(targets).reshape(-1, 3)
    params = renderer.init_params() if params0 is None else params0
    _count, voxels, _dists = renderer.trace_hits(origins, dirs)
    voxels = jax.lax.stop_gradient(voxels)

    opt = optax.adam(lr)
    opt_state = opt.init(params)

    start = 0
    if checkpoint_path:
        import os

        from voxelhex_tpu.io.checkpoint import load_train_state, save_train_state

        if os.path.exists(checkpoint_path):
            start, params, opt_state = load_train_state(
                checkpoint_path, params, opt_state
            )

    def loss_fn(p):
        if not fit_albedo:
            p = {"albedo": jax.lax.stop_gradient(p["albedo"]), "logits": p["logits"]}
        loss = renderer.loss(p, voxels, targets)
        if opacity_l1:
            loss = loss + opacity_l1 * jnp.mean(jax.nn.sigmoid(p["logits"]))
        return loss

    def step_math(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        params = {
            "albedo": jnp.clip(params["albedo"], 0.0, 1.0),
            "logits": jnp.clip(params["logits"], -12.0, 12.0),
        }
        return params, opt_state, loss

    step = jax.jit(step_math)
    chain = max(1, int(chain))

    @jax.jit
    def step_block(params, opt_state):
        def one(carry, _):
            p, s, loss = step_math(*carry)
            return (p, s), loss

        (p, s), ls = jax.lax.scan(
            one, (params, opt_state), None, length=chain
        )
        return p, s, ls

    losses = []
    i = start
    while i < steps:
        # stop at the next checkpoint boundary so resume points land on
        # the exact steps the per-step loop produced
        stop = steps
        if checkpoint_path and checkpoint_every:
            stop = min(stop, ((i // checkpoint_every) + 1) * checkpoint_every)
        if chain > 1 and stop - i >= chain:
            params, opt_state, ls = step_block(params, opt_state)
            losses.extend(float(l) for l in np.asarray(ls))
            i += chain
        else:
            params, opt_state, loss = step(params, opt_state)
            losses.append(float(loss))
            i += 1
        if checkpoint_path and checkpoint_every and i % checkpoint_every == 0:
            save_train_state(checkpoint_path, i, params, opt_state)
    if checkpoint_path and start < steps:
        save_train_state(checkpoint_path, steps, params, opt_state)
    return params, losses
