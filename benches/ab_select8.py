"""Microbench: re-test multi-block in-register marching under scalar/VPU overlap.

ab_overlap.py showed loop-body cost is ~max(scalar gather, VPU vector), not
the sum.  The earlier "multi-block marching is DEAD" verdict (PERF.md) was
based on the 8-way register select costing ~10 ns/ray/iter of VPU where-ops
— measured WITHOUT a concurrent gather to hide behind.  This bench re-tests:
fetch ONE [R,16] row (= a 2x2x2 group of occupancy-word pairs; width <= 32
u32 is free per gather_width.py), select the (lo,hi) pair in-register from
position bits, and march.  If the select hides behind the gather, a group
fetch covers 2 blocks of linear span per gather and could ~halve gather
count in empty space.

Configs (all with the real tracer's serializing position->address chain):
  * base-sub4       - [R,2] row gather + 4 advance substeps (today's loop)
  * sel2-sub4       - [R,4] row + 1-bit (2-way) pair select
  * sel8-sub4       - [R,16] row + 3-bit (8-way) pair select
  * sel8-sub8       - same + 8 substeps (use the 2-block span)

Decision: sel8 wins per linear distance if its ns/ray/iter < 2x base's.

Usage: python benches/ab_select8.py [--rays 2073600] [--iters 20] [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=2073600)  # 1080p
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--rows", type=int, default=1 << 18)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    repo = os.path.join(os.path.dirname(__file__), "..")
    jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from voxelhex_tpu.render.wavefront import (
        _dda_step_v,
        _occ_bit_v,
        _step_sectant_v,
    )

    F32, I32, U32 = jnp.float32, jnp.int32, jnp.uint32
    R = args.rays
    rng = np.random.default_rng(0)
    p0 = jnp.asarray(rng.uniform(1.0, 255.0, (R, 3)), dtype=F32)
    d0 = jnp.asarray(rng.normal(size=(R, 3)), dtype=F32)
    d0 = d0 / jnp.linalg.norm(d0, axis=-1, keepdims=True)
    # real per-axis DDA scale factors, same three-axis formula as the
    # tracer's init (bitgrid.py sf) so the advance-math chain matches
    dx, dy, dz = d0[:, 0], d0[:, 1], d0[:, 2]
    sf0 = jnp.stack(
        [
            jnp.sqrt(1.0 + (dz / dx) ** 2 + (dy / dx) ** 2),
            jnp.sqrt((dx / dy) ** 2 + 1.0 + (dz / dy) ** 2),
            jnp.sqrt((dx / dz) ** 2 + (dy / dz) ** 2 + 1.0),
        ],
        axis=-1,
    ).astype(F32)
    ts0 = jnp.asarray(rng.integers(0, 64, R), dtype=I32)

    def make_loop(width, substeps):
        """width = u32 words per fetched row (2 -> no select; 4 -> 2-way;
        16 -> 8-way group select)."""
        T = args.rows
        table = jnp.asarray(
            rng.integers(0, 2**32, (T, width), dtype=np.uint64).astype(np.uint32)
        )
        idx0 = jnp.asarray(rng.integers(0, T, R), dtype=I32)
        n_pairs = width // 2

        def body(carry):
            idx, acc, p, ts, i = carry
            row = table[idx]  # [R,width] row gather (scalar core)
            # in-register pair select from position bits (VPU wheres)
            parts = [row[:, 2 * k : 2 * k + 2] for k in range(n_pairs)]
            s = (p[:, 0].astype(I32) ^ p[:, 1].astype(I32) ^ p[:, 2].astype(I32))
            bit = 0
            while len(parts) > 1:
                b = ((s >> bit) & 1).astype(jnp.bool_)[:, None]
                parts = [
                    jnp.where(b, parts[2 * k + 1], parts[2 * k])
                    for k in range(len(parts) // 2)
                ]
                bit += 1
            occ_lo = parts[0][:, 0]
            occ_hi = parts[0][:, 1]
            # ADVANCE substeps (identical shape to ab_overlap's)
            tmin = jnp.floor(p / 4.0) * 4.0
            tsize = jnp.full(R, 4.0, dtype=F32)
            v_p, v_ts = p, ts
            go = jnp.ones(R, dtype=jnp.bool_)
            for _ in range(substeps):
                s_p, s_step = _dda_step_v(d0, sf0, v_p, tmin, tsize)
                s_ts = _step_sectant_v(v_ts, s_step)
                v_p = jnp.where(go[:, None], s_p, v_p)
                v_ts = jnp.where(go, s_ts, v_ts)
                stop = (v_ts >= 64) | (_occ_bit_v(occ_lo, occ_hi, v_ts) != 0)
                go = go & (~stop)
            v_ts = jnp.where(v_ts >= 64, 0, v_ts)
            v_p = jnp.clip(v_p, 1.0, 255.0)
            acc = acc ^ occ_lo ^ occ_hi
            # the real tracer's serializing dependency: next address is a
            # function of the stepped position
            idx = (
                v_p[:, 0].astype(I32) + v_p[:, 1].astype(I32) * 64 + v_ts
            ) % T
            return idx, acc, v_p, v_ts, i + 1

        def cond(carry):
            return carry[4] < args.iters

        @jax.jit
        def run(idx, p, ts):
            acc = jnp.zeros(R, dtype=U32)
            idx, acc, p, ts, _ = jax.lax.while_loop(
                cond, body, (idx, acc, p, ts, jnp.int32(0))
            )
            return acc, p

        return run, idx0

    configs = [
        ("base-sub4", 2, 4),
        ("sel2-sub4", 4, 4),
        ("sel8-sub4", 16, 4),
        ("sel8-sub8", 16, 8),
    ]
    results = {}
    for name, width, k in configs:
        run, idx0 = make_loop(width, k)
        out = run(idx0, p0, ts0)
        jax.block_until_ready(out)  # compile + warm
        best = 1e9
        for _ in range(args.reps):
            t0 = time.time()
            jax.block_until_ready(run(idx0, p0, ts0))
            best = min(best, time.time() - t0)
        ns = best * 1e9 / (R * args.iters)
        results[name] = ns
        print(f"{name:12s}: {best*1e3:8.1f} ms  ({ns:6.2f} ns/ray/iter)", flush=True)

    print({k: round(v, 2) for k, v in results.items()})
    if results.get("sel8-sub4", 1e9) < 2 * results.get("base-sub4", 0):
        print("VERDICT: group fetch WINS per linear distance (< 2x base)")
    else:
        print("VERDICT: group fetch still loses")


if __name__ == "__main__":
    main()
