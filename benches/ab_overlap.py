"""Microbench: does the scalar core's row gather OVERLAP the VPU advance math?

The BitGrid loop body does ONE [R,2] row gather (scalar core) plus the
ADVANCE substep vector math (VPU).  PERF.md's cost model adds them
(gathered_elems x 7 ns + vector cost); ROADMAP's open question
("scalar-core/VPU overlap experiments") is whether they actually run
CONCURRENTLY — if iteration cost is max(gather, vector) rather than the sum,
then (a) shaving vector ops gains nothing until vector time drops below
gather time, and (b) adding MORE in-register substeps is free until it
crosses the gather time.

Measures, at 1080p ray count, ns/ray/iter for:
  * gather-only          - one [R,2] row gather, trivial mix
  * sub{1,2,4,6}         - k ADVANCE substeps (_dda_step_v + _step_sectant_v
                           + occupancy bit test + state wheres), no gather
  * gather+sub4-indep    - both, gather chain independent of vector chain
                           (hardware overlap upper bound)
  * gather+sub4-dep      - gather address derived from the stepped position
                           (the real tracer's cross-iteration dependency)

Usage: python benches/ab_overlap.py [--rays 2073600] [--iters 20] [--cpu]
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
    R, T = args.rays, args.rows
    rng = np.random.default_rng(0)
    idx0 = jnp.asarray(rng.integers(0, T, R), dtype=I32)
    table = jnp.asarray(
        rng.integers(0, 2**32, (T, 2), dtype=np.uint64).astype(np.uint32)
    )
    # ADVANCE-shaped vector state: position, cell min, direction, scale factors
    p0 = jnp.asarray(rng.uniform(1.0, 255.0, (R, 3)), dtype=F32)
    d0 = jnp.asarray(rng.normal(size=(R, 3)), dtype=F32)
    d0 = d0 / jnp.linalg.norm(d0, axis=-1, keepdims=True)
    sf0 = jnp.sqrt(1.0 + (d0 / jnp.where(d0 == 0, 1.0, d0)) ** 2).astype(F32)
    ts0 = jnp.asarray(rng.integers(0, 64, R), dtype=I32)

    def make_loop(substeps, gather, dep):
        def body(carry):
            idx, acc, p, ts, i = carry
            tmin = jnp.floor(p / 4.0) * 4.0
            tsize = jnp.full(R, 4.0, dtype=F32)
            occ_lo = acc  # register words, as in the real loop
            occ_hi = acc ^ U32(0x5A5A5A5A)
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
            if gather:
                if dep:
                    # the real tracer: next address is a function of the
                    # stepped position (serializing data dependency)
                    idx = (
                        v_p[:, 0].astype(I32)
                        + v_p[:, 1].astype(I32) * 64
                        + v_ts
                    ) % T
                row = table[idx]  # [R,2] row gather
                mix = row[:, 0] ^ row[:, 1]
                acc = acc ^ mix
                if not dep:
                    # gather chain feeds only itself (independent of VPU math)
                    idx = (idx + mix.astype(I32)) % T
            else:
                acc = acc ^ v_ts.astype(U32)
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

        return run

    configs = [
        ("gather-only", 0, True, False),
        ("sub1", 1, False, False),
        ("sub2", 2, False, False),
        ("sub4", 4, False, False),
        ("sub6", 6, False, False),
        ("gather+sub4-indep", 4, True, False),
        ("gather+sub4-dep", 4, True, True),
    ]
    results = {}
    for name, k, g, dep in configs:
        run = make_loop(k, g, dep)
        out = run(idx0, p0, ts0)
        jax.block_until_ready(out)  # compile + warm
        best = 1e9
        for _ in range(args.reps):
            t0 = time.time()
            jax.block_until_ready(run(idx0, p0, ts0))
            best = min(best, time.time() - t0)
        ns = best * 1e9 / (R * args.iters)
        results[name] = ns
        print(f"{name:18s}: {best*1e3:8.1f} ms  ({ns:6.2f} ns/ray/iter)", flush=True)

    print({k: round(v, 2) for k, v in results.items()})


if __name__ == "__main__":
    main()
