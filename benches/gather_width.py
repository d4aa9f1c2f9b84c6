"""Microbench: row-gather cost vs row width inside a while_loop.

Decides the multi-block marching design (PERF.md next-lever #3): a 2x2x2
block group needs a 16-wide u32 row per fetch vs today's 2-wide pair.  If a
16-wide row costs ~the same as a 2-wide one (cache-line effect on the
scalar core), holding 8^3 cells in registers is a straight iteration-count
win; if cost scales per element it's a wash.

Also measures the 8-way register select (the VPU cost of picking one
(lo, hi) pair out of 16 group words) to confirm it is ~free.

Usage: python benches/gather_width.py [--rays 2073600] [--iters 20]
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
    ap.add_argument("--rows", type=int, default=1 << 18)  # table rows
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

    R, T = args.rays, args.rows
    rng = np.random.default_rng(0)
    idx0 = jnp.asarray(rng.integers(0, T, R), dtype=jnp.int32)
    # locality variants: does index coherence change gather cost?
    idx_sorted = jnp.asarray(np.sort(rng.integers(0, T, R)), dtype=jnp.int32)
    # clustered: runs of 256 lanes share one random row neighborhood
    base_c = np.repeat(rng.integers(0, T - 256, R // 256), 256)
    idx_clustered = jnp.asarray(base_c + np.tile(np.arange(256) // 32, R // 256),
                                dtype=jnp.int32)

    def make_loop(width, select8=False, stride=False):
        table = jnp.asarray(
            rng.integers(0, 2**32, (T, width), dtype=np.uint64).astype(np.uint32)
        )

        def body(carry):
            idx, acc, i = carry
            row = table[idx]  # [R, width] row gather
            if select8:
                g = idx % 8
                lo = jnp.zeros_like(acc)
                hi = jnp.zeros_like(acc)
                for k in range(8):
                    sel = g == k
                    lo = jnp.where(sel, row[:, 2 * k], lo)
                    hi = jnp.where(sel, row[:, 2 * k + 1], hi)
                mix = lo ^ hi
            else:
                mix = row[:, 0] ^ row[:, -1]
            acc = acc ^ mix
            if stride:
                # +1 step preserves the input index pattern's coherence
                idx = (idx + 1) % T
            else:
                idx = (idx + mix.astype(jnp.int32)) % T
            return idx, acc, i + 1

        def cond(carry):
            return carry[2] < args.iters

        @jax.jit
        def run(idx):
            acc = jnp.zeros(R, dtype=jnp.uint32)
            idx, acc, _ = jax.lax.while_loop(cond, body, (idx, acc, jnp.int32(0)))
            return acc

        return run

    results = {}
    configs = [
        ("w1", 1, False, False, idx0),
        ("w2", 2, False, False, idx0),
        ("w4", 4, False, False, idx0),
        ("w8", 8, False, False, idx0),
        ("w16", 16, False, False, idx0),
        ("w16+sel8", 16, True, False, idx0),
        ("w32", 32, False, False, idx0),
        ("w2-random", 2, False, True, idx0),
        ("w2-sorted", 2, False, True, idx_sorted),
        ("w2-cluster", 2, False, True, idx_clustered),
    ]
    for name, width, sel, stride, idx in configs:
        run = make_loop(width, sel, stride)
        out = run(idx)
        out.block_until_ready()  # compile + warm
        best = 1e9
        for _ in range(args.reps):
            t0 = time.time()
            run(idx).block_until_ready()
            best = min(best, time.time() - t0)
        ns = best * 1e9 / (R * args.iters)
        results[name] = ns
        print(f"{name:11s}: {best*1e3:8.1f} ms  ({ns:6.2f} ns/ray/iter)",
              flush=True)

    print({k: round(v, 2) for k, v in results.items()})


if __name__ == "__main__":
    main()
