"""Same-session A/B: MXU one-hot fetch vs gather for coarse-level words.

The last unprobed gather-floor-break candidate (PERF.md "Next levers" /
ROADMAP "gather-floor break"): replace the per-iteration random fetch of
occupancy words with a matmul — ``one_hot(idx, T) @ table`` rides the MXU
instead of the scalar core.  Exactness: a u32 word splits into 4 bytes
(integers <= 256 are exact in bf16), so the fetch becomes one
``[R, T]·[T, 8]`` bf16 matmul (lo/hi words x 4 bytes) recombined in i32.

Feasibility arithmetic first (why only COARSE levels are candidates): the
trick costs R·T·8 MACs and — if XLA fails to fuse the one-hot — an [R, T]
bf16 intermediate.  At the render hot path's scale (R = 2.07M rays,
level-0 table T = 262k words for a 256^3 window) that is 4.3 P-MACs and a
1 TB intermediate: impossible.  Only levels >= 1 (T <= 4096) fit, and the
tracer spends the large majority of its iterations at level 0 / brick
marching (PERF.md cost model), so even an MXU win on coarse fetches cannot
move the 11.9 ns/ray/iter gather floor by much.  This bench measures the
per-fetch primitive anyway, so the verdict rests on numbers.

Run: python benches/ab_onehot_fetch.py [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--reps", type=int, default=30)
    args = ap.parse_args()

    import jax

    repo = os.path.join(os.path.dirname(__file__), "..")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    rng = np.random.default_rng(7)

    def bench(fn, *xs):
        out = fn(*xs)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            for _ in range(args.reps):
                out = fn(*xs)
            jax.block_until_ready(out)
            best = min(best, (time.time() - t0) / args.reps)
        return best, out

    for R, T in [(131072, 4096), (2073600, 4096), (2073600, 64)]:
        words = rng.integers(0, 1 << 32, size=(T, 2), dtype=np.uint64)
        table = jnp.asarray(words.astype(np.uint32))
        idx = jnp.asarray(rng.integers(0, T, size=R, dtype=np.int32))
        # byte-split table for the MXU path: [T, 8] bf16 (exact: 0..255)
        tb = np.zeros((T, 8), dtype=np.float32)
        for w in range(2):
            for b in range(4):
                tb[:, w * 4 + b] = (words[:, w] >> (8 * b)) & 0xFF
        table_b = jnp.asarray(tb, dtype=jnp.bfloat16)

        @jax.jit
        def fetch_gather(table, idx):
            return table[idx]  # [R, 2] u32 row gather

        @jax.jit
        def fetch_onehot(table_b, idx):
            oh = jax.nn.one_hot(idx, T, dtype=jnp.bfloat16)  # [R, T]
            by = jnp.dot(oh, table_b,
                         preferred_element_type=jnp.float32)  # [R, 8]
            by = by.astype(jnp.uint32)
            sh = jnp.asarray([0, 8, 16, 24], dtype=jnp.uint32)
            lo = jnp.sum(by[:, 0:4] << sh[None, :], axis=1)
            hi = jnp.sum(by[:, 4:8] << sh[None, :], axis=1)
            return jnp.stack([lo, hi], axis=1)

        tg, out_g = bench(fetch_gather, table, idx)
        try:
            tm, out_m = bench(fetch_onehot, table_b, idx)
            exact = bool(jnp.all(out_g == out_m))
        except Exception as e:  # OOM on the [R, T] intermediate
            tm, exact = float("nan"), False
            print(f"R={R:8d} T={T:6d}: one-hot failed: {type(e).__name__}")
        print(f"R={R:8d} T={T:6d}: gather {tg*1e3:8.3f} ms   "
              f"one-hot {tm*1e3:8.3f} ms   exact={exact}", flush=True)


if __name__ == "__main__":
    main()
