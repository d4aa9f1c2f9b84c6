"""Exactness of the MXU one-hot word fetch (benches/ab_onehot_fetch.py).

PERF.md "MXU one-hot fetch" records that a u32 occupancy word can be
fetched EXACTLY through a bf16 matmul by splitting it into 4 bytes
(integers <= 256 are exactly representable in bf16's 8-bit significand)
and recombining in u32.  This test pins that property — the measured
4.8x small-table win is only usable if the reconstruction is bit-exact
for arbitrary 32-bit patterns.
"""

import numpy as np
import jax
import jax.numpy as jnp


def test_onehot_byte_split_fetch_is_bit_exact():
    rng = np.random.default_rng(11)
    R, T = 512, 128
    words = rng.integers(0, 1 << 32, size=(T, 2), dtype=np.uint64)
    # include the extreme patterns explicitly
    words[0] = [0, 0]
    words[1] = [0xFFFFFFFF, 0xFFFFFFFF]
    words[2] = [0x80000001, 0x7FFFFFFE]
    table = jnp.asarray(words.astype(np.uint32))
    idx_np = rng.integers(0, T, size=R, dtype=np.int32)
    idx_np[:3] = [0, 1, 2]
    idx = jnp.asarray(idx_np)

    tb = np.zeros((T, 8), dtype=np.float32)
    for w in range(2):
        for b in range(4):
            tb[:, w * 4 + b] = (words[:, w] >> (8 * b)) & 0xFF
    table_b = jnp.asarray(tb, dtype=jnp.bfloat16)
    # the byte split itself must be lossless in bf16
    assert np.array_equal(np.asarray(table_b, dtype=np.float32), tb)

    oh = jax.nn.one_hot(idx, T, dtype=jnp.bfloat16)
    by = jnp.dot(oh, table_b, preferred_element_type=jnp.float32)
    by = by.astype(jnp.uint32)
    sh = jnp.asarray([0, 8, 16, 24], dtype=jnp.uint32)
    lo = jnp.sum(by[:, 0:4] << sh[None, :], axis=1)
    hi = jnp.sum(by[:, 4:8] << sh[None, :], axis=1)
    out = np.asarray(jnp.stack([lo, hi], axis=1))

    np.testing.assert_array_equal(out, np.asarray(table[idx]))
