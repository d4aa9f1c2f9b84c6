"""Pallas kernel tests (interpreter mode on the CPU mesh)."""

import jax.numpy as jnp
import numpy as np

from voxelhex_tpu.ops.shade_pallas import pallas_shade, shade_reference


def _data(R=3000, P=200, seed=0):
    rng = np.random.default_rng(seed)
    hit = jnp.asarray(rng.random(R) < 0.6)
    voxel = jnp.asarray(
        np.where(rng.random(R) < 0.1, 0x3FFFFFFE, rng.integers(0, P, R)),
        dtype=jnp.int32,
    )
    normal = rng.normal(size=(R, 3)).astype(np.float32)
    normal /= np.linalg.norm(normal, axis=-1, keepdims=True)
    palette = jnp.asarray(rng.random((P, 4)).astype(np.float32))
    bg = jnp.asarray([0.1, 0.2, 0.3], dtype=jnp.float32)
    return hit, voxel, jnp.asarray(normal), palette, bg


def test_pallas_shade_matches_reference():
    hit, voxel, normal, palette, bg = _data()
    a = shade_reference(hit, voxel, normal, palette, bg)
    b = pallas_shade(hit, voxel, normal, palette, bg, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_pallas_shade_unpadded_sizes():
    for R in (1, 1000, 1024, 1025, 4096):
        hit, voxel, normal, palette, bg = _data(R=R, P=16, seed=R)
        a = shade_reference(hit, voxel, normal, palette, bg)
        b = pallas_shade(hit, voxel, normal, palette, bg, interpret=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
