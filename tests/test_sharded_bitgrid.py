"""Mesh-sharded BitGrid forward rendering tests (8-device CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np

from voxelhex_tpu.parallel.bitgrid_sharded import (
    measure_scaling,
    shard_rays,
    sharded_render_fn,
)
from voxelhex_tpu.render.bitgrid import BitGridRenderer
from voxelhex_tpu.render.camera import orbit_camera
from voxelhex_tpu.tree.boxtree import Albedo, BoxTree


def make_renderer():
    tree = BoxTree(64, 4, auto_simplify=False)
    rng = np.random.default_rng(4)
    for _ in range(400):
        p = tuple(int(v) for v in rng.integers(0, 64, 3))
        tree.insert(p, Albedo.from_u32(0xFF0000FF))
    return BitGridRenderer(tree)


def test_sharded_matches_single():
    assert len(jax.devices()) == 8
    r = make_renderer()
    cam = orbit_camera(64.0, resolution=(40, 24))
    o, d = cam.rays()
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)

    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()), ("rays",))
    fn = sharded_render_fn(r, mesh)
    (o_sh, d_sh), n = shard_rays(mesh, o, d)
    bg = jnp.zeros(3, dtype=jnp.float32)
    sharded = np.asarray(fn(r.tree, o_sh, d_sh, bg))[:n]

    single = np.asarray(
        r._shade_batch(r.tree, jnp.asarray(o), jnp.asarray(d), bg)
    )
    np.testing.assert_allclose(sharded, single, atol=1e-5)


def test_measure_scaling_runs():
    r = make_renderer()
    cam = orbit_camera(64.0, resolution=(16, 16))
    o, d = cam.rays()
    rates = measure_scaling(r, o, d, device_counts=[1, 2])
    assert set(rates) == {1, 2}
    assert all(v > 0 for v in rates.values())
