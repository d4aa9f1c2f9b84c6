"""Golden regression anchors (VERDICT r1 weak #7).

The live parity tests compare the device renderer against the oracle — a
semantic drift that changes BOTH consistently passes them.  These tests pin
today's verified behavior to frozen artifacts in tests/goldens/:

* oracle hit/voxel/point results on fixed ray sets (bench scene + a 64^3
  crop of the real gingerbread .vox asset),
* BitGrid u8 frames, compared bit-exact.

Regenerate with ``python tools/make_goldens.py`` ONLY for intentional
semantic changes, and commit the diff with the reasoning.
"""

import os

import numpy as np
import pytest

GOLD = os.path.join(os.path.dirname(__file__), "goldens")
GINGER = "/root/reference/whisp/assets/models/gingerbread_house_by_kirra_luan.vox"


def _check_rays(flat, path, point_tol=1e-4):
    from voxelhex_tpu.render.oracle import get_by_ray

    g = np.load(path)
    origins, dirs = g["origins"], g["dirs"]
    for i in range(len(origins)):
        h = get_by_ray(flat, origins[i], dirs[i])
        assert (h is not None) == bool(g["hit"][i]), i
        if h is not None:
            assert h.voxel == int(g["voxel"][i]), i
            np.testing.assert_allclose(h.point, g["point"][i],
                                       atol=point_tol, err_msg=str(i))
    return origins, dirs, g


def _check_device(flat, origins, dirs, g):
    from voxelhex_tpu.render.bitgrid import BitGridRenderer

    r = BitGridRenderer(flat)
    hit, voxel, _hv, _hp, _hn = r.trace(origins, dirs)
    np.testing.assert_array_equal(np.asarray(hit), g["hit"])
    voxel = np.asarray(voxel)
    for i in np.nonzero(g["hit"])[0]:
        assert int(voxel[i]) == int(g["voxel"][i]), i
    return r


def test_bench_scene_goldens():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from bench import build_scene
    from voxelhex_tpu.render.camera import orbit_camera
    from voxelhex_tpu.tree.flat import flatten

    flat = flatten(build_scene())
    origins, dirs, g = _check_rays(flat, os.path.join(GOLD, "bench_rays.npz"))
    r = _check_device(flat, origins, dirs, g)

    frame = np.asarray(r.render(orbit_camera(128.0, resolution=(160, 90)),
                                out_u8=True))
    golden = np.load(os.path.join(GOLD, "bench_frame.npy"))
    np.testing.assert_array_equal(frame, golden)


@pytest.mark.skipif(not os.path.exists(GINGER),
                    reason="reference gingerbread asset unavailable")
def test_gingerbread_crop_goldens():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.make_goldens import ginger_crop_tree
    from voxelhex_tpu.render.bitgrid import BitGridRenderer
    from voxelhex_tpu.render.camera import orbit_camera
    from voxelhex_tpu.tree.flat import flatten

    flat = flatten(ginger_crop_tree())
    origins, dirs, g = _check_rays(flat, os.path.join(GOLD, "ginger_rays.npz"))
    _check_device(flat, origins, dirs, g)

    r = BitGridRenderer(flat)
    frame = np.asarray(r.render(orbit_camera(64.0, resolution=(128, 72)),
                                out_u8=True))
    golden = np.load(os.path.join(GOLD, "ginger_frame.npy"))
    np.testing.assert_array_equal(frame, golden)
