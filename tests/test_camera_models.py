"""Unit tests: camera model projections (all 11 models)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pycolmap_tpu.ops import camera_models as cm
from pycolmap_tpu.scene import Camera


def make_params(info):
    p = np.zeros(cm.MAX_PARAMS)
    if len(info.focal_idxs) == 1:
        p[info.focal_idxs[0]] = 500.0
    else:
        p[info.focal_idxs[0]] = 500.0
        p[info.focal_idxs[1]] = 510.0
    p[info.principal_idxs[0]] = 320.0
    p[info.principal_idxs[1]] = 240.0
    for j, e in enumerate(info.extra_idxs):
        p[e] = 0.02 * (0.5 ** j) * (1 if j % 2 == 0 else -1)
    if info.name == "FOV":
        p[info.extra_idxs[0]] = 0.9
    return p


@pytest.mark.parametrize("info", cm.CAMERA_MODELS, ids=lambda i: i.name)
def test_roundtrip(info):
    p = make_params(info)
    rng = np.random.default_rng(info.model_id)
    uv = rng.uniform(-0.3, 0.3, size=(64, 2)).astype(np.float32)
    xy = cm.img_from_cam_fixed(info.model_id)(jnp.array(p, jnp.float32), jnp.array(uv))
    uv2 = cm.cam_from_img_fixed(info.model_id)(jnp.array(p, jnp.float32), xy)
    assert np.abs(np.array(uv2) - uv).max() < 1e-5


@pytest.mark.parametrize("info", cm.CAMERA_MODELS, ids=lambda i: i.name)
def test_switch_dispatch_matches_fixed(info):
    p = jnp.array(make_params(info), jnp.float32)
    uv = jnp.array([[0.1, -0.2], [0.0, 0.0], [0.25, 0.3]], jnp.float32)
    a = cm.img_from_cam(jnp.int32(info.model_id), p, uv)
    b = cm.img_from_cam_fixed(info.model_id)(p, uv)
    assert np.allclose(np.array(a), np.array(b))


def test_pinhole_exact():
    p = jnp.array(cm.pad_params([500.0, 505.0, 320.0, 240.0]), jnp.float32)
    uv = jnp.array([[0.1, 0.2]], jnp.float32)
    xy = cm.img_from_cam_fixed(1)(p, uv)
    assert np.allclose(np.array(xy), [[500 * 0.1 + 320, 505 * 0.2 + 240]], atol=1e-4)


def test_differentiable():
    import jax

    p = cm.pad_params([500.0, 320.0, 240.0, 0.05])
    f = lambda params: cm.img_from_cam_fixed(2)(params, jnp.array([[0.1, 0.2]]))[0, 0]
    g = jax.grad(f)(p)
    assert np.isfinite(np.array(g)).all()
    assert abs(float(g[0]) - 0.1 * (1 + 0.05 * 0.05)) < 1e-4


class TestCameraObject:
    def test_create(self):
        cam = Camera.create(1, "SIMPLE_RADIAL", 1000.0, 640, 480)
        assert cam.focal_length == 1000.0
        assert cam.principal_point_x == 320.0
        assert cam.principal_point_y == 240.0
        assert cam.model_id == 2

    def test_project_unproject(self):
        cam = Camera.create(1, "OPENCV", 800.0, 640, 480)
        cam.params[4:8] = [0.1, -0.02, 0.001, 0.002]
        rng = np.random.default_rng(0)
        uv = rng.uniform(-0.3, 0.3, (32, 2))
        xy = cam.img_from_cam(uv)
        uv2 = cam.cam_from_img(xy)
        assert np.abs(uv2 - uv).max() < 1e-4

    def test_homogeneous_input(self):
        cam = Camera.create(1, "PINHOLE", 500.0, 640, 480)
        xyz = np.array([[0.5, 0.2, 2.0]])
        xy = cam.img_from_cam(xyz)
        assert np.allclose(xy, cam.img_from_cam(xyz[:, :2] / xyz[:, 2:]))

    def test_calibration_matrix(self):
        cam = Camera.create(1, "PINHOLE", 500.0, 640, 480)
        K = cam.calibration_matrix()
        assert K[0, 0] == 500.0 and K[1, 2] == 240.0

    def test_bogus_params(self):
        cam = Camera.create(1, "SIMPLE_RADIAL", 500.0, 640, 480)
        assert not cam.has_bogus_params(0.1, 10.0, 1.0)
        cam.params[3] = 5.0
        assert cam.has_bogus_params(0.1, 10.0, 1.0)

    def test_rescale(self):
        cam = Camera.create(1, "PINHOLE", 500.0, 640, 480)
        cam.rescale(320, 240)
        assert cam.width == 320
        assert np.isclose(cam.focal_length_x, 250.0)
        assert np.isclose(cam.principal_point_x, 160.0)
