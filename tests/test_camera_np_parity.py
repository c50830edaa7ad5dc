"""Cross-check the numpy camera-model twins against the JAX kernels."""

import numpy as np
import pytest

import jax.numpy as jnp

from pycolmap_tpu.ops import camera_models as cm
from pycolmap_tpu.ops.camera_models_np import cam_from_img_np, img_from_cam_np

from test_camera_models import make_params


@pytest.mark.parametrize("info", cm.CAMERA_MODELS, ids=lambda i: i.name)
def test_numpy_matches_jax(info):
    p = make_params(info)
    rng = np.random.default_rng(info.model_id)
    uv = rng.uniform(-0.3, 0.3, size=(32, 2))
    xy_np = img_from_cam_np(info.model_id, p, uv)
    xy_jax = np.asarray(
        cm.img_from_cam_fixed(info.model_id)(
            jnp.array(p, jnp.float32), jnp.array(uv, jnp.float32)
        )
    )
    assert np.abs(xy_np - xy_jax).max() < 1e-2  # f32 kernel vs f64 numpy

    uv_back = cam_from_img_np(info.model_id, p, xy_np)
    assert np.abs(uv_back - uv).max() < 1e-6
