"""Synthetic bundle-problem generator for benchmarks and multi-chip dryruns.

Builds well-conditioned SfM problems of arbitrary scale directly as
BundleProblem arrays (no Python object graph), so benchmarks measure the
solver, not scene construction.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from pycolmap_tpu.ops import camera_models as cm
from pycolmap_tpu.ops import quaternion as qops
from pycolmap_tpu.sfm.bundle_adjustment import BundleProblem


def make_synthetic_bundle(
    num_images: int = 64,
    num_points: int = 8192,
    obs_per_point: int = 6,
    pixel_noise: float = 0.5,
    pose_noise: float = 0.01,
    point_noise: float = 0.02,
    focal: float = 1000.0,
    seed: int = 0,
    refine_intrinsics: bool = False,
) -> BundleProblem:
    """Cameras on a ring looking at a point cloud; each point observed by
    `obs_per_point` consecutive cameras. Ground-truth params perturbed by the
    given noise levels — BA should recover them to the pixel-noise floor."""
    rng = np.random.default_rng(seed)
    target = np.array([0.0, 0.0, 0.0])
    radius = 10.0

    centers = np.zeros((num_images, 3))
    R_list = np.zeros((num_images, 3, 3))
    for i in range(num_images):
        theta = 2 * np.pi * i / num_images
        c = np.array(
            [radius * np.sin(theta), 0.5 * np.sin(3 * theta), -radius * np.cos(theta)]
        )
        fwd = target - c
        fwd = fwd / np.linalg.norm(fwd)
        up = np.array([0.0, -1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        R_list[i] = np.stack([right, up2, fwd], axis=0)
        centers[i] = c

    quat_true = np.zeros((num_images, 4), dtype=np.float32)
    trans_true = np.zeros((num_images, 3), dtype=np.float32)
    for i in range(num_images):
        q = np.asarray(qops.matrix_to_quat(jnp.asarray(R_list[i], jnp.float32)))
        quat_true[i] = q
        trans_true[i] = -R_list[i] @ centers[i]

    points_true = rng.uniform(-3, 3, (num_points, 3)).astype(np.float32)

    # observations: each point seen by obs_per_point consecutive images
    start = rng.integers(0, num_images, num_points)
    obs_point = np.repeat(np.arange(num_points), obs_per_point)
    obs_image = (
        start[:, None] + np.arange(obs_per_point)[None, :]
    ).reshape(-1) % num_images
    M = len(obs_image)

    # project ground truth
    Xc = np.einsum(
        "mij,mj->mi", R_list[obs_image], points_true[obs_point]
    ) + trans_true[obs_image]
    z = np.maximum(Xc[:, 2], 1e-3)
    uv = Xc[:, :2] / z[:, None]
    cx, cy = 2000.0, 1500.0
    xy = focal * uv + np.array([cx, cy])
    xy += rng.normal(0, pixel_noise, xy.shape)

    # perturbed initial parameters
    quat0 = np.zeros_like(quat_true)
    for i in range(num_images):
        if i < 2:
            quat0[i] = quat_true[i]
        else:
            aa = rng.normal(0, pose_noise, 3).astype(np.float32)
            quat0[i] = np.asarray(
                qops.quat_mul(
                    qops.axis_angle_to_quat(jnp.asarray(aa)), jnp.asarray(quat_true[i])
                )
            )
    trans0 = trans_true + rng.normal(0, pose_noise, trans_true.shape).astype(
        np.float32
    )
    trans0[:2] = trans_true[:2]
    points0 = points_true + rng.normal(0, point_noise, points_true.shape).astype(
        np.float32
    )

    intr = np.zeros((1, cm.MAX_PARAMS), dtype=np.float32)
    intr[0, :4] = [focal, cx, cy, 0.0]  # SIMPLE_RADIAL
    intr_free = np.zeros((1, cm.MAX_PARAMS), dtype=np.float32)
    if refine_intrinsics:
        intr_free[0, 0] = 1.0
        intr_free[0, 3] = 1.0

    pose_free = np.ones((num_images, 6), dtype=np.float32)
    pose_free[0] = 0.0  # gauge
    pose_free[1, 3] = 0.0

    return BundleProblem(
        cam_quat=jnp.asarray(quat0),
        cam_trans=jnp.asarray(trans0),
        intrinsics=jnp.asarray(intr),
        points=jnp.asarray(points0),
        model_id=cm.model_id_from_name("SIMPLE_RADIAL"),
        obs_image_idx=jnp.asarray(obs_image.astype(np.int32)),
        obs_camera_idx=jnp.zeros(M, dtype=jnp.int32),
        obs_point_idx=jnp.asarray(obs_point.astype(np.int32)),
        obs_xy=jnp.asarray(xy.astype(np.float32)),
        obs_mask=jnp.ones(M, dtype=jnp.float32),
        pose_free=jnp.asarray(pose_free),
        intr_free=jnp.asarray(intr_free),
        point_free=jnp.ones(num_points, dtype=jnp.float32),
    )
