"""Essential matrix estimation (API parity: pycolmap/estimators/essential_matrix.h).

Pipeline mirrors the reference (essential_matrix.h:25-93): normalize pixel
points through the cameras, scale the pixel threshold to normalized units
(:42-47), run LORANSAC, then recover the relative pose by cheirality (:77-83).

Minimal solver: batched Nistér 5-point (ops/solvers.essential_5pt — degree-10
roots by tan-angle bisection, no nonsymmetric eig), matching the reference's
sample complexity (essential_matrix.h:48-52); local optimization refits with
the weighted 8-point-on-manifold solver.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pycolmap_tpu.estimators.fundamental_matrix import _sampson_batched
from pycolmap_tpu.estimators.ransac import BatchedLORANSAC, RANSACOptions
from pycolmap_tpu.geometry import Rigid3d, Rotation3d
from pycolmap_tpu.ops import epipolar, solvers


def _minimal_5pt(idx, x1, x2):
    return solvers.essential_5pt(x1[idx], x2[idx])  # [K,10,3,3], [K,10]


def _refit_8pt(weights, x1, x2):
    E = solvers.essential_8pt(x1[None], x2[None], weights[None])
    return E[:, None], jnp.ones((1, 1), dtype=bool)


_engine = BatchedLORANSAC(
    minimal_solver=_minimal_5pt,
    residual_fn=_sampson_batched,
    sample_size=5,
    refit_solver=_refit_8pt,
    chunk_size=128,  # x10 solutions per sample = 1280 hypotheses per chunk
    name="essential5pt",
)

_pose_from_essential_jit = jax.jit(epipolar.pose_from_essential)


def _pose_from_essential_padded(E, x1, x2, inlier_mask):
    """One jitted dispatch with pow2-padded shapes (bounded compile count).

    The eager-op version costs dozens of device round-trips per call, which
    dominated initial-pair search wall time on remote backends.
    """
    n = len(x1)
    n_pad = 256
    while n_pad < n:
        n_pad *= 4
    x1p = np.zeros((n_pad, 2), dtype=np.float32)
    x2p = np.zeros((n_pad, 2), dtype=np.float32)
    maskp = np.zeros(n_pad, dtype=bool)
    x1p[:n] = x1
    x2p[:n] = x2
    maskp[:n] = inlier_mask
    quat, trans, X, front = jax.device_get(
        _pose_from_essential_jit(
            np.asarray(E, dtype=np.float32), x1p, x2p, maskp
        )
    )
    return quat, trans, X[:n], front[:n]


def estimate_essential_matrix(
    points2D1, points2D2, camera1, camera2, options: RANSACOptions = None
):
    """LORANSAC E estimation + cheirality pose recovery.

    Returns dict(E, cam2_from_cam1, num_inliers, inliers) or None.
    points are pixel coordinates; options.max_error is in pixels and is
    rescaled by the mean focal lengths (ref: essential_matrix.h:42-47).
    """
    if options is None:
        options = RANSACOptions()
    options.check()
    x1 = np.asarray(camera1.cam_from_img(points2D1), dtype=np.float32)
    x2 = np.asarray(camera2.cam_from_img(points2D2), dtype=np.float32)
    import copy

    opt = copy.deepcopy(options)
    opt.max_error = 0.5 * (
        options.max_error / camera1.mean_focal_length()
        + options.max_error / camera2.mean_focal_length()
    )
    report = _engine.estimate(opt, x1, x2, seed=0)
    if not report.success:
        return None
    E = np.asarray(report.model, dtype=np.float64)
    quat, trans, points3D, front = _pose_from_essential_padded(
        E, x1, x2, report.inlier_mask
    )
    quat = np.asarray(quat, dtype=np.float64)
    cam2_from_cam1 = Rigid3d(
        Rotation3d(np.array([quat[1], quat[2], quat[3], quat[0]])),
        np.asarray(trans, dtype=np.float64),
    )
    return {
        "E": E,
        "cam2_from_cam1": cam2_from_cam1,
        "num_inliers": report.support_num_inliers,
        "inliers": report.inlier_mask,
        "points3D": np.asarray(points3D, dtype=np.float64)[np.asarray(front)],
        "num_trials": report.num_trials,
    }


essential_matrix_estimation = estimate_essential_matrix
