"""Absolute camera pose from 2D-3D matches (API parity: pycolmap/estimators/absolute_pose.h).

RANSAC over batched P3P hypotheses (upstream P3PEstimator), EPnP local
optimization (upstream EPNPEstimator, the non-minimal solver), then LM pose
refinement on inliers in the tangent space — the JAX counterpart of the
Ceres refinement (ref: absolute_pose.h:106-158). Default max_error = 12px
(ref: absolute_pose.h:106).
"""

from __future__ import annotations

import copy

import jax
import jax.numpy as jnp
import numpy as np

from pycolmap_tpu.estimators.ransac import BatchedLORANSAC, RANSACOptions
from pycolmap_tpu.geometry import Rigid3d, Rotation3d
from pycolmap_tpu.ops import quaternion as qops
from pycolmap_tpu.utils.options import BaseOptions, options_dataclass


@options_dataclass
class AbsolutePoseEstimationOptions(BaseOptions):
    estimate_focal_length: bool = False
    ransac: RANSACOptions = None

    def __post_init__(self):
        if self.ransac is None:
            self.ransac = RANSACOptions()
            self.ransac.max_error = 12.0


@options_dataclass
class AbsolutePoseRefinementOptions(BaseOptions):
    refine_focal_length: bool = False
    refine_extra_params: bool = False
    max_num_iterations: int = 100
    gradient_tolerance: float = 1.0
    loss_function_scale: float = 1.0
    print_summary: bool = False


def _reproj_batched(model, x, X):
    """model = (quat [K,S,4], trans [K,S,3]); x [N,2] normalized; X [N,3]."""
    quat, trans = model
    p_cam = qops.quat_rotate(quat[:, :, None, :], X[None, None]) + trans[:, :, None, :]
    z = p_cam[..., 2]
    behind = z <= 1e-8
    z_safe = jnp.where(behind, 1.0, z)
    proj = p_cam[..., :2] / z_safe[..., None]
    err = jnp.sum((proj - x[None, None]) ** 2, axis=-1)
    return jnp.where(behind, 1e12, err)


def _minimal_p3p(idx, x, X):
    from pycolmap_tpu.ops import solvers

    quat, trans, valid = solvers.p3p(x[idx], X[idx])
    return (quat, trans), valid  # [K,4,...], [K,4]


def _refit_pnp(weights, x, X):
    # EPnP as the non-minimal local-opt solver (ref absolute_pose.h:148
    # binds P3P/EPnP); measured vs the former DLT-PnP stand-in on noisy
    # synthetic PnP: ~1.5-1.8x lower rotation error (tests/test_estimators
    # epnp A/B)
    from pycolmap_tpu.ops import solvers

    quat, trans = solvers.epnp(x[None], X[None], weights[None])
    return (quat[:, None], trans[:, None]), jnp.ones((1, 1), dtype=bool)


_engine = BatchedLORANSAC(
    minimal_solver=_minimal_p3p,
    residual_fn=_reproj_batched,
    sample_size=3,
    refit_solver=_refit_pnp,
    # one chunk covers the default min_num_trials=1000: registration then
    # costs a single device round trip instead of two
    chunk_size=1024,
    name="p3p",
)


# ---------------------------------------------------------------------------
# LM pose refinement (6-dof tangent; optional focal scale) — jitted
# ---------------------------------------------------------------------------


def _pose_residuals(params, quat0, x, X, w):
    """params: [6(+1)] tangent update (rot, trans[, log focal scale])."""
    quat = qops.quat_boxplus(quat0, params[:3])
    trans = params[3:6]
    p_cam = qops.quat_rotate(quat[None, :], X) + trans[None, :]
    z = jnp.where(jnp.abs(p_cam[..., 2]) < 1e-8, 1e-8, p_cam[..., 2])
    proj = p_cam[..., :2] / z[..., None]
    if params.shape[0] > 6:
        proj = proj * jnp.exp(params[6])
    r = (proj - x) * w[:, None]
    return r.reshape(-1)


@jax.jit
def _refine_pose_lm(quat0, trans0, x, X, w, loss_scale):
    """Levenberg-Marquardt with Cauchy IRLS weights; fixed iteration count."""
    num_params = 6

    def residual_fn(params, irls_w):
        return _pose_residuals(params, quat0, x, X, w * irls_w)

    def cauchy_weights(params):
        r = _pose_residuals(params, quat0, x, X, w).reshape(-1, 2)
        sq = jnp.sum(r * r, axis=-1)
        return 1.0 / jnp.sqrt(1.0 + sq / jnp.maximum(loss_scale**2, 1e-12))

    params0 = jnp.concatenate([jnp.zeros(3), trans0])

    def step(state, _):
        params, lam = state
        irls_w = cauchy_weights(params)
        J = jax.jacfwd(residual_fn)(params, irls_w)
        r = residual_fn(params, irls_w)
        JtJ = J.T @ J
        Jtr = J.T @ r
        H = JtJ + lam * jnp.diag(jnp.maximum(jnp.diag(JtJ), 1e-8))
        delta = jnp.linalg.solve(H, Jtr)
        new_params = params - delta
        new_cost = jnp.sum(residual_fn(new_params, irls_w) ** 2)
        old_cost = jnp.sum(r**2)
        improved = new_cost < old_cost
        params = jnp.where(improved, new_params, params)
        lam = jnp.where(improved, jnp.maximum(lam * 0.33, 1e-8), lam * 3.0)
        return (params, lam), None

    (params, _), _ = jax.lax.scan(step, (params0, jnp.float32(1e-3)), None, length=20)
    quat = qops.quat_boxplus(quat0, params[:3])
    return quat, params[3:6]


def refine_pose_normalized(quat, trans, x_norm, X, inlier_mask, loss_scale=1.0):
    """LM-refine cam_from_world on normalized 2D points. Returns (quat, trans).

    Inputs are padded to power-of-two row counts (weight 0) so the jitted LM
    compiles once per bucket rather than once per match count.
    """
    n = len(x_norm)
    n_pad = 256
    while n_pad < n:
        n_pad *= 4
    xp = np.zeros((n_pad, 2), dtype=np.float32)
    Xp = np.zeros((n_pad, 3), dtype=np.float32)
    Xp[:, 2] = 1.0  # benign padding geometry (in front of any camera)
    wp = np.zeros(n_pad, dtype=np.float32)
    xp[:n] = x_norm
    Xp[:n] = X
    wp[:n] = np.asarray(inlier_mask, dtype=np.float32)
    import sys as _sys

    from pycolmap_tpu.utils import aot_cache

    q, t = jax.device_get(
        aot_cache.cached_call(
            _refine_pose_lm, "pose_lm",
            aot_cache.source_salt(_sys.modules[__name__], qops), {},
            np.asarray(quat, np.float32),
            np.asarray(trans, np.float32),
            xp, Xp, wp,
            np.float32(loss_scale),
        )
    )
    return np.asarray(q, dtype=np.float64), np.asarray(t, dtype=np.float64)


def _rigid3d_from_wxyz(quat, trans):
    return Rigid3d(
        Rotation3d(np.array([quat[1], quat[2], quat[3], quat[0]])),
        np.asarray(trans, dtype=np.float64),
    )


def estimate_absolute_pose(
    points2D,
    points3D,
    camera,
    estimation_options: AbsolutePoseEstimationOptions = None,
    refinement_options: AbsolutePoseRefinementOptions = None,
    return_covariance: bool = False,
):
    """RANSAC P3P + LM refine. Returns dict(cam_from_world, num_inliers, inliers).

    points2D: Nx2 pixels; points3D: Nx3 world. max_error in pixels
    (ref: absolute_pose.h:148-157).
    """
    if estimation_options is None:
        estimation_options = AbsolutePoseEstimationOptions()
    if refinement_options is None:
        refinement_options = AbsolutePoseRefinementOptions()
    points2D = np.asarray(points2D, dtype=np.float64)
    points3D = np.asarray(points3D, dtype=np.float64)
    if len(points2D) < 3:
        return None
    x_norm = np.asarray(camera.cam_from_img(points2D), dtype=np.float32)
    X = np.asarray(points3D, dtype=np.float32)

    opt = copy.deepcopy(estimation_options.ransac)
    opt.max_error = estimation_options.ransac.max_error / camera.mean_focal_length()
    report = _engine.estimate(opt, x_norm, X, seed=0)
    if not report.success:
        return None
    quat, trans = report.model
    quat, trans = refine_pose_normalized(
        quat,
        trans,
        x_norm,
        X,
        report.inlier_mask,
        loss_scale=refinement_options.loss_function_scale
        * opt.max_error,
    )
    result = {
        "cam_from_world": _rigid3d_from_wxyz(quat, trans),
        "num_inliers": report.support_num_inliers,
        "inliers": report.inlier_mask,
    }
    if return_covariance:
        # Gauss-Newton covariance approximation at the solution (6x6)
        w = jnp.asarray(report.inlier_mask, dtype=jnp.float32)
        params = jnp.concatenate(
            [jnp.zeros(3), jnp.asarray(trans, jnp.float32)]
        )
        J = jax.jacfwd(
            lambda p: _pose_residuals(
                p, jnp.asarray(quat, jnp.float32),
                jnp.asarray(x_norm), jnp.asarray(X), w,
            )
        )(params)
        JtJ = np.asarray(J.T @ J, dtype=np.float64)
        result["covariance"] = np.linalg.pinv(JtJ)
    return result


def refine_absolute_pose(
    cam_from_world: Rigid3d,
    points2D,
    points3D,
    inlier_mask,
    camera,
    refinement_options: AbsolutePoseRefinementOptions = None,
    return_covariance: bool = False,
):
    """Refine a pose from given inliers (ref: absolute_pose.h:158-166)."""
    if refinement_options is None:
        refinement_options = AbsolutePoseRefinementOptions()
    x_norm = np.asarray(camera.cam_from_img(np.asarray(points2D)), dtype=np.float32)
    X = np.asarray(points3D, dtype=np.float32)
    q_xyzw = cam_from_world.rotation.quat
    quat0 = np.array([q_xyzw[3], q_xyzw[0], q_xyzw[1], q_xyzw[2]])
    quat, trans = refine_pose_normalized(
        quat0,
        cam_from_world.translation,
        x_norm,
        X,
        np.asarray(inlier_mask, dtype=bool),
        loss_scale=refinement_options.loss_function_scale,
    )
    return {"cam_from_world": _rigid3d_from_wxyz(quat, trans)}


absolute_pose_estimation = estimate_absolute_pose
pose_refinement = refine_absolute_pose
