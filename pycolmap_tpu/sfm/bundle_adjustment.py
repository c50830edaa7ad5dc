"""TPU-native bundle adjustment: Levenberg–Marquardt with Schur-eliminated
points and preconditioned CG on the reduced camera system.

This replaces Ceres (ref: pipeline/sfm.h:95-103, 260-333; upstream
controllers/bundle_adjustment + Ceres sparse Schur) with a fully batched,
jittable LM:

- residuals: r = img_from_cam(cam_from_world * X) - obs, one [M, 2] tensor
  over all observations (the call-stack hot loop of SURVEY.md §3.4);
- robust losses TRIVIAL / SOFT_L1 / CAUCHY via IRLS weights
  (ref: pipeline/sfm.h:260-264);
- per-observation Jacobians from forward-mode autodiff (exact, batched);
- the reduced camera system S Δc = g is never formed: CG sees S through a
  residual-level matvec (two segment-sums through the point blocks), i.e.
  Ceres' ITERATIVE_SCHUR + SCHUR_JACOBI, which maps onto gathers,
  segment-sums and small matmuls — all TPU-friendly;
- point updates by closed-form back-substitution through the 3x3 blocks.

Parameter blocks: image poses [num_images, 6] (tangent), shared camera
intrinsics [num_cameras, MAX_PARAMS] (masked by refine options), points
[num_points, 3]. Gauge fixing via per-image constant masks (mirrors upstream
BundleAdjustmentConfig constant poses / constant tvec components).

Distribution (SURVEY.md §2c P4): every reduction in this file is a
segment-sum over the observation axis; sharding observations (and their
points) across a device mesh turns the camera-block reductions into psums.
See parallel/sharded_ba.py for the pjit wrapper.
"""

from __future__ import annotations

import enum
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pycolmap_tpu.ops import camera_models as cm
from pycolmap_tpu.ops import quaternion as qops
from pycolmap_tpu.utils.options import BaseOptions, options_dataclass


class LossFunctionType(enum.IntEnum):
    TRIVIAL = 0
    SOFT_L1 = 1
    CAUCHY = 2


@options_dataclass
class BundleAdjustmentOptions(BaseOptions):
    """Mirrors reference BundleAdjustmentOptions (ref: pipeline/sfm.h:260-333)."""

    loss_function_type: LossFunctionType = LossFunctionType.TRIVIAL
    loss_function_scale: float = 1.0
    refine_focal_length: bool = True
    refine_principal_point: bool = False
    refine_extra_params: bool = True
    refine_extrinsics: bool = True
    max_num_iterations: int = 100
    max_linear_solver_iterations: int = 200
    # forcing-sequence (inexact Newton) tolerance for the inner PCG solve:
    # CG stops when the preconditioned residual norm drops below eta x its
    # initial value, or at the iteration cap (Ceres Solver::Options::eta for
    # ITERATIVE_SCHUR, reached via pipeline/sfm.h:266-295; Ceres default 0.1)
    eta: float = 0.1
    function_tolerance: float = 0.0
    gradient_tolerance: float = 0.0
    parameter_tolerance: float = 0.0
    min_num_residuals_for_multi_threading: int = 50000
    print_summary: bool = True
    # device mesh for the solve: "auto" (default mesh / all local devices on
    # multi-chip hardware), "none", an int device count, or a Mesh object.
    # TPU-native analog of the reference's Ceres num_threads
    # (ref: pipeline/sfm.h:294); see parallel/device_ctx.py
    devices: object = "auto"


class BundleProblem(NamedTuple):
    """SoA bundle problem; all arrays device-ready (f32, padded)."""

    # parameters
    cam_quat: jnp.ndarray  # [I, 4] wxyz cam_from_world
    cam_trans: jnp.ndarray  # [I, 3]
    intrinsics: jnp.ndarray  # [C, MAX_PARAMS]
    points: jnp.ndarray  # [P, 3]
    # structure
    model_id: int  # static: single camera model id for the problem
    obs_image_idx: jnp.ndarray  # [M] int32
    obs_camera_idx: jnp.ndarray  # [M] int32 (camera of the image)
    obs_point_idx: jnp.ndarray  # [M] int32
    obs_xy: jnp.ndarray  # [M, 2] pixel observations
    obs_mask: jnp.ndarray  # [M] f32 validity (padding = 0)
    # freedoms
    pose_free: jnp.ndarray  # [I, 6] f32 mask (gauge fixing / constant poses)
    intr_free: jnp.ndarray  # [C, MAX_PARAMS] f32 mask
    point_free: jnp.ndarray  # [P] f32 mask

    @property
    def num_images(self):
        return self.cam_quat.shape[0]

    @property
    def num_cameras(self):
        return self.intrinsics.shape[0]

    @property
    def num_points(self):
        return self.points.shape[0]

    @property
    def num_obs(self):
        return self.obs_xy.shape[0]


class BASummary(NamedTuple):
    initial_cost: float
    final_cost: float
    num_iterations: int
    num_residuals: int

    def __repr__(self):
        return (
            f"BASummary(initial_cost={self.initial_cost:.6g}, "
            f"final_cost={self.final_cost:.6g}, "
            f"iterations={self.num_iterations}, residuals={self.num_residuals})"
        )


# ---------------------------------------------------------------------------
# residuals and robust weights
# ---------------------------------------------------------------------------


def _project(model_id, intr, quat, trans, point):
    """Single-observation projection to pixels (vmapped over obs)."""
    p_cam = qops.quat_rotate(quat, point) + trans
    z = p_cam[2]
    z_safe = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    uv = p_cam[:2] / z_safe
    return cm.img_from_cam_fixed(model_id)(intr, uv[None, :])[0]


def _obs_residual(model_id, pose_tangent, intr, point, quat0, trans0, xy):
    """Residual at tangent-space pose update; linearization point = zeros."""
    quat = qops.quat_boxplus(quat0, pose_tangent[:3])
    trans = trans0 + pose_tangent[3:]
    return _project(model_id, intr, quat, trans, point) - xy


def _robust_weight(sq_norm, loss_type: int, scale):
    """IRLS weight sqrt(rho'(s)) for the robust losses (s = squared norm)."""
    s = sq_norm / jnp.maximum(scale * scale, 1e-12)
    if loss_type == int(LossFunctionType.TRIVIAL):
        return jnp.ones_like(sq_norm)
    if loss_type == int(LossFunctionType.SOFT_L1):
        # rho(s) = 2 (sqrt(1+s) - 1); rho'(s) = 1/sqrt(1+s)
        return (1.0 + s) ** -0.25
    # CAUCHY: rho(s) = log(1+s); rho'(s) = 1/(1+s)
    return 1.0 / jnp.sqrt(1.0 + s)


def _robust_cost(sq_norm, loss_type: int, scale):
    sc = jnp.maximum(scale * scale, 1e-12)
    s = sq_norm / sc
    if loss_type == int(LossFunctionType.TRIVIAL):
        return sq_norm
    if loss_type == int(LossFunctionType.SOFT_L1):
        return 2.0 * sc * (jnp.sqrt(1.0 + s) - 1.0)
    return sc * jnp.log1p(s)


# ---------------------------------------------------------------------------
# the jitted LM solver
# ---------------------------------------------------------------------------


def _gather_obs_params(problem: BundleProblem, quat, trans, intr, points):
    q = quat[problem.obs_image_idx]
    t = trans[problem.obs_image_idx]
    k = intr[problem.obs_camera_idx]
    X = points[problem.obs_point_idx]
    return q, t, k, X


def _residuals_and_jacobians(problem: BundleProblem, quat, trans, intr, points):
    """Batched residuals [M,2] + Jacobians w.r.t. pose(6)/intr(MAXP)/point(3)."""
    q, t, k, X = _gather_obs_params(problem, quat, trans, intr, points)

    def f(pose_tangent, intr_i, point_i, q0, t0, xy):
        return _obs_residual(problem.model_id, pose_tangent, intr_i, point_i, q0, t0, xy)

    zeros6 = jnp.zeros((problem.num_obs, 6), dtype=quat.dtype)
    res = jax.vmap(f)(zeros6, k, X, q, t, problem.obs_xy)
    J_pose, J_intr, J_pt = jax.vmap(jax.jacfwd(f, argnums=(0, 1, 2)))(
        zeros6, k, X, q, t, problem.obs_xy
    )
    # apply free masks: fixed params have zero Jacobian columns
    J_pose = J_pose * problem.pose_free[problem.obs_image_idx][:, None, :]
    J_intr = J_intr * problem.intr_free[problem.obs_camera_idx][:, None, :]
    J_pt = J_pt * problem.point_free[problem.obs_point_idx][:, None, None]
    return res, J_pose, J_intr, J_pt


def _seg_sum(vals, idx, num):
    return jax.ops.segment_sum(vals, idx, num_segments=num)


def _lm_core(problem: BundleProblem, loss_type: int, loss_scale, cg_iters: int,
             max_iterations: int, eta=None):
    """Returns (quat, trans, intr, points, initial_cost, final_cost, iters)."""
    if eta is None:
        # NOTE: must not be a jnp default argument — that would build a
        # device array at module import, initializing the XLA backend
        # before jax.distributed.initialize() can run (broke the
        # multi-process harness)
        eta = jnp.float32(0.1)
    I, C, P, M = (
        problem.num_images,
        problem.num_cameras,
        problem.num_points,
        problem.num_obs,
    )

    def total_cost(quat, trans, intr, points):
        q, t, k, X = _gather_obs_params(problem, quat, trans, intr, points)
        res = jax.vmap(
            lambda ki, Xi, qi, ti, xyi: _project(problem.model_id, ki, qi, ti, Xi) - xyi
        )(k, X, q, t, problem.obs_xy)
        sq = jnp.sum(res * res, axis=-1)
        return jnp.sum(_robust_cost(sq, loss_type, loss_scale) * problem.obs_mask)

    def lm_step(state):
        quat, trans, intr, points, lam, cost, it, done = state
        res, J_pose, J_intr, J_pt = _residuals_and_jacobians(
            problem, quat, trans, intr, points
        )
        sq = jnp.sum(res * res, axis=-1)
        w = _robust_weight(sq, loss_type, loss_scale) * problem.obs_mask
        sw = jnp.sqrt(w)[:, None]
        r = res * sw  # [M, 2]
        Jp = J_pose * sw[..., None]
        Jk = J_intr * sw[..., None]
        Jx = J_pt * sw[..., None]

        # point blocks V_p = sum J_x^T J_x (3x3) + damping
        V = _seg_sum(
            jnp.einsum("mri,mrj->mij", Jx, Jx), problem.obs_point_idx, P
        )
        V_diag = jnp.diagonal(V, axis1=-2, axis2=-1)
        damp = lam * jnp.maximum(V_diag, 1e-6)  # [P, 3]
        V_damped = V + jax.vmap(jnp.diag)(damp)
        V_inv = jnp.linalg.inv(
            V_damped + 1e-10 * jnp.eye(3, dtype=V.dtype)
        )

        # gradients
        g_pose = _seg_sum(
            jnp.einsum("mri,mr->mi", Jp, r), problem.obs_image_idx, I
        )  # [I, 6]
        g_intr = _seg_sum(
            jnp.einsum("mri,mr->mi", Jk, r), problem.obs_camera_idx, C
        )
        g_pt = _seg_sum(jnp.einsum("mri,mr->mi", Jx, r), problem.obs_point_idx, P)

        # reduced RHS: g_c - B C^-1 g_p
        z0 = jnp.einsum("pij,pj->pi", V_inv, g_pt)
        Jz0 = jnp.einsum("mri,mi->mr", Jx, z0[problem.obs_point_idx])
        rhs_pose = g_pose - _seg_sum(
            jnp.einsum("mri,mr->mi", Jp, Jz0), problem.obs_image_idx, I
        )
        rhs_intr = g_intr - _seg_sum(
            jnp.einsum("mri,mr->mi", Jk, Jz0), problem.obs_camera_idx, C
        )

        # camera-side damping diagonals
        U_diag_pose = _seg_sum(
            jnp.einsum("mri,mri->mi", Jp, Jp), problem.obs_image_idx, I
        )
        U_diag_intr = _seg_sum(
            jnp.einsum("mri,mri->mi", Jk, Jk), problem.obs_camera_idx, C
        )
        damp_pose = lam * jnp.maximum(U_diag_pose, 1e-6)
        damp_intr = lam * jnp.maximum(U_diag_intr, 1e-6)

        # SCHUR_JACOBI preconditioner: block-diag of S for poses
        W_obs = jnp.einsum("mri,mrj->mij", Jp, Jx)  # [M, 6, 3]
        WVW = jnp.einsum(
            "mij,mjk,mlk->mil", W_obs, V_inv[problem.obs_point_idx], W_obs
        )
        U_pose = _seg_sum(
            jnp.einsum("mri,mrj->mij", Jp, Jp), problem.obs_image_idx, I
        )
        S_diag = U_pose - _seg_sum(WVW, problem.obs_image_idx, I)
        S_diag = S_diag + jax.vmap(jnp.diag)(damp_pose + 1e-8)
        # guard non-invertible (unobserved/fixed images)
        P_inv = jnp.linalg.inv(S_diag + 1e-6 * jnp.eye(6, dtype=S_diag.dtype))

        def matvec(x_pose, x_intr):
            """S x = (A + damp) x - B C^-1 B^T x via residual-level products."""
            Jx_cam = jnp.einsum(
                "mri,mi->mr", Jp, x_pose[problem.obs_image_idx]
            ) + jnp.einsum("mri,mi->mr", Jk, x_intr[problem.obs_camera_idx])
            y_p = _seg_sum(
                jnp.einsum("mri,mr->mi", Jx, Jx_cam), problem.obs_point_idx, P
            )
            z_p = jnp.einsum("pij,pj->pi", V_inv, y_p)
            Jz = jnp.einsum("mri,mi->mr", Jx, z_p[problem.obs_point_idx])
            d = Jx_cam - Jz
            out_pose = _seg_sum(
                jnp.einsum("mri,mr->mi", Jp, d), problem.obs_image_idx, I
            ) + damp_pose * x_pose
            out_intr = _seg_sum(
                jnp.einsum("mri,mr->mi", Jk, d), problem.obs_camera_idx, C
            ) + damp_intr * x_intr
            return out_pose, out_intr

        def precond(r_pose, r_intr):
            p_pose = jnp.einsum("iab,ib->ia", P_inv, r_pose)
            denom = U_diag_intr + damp_intr
            p_intr = r_intr / jnp.where(denom < 1e-8, 1.0, denom)
            p_intr = p_intr * problem.intr_free
            return p_pose, p_intr

        # PCG on the reduced system
        def cg_body(carry, _):
            x_pose, x_intr, r_pose, r_intr, p_pose, p_intr, rz = carry
            Ap_pose, Ap_intr = matvec(p_pose, p_intr)
            pAp = jnp.sum(p_pose * Ap_pose) + jnp.sum(p_intr * Ap_intr)
            alpha = rz / jnp.where(jnp.abs(pAp) < 1e-20, 1e-20, pAp)
            x_pose = x_pose + alpha * p_pose
            x_intr = x_intr + alpha * p_intr
            r_pose = r_pose - alpha * Ap_pose
            r_intr = r_intr - alpha * Ap_intr
            z_pose, z_intr = precond(r_pose, r_intr)
            rz_new = jnp.sum(r_pose * z_pose) + jnp.sum(r_intr * z_intr)
            beta = rz_new / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
            p_pose = z_pose + beta * p_pose
            p_intr = z_intr + beta * p_intr
            return (x_pose, x_intr, r_pose, r_intr, p_pose, p_intr, rz_new), None

        x0_pose = jnp.zeros_like(rhs_pose)
        x0_intr = jnp.zeros_like(rhs_intr)
        z_pose, z_intr = precond(rhs_pose, rhs_intr)
        rz0 = jnp.sum(rhs_pose * z_pose) + jnp.sum(rhs_intr * z_intr)

        # forcing sequence (inexact Newton): stop when the preconditioned
        # residual norm-squared r.z falls below eta^2 x its initial value
        # (Ceres Solver::Options::eta semantics); cg_iters is the cap
        def cg_cond(carry):
            *_, rz, it = carry
            return jnp.logical_and(it < cg_iters, rz > eta * eta * rz0)

        def cg_step(carry):
            *state, it = carry
            new_state, _ = cg_body(tuple(state), None)
            return new_state + (it + 1,)

        (x_pose, x_intr, *_) = jax.lax.while_loop(
            cg_cond,
            cg_step,
            (x0_pose, x0_intr, rhs_pose, rhs_intr, z_pose, z_intr, rz0,
             jnp.int32(0)),
        )

        # back-substitute point updates: dp = C^-1 (g_p - B^T dc)
        Jdx = jnp.einsum(
            "mri,mi->mr", Jp, x_pose[problem.obs_image_idx]
        ) + jnp.einsum("mri,mi->mr", Jk, x_intr[problem.obs_camera_idx])
        bt_dc = _seg_sum(
            jnp.einsum("mri,mr->mi", Jx, Jdx), problem.obs_point_idx, P
        )
        x_pt = jnp.einsum("pij,pj->pi", V_inv, g_pt - bt_dc)

        # apply (descent direction: delta = -x)
        new_quat = jax.vmap(qops.quat_boxplus)(quat, -x_pose[:, :3])
        new_trans = trans - x_pose[:, 3:]
        new_intr = intr - x_intr
        new_points = points - x_pt * problem.point_free[:, None]

        new_cost = total_cost(new_quat, new_trans, new_intr, new_points)
        improved = new_cost < cost
        quat = jnp.where(improved, new_quat, quat)
        trans = jnp.where(improved, new_trans, trans)
        intr = jnp.where(improved, new_intr, intr)
        points = jnp.where(improved, new_points, points)
        cost_out = jnp.where(improved, new_cost, cost)
        lam = jnp.where(improved, jnp.maximum(lam * 1.0 / 3.0, 1e-10), lam * 4.0)
        rel_decrease = (cost - cost_out) / jnp.maximum(cost, 1e-20)
        done = jnp.logical_or(
            done, jnp.logical_and(improved, rel_decrease < 1e-7)
        )
        # rejected step with an attempted cost within 1e-7 relative of the
        # current cost: converged (matches ba_kernels._finish_step; avoids
        # walking lambda to 1e10 on re-solves of converged problems)
        att_rel = jnp.abs(new_cost - cost) / jnp.maximum(cost, 1e-20)
        done = jnp.logical_or(done, att_rel < 1e-7)
        done = jnp.logical_or(done, lam > 1e10)
        return quat, trans, intr, points, lam, cost_out, it + 1, done

    def cond(state):
        *_, it, done = state
        return jnp.logical_and(it < max_iterations, jnp.logical_not(done))

    cost0 = total_cost(
        problem.cam_quat, problem.cam_trans, problem.intrinsics, problem.points
    )
    init = (
        problem.cam_quat,
        problem.cam_trans,
        problem.intrinsics,
        problem.points,
        jnp.float32(1e-4),
        cost0,
        jnp.int32(0),
        jnp.array(False),
    )
    quat, trans, intr, points, lam, cost, it, done = jax.lax.while_loop(
        cond, lm_step, init
    )
    return quat, trans, intr, points, cost0, cost, it


@partial(jax.jit, static_argnames=("loss_type", "cg_iters", "max_iterations", "model_id"))
def _solve_jit(
    cam_quat, cam_trans, intrinsics, points,
    obs_image_idx, obs_camera_idx, obs_point_idx, obs_xy, obs_mask,
    pose_free, intr_free, point_free,
    model_id, loss_type, loss_scale, cg_iters, max_iterations,
    eta=None,
):
    problem = BundleProblem(
        cam_quat, cam_trans, intrinsics, points, model_id,
        obs_image_idx, obs_camera_idx, obs_point_idx, obs_xy, obs_mask,
        pose_free, intr_free, point_free,
    )
    return _lm_core(problem, loss_type, loss_scale, cg_iters, max_iterations,
                    eta=eta)


def solve_bundle(problem: BundleProblem, options: BundleAdjustmentOptions,
                 cg_iters: int = 30, mesh=None):
    """Run LM to convergence. Returns (new BundleProblem params, BASummary).

    Dispatches to the bucketed component-first kernels (sfm/ba_kernels.py),
    which are layout-optimized for TPU; :func:`solve_bundle_reference` keeps
    the straightforward flat-layout implementation for cross-checking.

    mesh: explicit jax.sharding.Mesh, or None to resolve one from
    ``options.devices`` ("auto" = all local devices on multi-chip hardware,
    see parallel/device_ctx.py) — this is how the public pipeline runs
    distributed without threading jax objects through every call.
    """
    from pycolmap_tpu.sfm.ba_kernels import solve_bundle_fast

    if mesh is None:
        from pycolmap_tpu.parallel.device_ctx import resolve_mesh

        mesh = resolve_mesh(getattr(options, "devices", "auto"))
    return solve_bundle_fast(problem, options, cg_iters=cg_iters, mesh=mesh)


def solve_bundle_reference(problem: BundleProblem, options: BundleAdjustmentOptions,
                           cg_iters: int = 30):
    """Flat-layout LM solver (reference implementation for the fast path)."""
    quat, trans, intr, points, cost0, cost, it = _solve_jit(
        problem.cam_quat, problem.cam_trans, problem.intrinsics, problem.points,
        problem.obs_image_idx, problem.obs_camera_idx, problem.obs_point_idx,
        problem.obs_xy, problem.obs_mask,
        problem.pose_free, problem.intr_free, problem.point_free,
        problem.model_id,
        int(options.loss_function_type),
        jnp.float32(options.loss_function_scale),
        cg_iters,
        int(options.max_num_iterations),
    )
    summary = BASummary(
        float(cost0), float(cost), int(it), int(2 * problem.num_obs)
    )
    new_problem = problem._replace(
        cam_quat=quat, cam_trans=trans, intrinsics=intr, points=points
    )
    return new_problem, summary
