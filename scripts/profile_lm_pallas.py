"""Stage-level timing of the PALLAS-path bucketed LM step at bench (C3) scale.

Counterpart of profile_lm_stages.py for the fused-kernel path
(sfm/cg_kernel.py): res+jac with in-kernel lane gathers / schur_prepare /
single matvec / CG x20 / back-substitution / total_cost. Run on TPU.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from pycolmap_tpu.ops.camera_models import MAX_PARAMS
from pycolmap_tpu.parallel.synthetic import make_synthetic_bundle
from pycolmap_tpu.sfm import ba_kernels as bk
from pycolmap_tpu.sfm import cg_kernel as ck
from pycolmap_tpu.sfm.bundle_adjustment import _robust_cost, _robust_weight


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


problem = make_synthetic_bundle(
    num_images=128, num_points=100_000, obs_per_point=6,
    pose_noise=0.05, point_noise=0.10, refine_intrinsics=True, seed=0,
)
buckets = bk.bucketize(problem)
buckets = jax.device_put(buckets)
tot_pad = 0
for b in buckets:
    T, P = b.mask.shape
    tot_pad += T * P
    print(f"  bucket T={T:3d} P={P:7d} obs={int(np.asarray(b.mask).sum()):7d}")
print(f"  total padded obs slots: {tot_pad}  J bytes: "
      f"{tot_pad * 2 * 21 * 4 / 1e6:.0f} MB")

I = bk._pad_4x(problem.num_images, 8)
C = bk._pad_4x(problem.num_cameras, 1)
model_id = problem.model_id
loss_type, loss_scale = 0, jnp.float32(1.0)
CG_ITERS = 20

quat = jnp.asarray(np.pad(np.asarray(problem.cam_quat, np.float32),
                          ((0, I - problem.num_images), (0, 0))))
quat = quat.at[problem.num_images:, 0].set(1.0)
trans = jnp.asarray(np.pad(np.asarray(problem.cam_trans, np.float32),
                           ((0, I - problem.num_images), (0, 0))))
pose_free = jnp.asarray(np.pad(np.asarray(problem.pose_free, np.float32),
                               ((0, I - problem.num_images), (0, 0))))
intr = jnp.asarray(np.asarray(problem.intrinsics, np.float32))
intr_free = jnp.asarray(np.asarray(problem.intr_free, np.float32))
print(f"backend={jax.devices()[0]}  I={I} C={C}")

@jax.jit
def stage_resjac(quat, trans, intr):
    return ck.res_and_jac(
        buckets, [b.points for b in buckets], quat, trans, intr, intr_free,
        model_id, loss_type, loss_scale, interpret=False)


t = timeit(stage_resjac, quat, trans, intr)
print(f"res+jac (fused kernel):     {t*1e3:7.1f} ms")
res_l, J_l = jax.block_until_ready(stage_resjac(quat, trans, intr))

lam = jnp.float32(1e-4)


@jax.jit
def stage_prepare(J_l, res_l, lam):
    return ck.schur_prepare(buckets, J_l, res_l, lam, I, C, interpret=False)


t = timeit(stage_prepare, J_l, res_l, lam)
print(f"schur_prepare (fused):      {t*1e3:7.1f} ms")
(Vinv_l, g_pt_l, rhs_pose, rhs_intr, U_diag_pose, U_diag_intr,
 S_blocks) = jax.block_until_ready(stage_prepare(J_l, res_l, lam))
rhs_pose = rhs_pose * pose_free
rhs_intr = rhs_intr * intr_free

damp_pose = lam * jnp.maximum(U_diag_pose, 1e-6)
damp_intr = lam * jnp.maximum(U_diag_intr, 1e-6)


@jax.jit
def matvec_once(x_pose, x_intr, J_l, Vinv_l):
    mp, mi = ck.schur_matvec(buckets, J_l, Vinv_l, x_pose, x_intr, I, C,
                             interpret=False)
    return ((damp_pose * x_pose + mp) * pose_free,
            (damp_intr * x_intr + mi) * intr_free)


t = timeit(matvec_once, rhs_pose, rhs_intr, J_l, Vinv_l)
print(f"single CG matvec (pallas):  {t*1e3:7.2f} ms")


@jax.jit
def stage_cg(rhs_pose, rhs_intr, J_l, Vinv_l):
    tri = [(i, j) for i in range(6) for j in range(i, 6)]
    S_full = jnp.zeros((I, 6, 6))
    for k, (i, j) in enumerate(tri):
        S_full = S_full.at[:, i, j].set(S_blocks[:, k])
        if i != j:
            S_full = S_full.at[:, j, i].set(S_blocks[:, k])
    S_full = S_full + jax.vmap(jnp.diag)(damp_pose + 1e-8)
    P_inv = jnp.linalg.inv(S_full + 1e-6 * jnp.eye(6))

    def precond(r_pose, r_intr):
        p_pose = jnp.einsum("iab,ib->ia", P_inv, r_pose) * pose_free
        denom = U_diag_intr + damp_intr
        p_intr = r_intr / jnp.where(denom < 1e-8, 1.0, denom)
        return p_pose, p_intr * intr_free

    def mv(x_pose, x_intr):
        mp, mi = ck.schur_matvec(buckets, J_l, Vinv_l, x_pose, x_intr, I, C,
                                 interpret=False)
        return ((damp_pose * x_pose + mp) * pose_free,
                (damp_intr * x_intr + mi) * intr_free)

    def body(carry, _):
        x_pose, x_intr, r_pose, r_intr, p_pose, p_intr, rz = carry
        Ap_pose, Ap_intr = mv(p_pose, p_intr)
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

    z_pose, z_intr = precond(rhs_pose, rhs_intr)
    rz0 = jnp.sum(rhs_pose * z_pose) + jnp.sum(rhs_intr * z_intr)
    (x_pose, x_intr, *_), _ = jax.lax.scan(
        body,
        (jnp.zeros_like(rhs_pose), jnp.zeros_like(rhs_intr),
         rhs_pose, rhs_intr, z_pose, z_intr, rz0),
        None, length=CG_ITERS,
    )
    return x_pose, x_intr


t = timeit(stage_cg, rhs_pose, rhs_intr, J_l, Vinv_l)
print(f"CG x{CG_ITERS} (incl precond):    {t*1e3:7.1f} ms")
x_pose, x_intr = jax.block_until_ready(
    stage_cg(rhs_pose, rhs_intr, J_l, Vinv_l))


import pycolmap_tpu.ops.ba_math as bm


@jax.jit
def stage_finish(x_pose, x_intr, J_l, Vinv_l, g_pt_l, quat, trans, intr):
    nq = bm.quat_boxplus_cf(
        (quat[:, 0], quat[:, 1], quat[:, 2], quat[:, 3]),
        (-x_pose[:, 0], -x_pose[:, 1], -x_pose[:, 2]))
    new_quat = jnp.stack(nq, axis=1)
    return ck.backsub_and_cost(
        buckets, [b.points for b in buckets], J_l, Vinv_l, g_pt_l,
        x_pose, x_intr, new_quat, trans - x_pose[:, 3:6], intr - x_intr,
        model_id, loss_type, loss_scale, interpret=False)


t = timeit(stage_finish, x_pose, x_intr, J_l, Vinv_l, g_pt_l, quat, trans, intr)
print(f"backsub+cost (fused):       {t*1e3:7.1f} ms")


@jax.jit
def stage_cost(quat, trans, intr):
    return ck.total_cost(
        buckets, [b.points for b in buckets], quat, trans, intr,
        model_id, loss_type, loss_scale, interpret=False)


t = timeit(stage_cost, quat, trans, intr)
print(f"total_cost (fused):         {t*1e3:7.1f} ms")

# end-to-end through the real fast solver
from pycolmap_tpu.sfm.bundle_adjustment import BundleAdjustmentOptions
options = BundleAdjustmentOptions()
options.max_num_iterations = 8
options.function_tolerance = 0.0

t0 = time.perf_counter()
_, summary = bk.solve_bundle_fast(problem, options, cg_iters=CG_ITERS)
dt = time.perf_counter() - t0
print(f"full solve ({summary.num_iterations} LM iters, cold+warm): "
      f"{dt*1e3:7.1f} ms -> {summary.num_iterations/dt:5.1f} iters/s")
t0 = time.perf_counter()
_, summary = bk.solve_bundle_fast(problem, options, cg_iters=CG_ITERS)
dt = time.perf_counter() - t0
print(f"full solve ({summary.num_iterations} LM iters, warm): "
      f"{dt*1e3:7.1f} ms -> {summary.num_iterations/dt:5.1f} iters/s")
