"""Stage-level timing of the bucketed LM step at bench (C3) scale.

Mirrors ba_kernels._lm_solve_bucketed's phases as separately-jitted pieces:
  res+jac / V build / gradients+rhs / preconditioner build / one CG matvec /
  20-iter CG scan / back-substitution / total_cost, plus one full solver
  iteration for the end-to-end number. Run on TPU.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from pycolmap_tpu.ops import ba_math as bm
from pycolmap_tpu.ops.camera_models import MAX_PARAMS
from pycolmap_tpu.parallel.synthetic import make_synthetic_bundle
from pycolmap_tpu.sfm import ba_kernels as bk
from pycolmap_tpu.sfm.bundle_adjustment import BundleAdjustmentOptions


def timeit(fn, *args, n=5, warmup=2):
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
for b in buckets:
    print(f"  bucket T={b.mask.shape[0]:3d} P={b.mask.shape[1]:7d} "
          f"obs={int(np.asarray(b.mask).sum()):7d}")

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

make_oh = jax.jit(lambda: (
    [bk._make_onehot_t(b.img_idx, I) for b in buckets],
    [bk._make_onehot_t(b.cam_idx, C) for b in buckets],
))
t_oh = timeit(make_oh, n=3)
onehots_img, onehots_cam = jax.block_until_ready(make_oh())
print(f"one-hot build (both):       {t_oh*1e3:7.1f} ms")
intr_free_obs_l = jax.jit(lambda ocs: [
    tuple(bk._gather_mm(intr_free, oc, b.mask.shape))
    for b, oc in zip(buckets, ocs)
])(onehots_cam)

print(f"backend={jax.devices()[0]}  I={I} C={C}")


@jax.jit
def stage_resjac(quat, trans, intr, onehots_img, onehots_cam):
    res_l, J_l = [], []
    for b, oi, oc, ifo in zip(buckets, onehots_img, onehots_cam, intr_free_obs_l):
        q_obs, t_obs, k_obs = bk._gather_obs_params(b, quat, trans, intr, oi, oc)
        res, J = bk._bucket_res_and_jac(model_id, b, q_obs, t_obs, k_obs, ifo)
        res_l.append(res)
        J_l.append(J)
    return res_l, J_l


t = timeit(stage_resjac, quat, trans, intr, onehots_img, onehots_cam)
print(f"res+jac (all buckets):      {t*1e3:7.1f} ms")
res_l, J_l = jax.block_until_ready(stage_resjac(quat, trans, intr, onehots_img, onehots_cam))

lam = jnp.float32(1e-4)


@jax.jit
def stage_vinv(J_l):
    Vinv_l = []
    for J in J_l:
        Jp = J[:, 18:21]
        pairs = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
        V = jnp.stack(
            [jnp.sum(Jp[:, i] * Jp[:, j], axis=(0, 1)) for i, j in pairs]
        )
        damp = lam * jnp.maximum(jnp.stack([V[0], V[3], V[5]]), 1e-6)
        V = V.at[0].add(damp[0]).at[3].add(damp[1]).at[5].add(damp[2])
        Vinv_l.append(bk._inv3x3_planes(V))
    return Vinv_l


t = timeit(stage_vinv, J_l)
print(f"V build + 3x3 inverses:     {t*1e3:7.1f} ms")
Vinv_l = jax.block_until_ready(stage_vinv(J_l))


@jax.jit
def stage_grad_rhs(J_l, res_l, Vinv_l, onehots_img, onehots_cam):
    g_pose = jnp.zeros((I, 6))
    g_intr = jnp.zeros((C, MAX_PARAMS))
    g_pt_l = []
    for b, J, res, oi, oc in zip(buckets, J_l, res_l, onehots_img, onehots_cam):
        gp = jnp.einsum("rkts,rts->kts", J[:, :6], res)
        g_pose = g_pose + bk._scatter_cam(gp, oi, b.img_idx, I)
        gi = jnp.einsum("rkts,rts->kts", J[:, 6:18], res)
        g_intr = g_intr + bk._scatter_cam(gi, oc, b.cam_idx, C)
        g_pt_l.append(jnp.einsum("rkts,rts->ks", J[:, 18:21], res))
    rhs_pose = g_pose
    rhs_intr = g_intr
    for b, J, Vinv, g_pt, oi, oc in zip(
        buckets, J_l, Vinv_l, g_pt_l, onehots_img, onehots_cam
    ):
        z0 = jnp.stack(bk._sym3_apply(Vinv, (g_pt[0], g_pt[1], g_pt[2])))
        Jz = jnp.einsum("rkts,ks->rts", J[:, 18:21], z0)
        rp = jnp.einsum("rkts,rts->kts", J[:, :6], Jz)
        rhs_pose = rhs_pose - bk._scatter_cam(rp, oi, b.img_idx, I)
        ri = jnp.einsum("rkts,rts->kts", J[:, 6:18], Jz)
        rhs_intr = rhs_intr - bk._scatter_cam(ri, oc, b.cam_idx, C)
    return rhs_pose * pose_free, rhs_intr * intr_free, g_pt_l


t = timeit(stage_grad_rhs, J_l, res_l, Vinv_l, onehots_img, onehots_cam)
print(f"gradients + reduced rhs:    {t*1e3:7.1f} ms")
rhs_pose, rhs_intr, g_pt_l = jax.block_until_ready(
    stage_grad_rhs(J_l, res_l, Vinv_l, onehots_img, onehots_cam)
)


@jax.jit
def stage_precond_build(J_l, Vinv_l, onehots_img, onehots_cam):
    U_diag_pose = jnp.zeros((I, 6))
    U_diag_intr = jnp.zeros((C, MAX_PARAMS))
    S_blocks = jnp.zeros((I, 21))
    tri = [(i, j) for i in range(6) for j in range(i, 6)]
    for b, J, Vinv, oi, oc in zip(buckets, J_l, Vinv_l, onehots_img, onehots_cam):
        Jc = J[:, :6]
        Jp = J[:, 18:21]
        ud = jnp.einsum("rkts,rkts->kts", Jc, Jc)
        U_diag_pose = U_diag_pose + bk._scatter_cam(ud, oi, b.img_idx, I)
        ui = jnp.einsum("rkts,rkts->kts", J[:, 6:18], J[:, 6:18])
        U_diag_intr = U_diag_intr + bk._scatter_cam(ui, oc, b.cam_idx, C)
        W = jnp.einsum("rkts,rats->kats", Jc, Jp)
        a, bb, c, d, e, f = Vinv
        VW = jnp.stack(
            [
                a[None] * W[:, 0] + bb[None] * W[:, 1] + c[None] * W[:, 2],
                bb[None] * W[:, 0] + d[None] * W[:, 1] + e[None] * W[:, 2],
                c[None] * W[:, 0] + e[None] * W[:, 1] + f[None] * W[:, 2],
            ],
            axis=1,
        )
        blocks = jnp.stack(
            [
                jnp.einsum("rts,rts->ts", Jc[:, i], Jc[:, j])
                - jnp.einsum("bts,bts->ts", VW[i], W[j])
                for (i, j) in tri
            ]
        )
        S_blocks = S_blocks + bk._scatter_cam(blocks, oi, b.img_idx, I)
    return U_diag_pose, U_diag_intr, S_blocks


t = timeit(stage_precond_build, J_l, Vinv_l, onehots_img, onehots_cam)
print(f"U diag + S diag (precond):  {t*1e3:7.1f} ms")
U_diag_pose, U_diag_intr, S_blocks = jax.block_until_ready(
    stage_precond_build(J_l, Vinv_l, onehots_img, onehots_cam)
)

damp_pose = lam * jnp.maximum(U_diag_pose, 1e-6)
damp_intr = lam * jnp.maximum(U_diag_intr, 1e-6)


def matvec(x_pose, x_intr, J_l, Vinv_l, onehots_img, onehots_cam):
    out_pose = damp_pose * x_pose
    out_intr = damp_intr * x_intr
    for b, J, Vinv, oi, oc in zip(buckets, J_l, Vinv_l, onehots_img, onehots_cam):
        xp = bk._gather_mm(x_pose, oi, b.mask.shape)
        xi = bk._gather_mm(x_intr, oc, b.mask.shape)
        xc = jnp.concatenate([xp, xi])
        a_obs = jnp.einsum("rkts,kts->rts", J[:, :18], xc,
                           preferred_element_type=jnp.float32)
        y_p = jnp.einsum("rkts,rts->ks", J[:, 18:21], a_obs,
                         preferred_element_type=jnp.float32)
        z_p = jnp.stack(bk._sym3_apply(Vinv, (y_p[0], y_p[1], y_p[2])))
        d = a_obs - jnp.einsum("rkts,ks->rts", J[:, 18:21], z_p,
                               preferred_element_type=jnp.float32)
        op = jnp.einsum("rkts,rts->kts", J[:, :6], d,
                        preferred_element_type=jnp.float32)
        out_pose = out_pose + bk._scatter_cam(op, oi, b.img_idx, I)
        oi_v = jnp.einsum("rkts,rts->kts", J[:, 6:18], d,
                          preferred_element_type=jnp.float32)
        out_intr = out_intr + bk._scatter_cam(oi_v, oc, b.cam_idx, C)
    return out_pose * pose_free, out_intr * intr_free


matvec_jit = jax.jit(matvec)
t = timeit(matvec_jit, rhs_pose, rhs_intr, J_l, Vinv_l, onehots_img, onehots_cam)
print(f"single CG matvec:           {t*1e3:7.1f} ms")


@jax.jit
def stage_cg(rhs_pose, rhs_intr, J_l, Vinv_l, onehots_img, onehots_cam):
    S_full = jnp.zeros((I, 6, 6))
    tri = [(i, j) for i in range(6) for j in range(i, 6)]
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

    def cg_body(carry, _):
        x_pose, x_intr, r_pose, r_intr, p_pose, p_intr, rz = carry
        Ap_pose, Ap_intr = matvec(p_pose, p_intr, J_l, Vinv_l, onehots_img, onehots_cam)
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
        cg_body,
        (jnp.zeros_like(rhs_pose), jnp.zeros_like(rhs_intr),
         rhs_pose, rhs_intr, z_pose, z_intr, rz0),
        None,
        length=CG_ITERS,
    )
    return x_pose, x_intr


t = timeit(stage_cg, rhs_pose, rhs_intr, J_l, Vinv_l, onehots_img, onehots_cam)
print(f"CG x{CG_ITERS} (incl precond):    {t*1e3:7.1f} ms")
x_pose, x_intr = jax.block_until_ready(stage_cg(rhs_pose, rhs_intr, J_l, Vinv_l, onehots_img, onehots_cam))


@jax.jit
def stage_backsub(x_pose, x_intr, J_l, Vinv_l, g_pt_l, onehots_img, onehots_cam):
    new_pts = []
    for b, J, Vinv, g_pt, oi, oc in zip(
        buckets, J_l, Vinv_l, g_pt_l, onehots_img, onehots_cam
    ):
        xp = bk._gather_mm(x_pose, oi, b.mask.shape)
        xi = bk._gather_mm(x_intr, oc, b.mask.shape)
        a_obs = sum(J[:, k] * xp[k][None] for k in range(6)) + sum(
            J[:, 6 + k] * xi[k][None] for k in range(MAX_PARAMS)
        )
        bt = jnp.einsum("rkts,rts->ks", J[:, 18:21], a_obs)
        dp = jnp.stack(
            bk._sym3_apply(Vinv, (g_pt[0] - bt[0], g_pt[1] - bt[1], g_pt[2] - bt[2]))
        )
        new_pts.append(b.points - dp * b.point_free[None])
    return new_pts


t = timeit(stage_backsub, x_pose, x_intr, J_l, Vinv_l, g_pt_l, onehots_img, onehots_cam)
print(f"point back-substitution:    {t*1e3:7.1f} ms")


@jax.jit
def stage_cost(quat, trans, intr, onehots_img, onehots_cam):
    cost = jnp.float32(0.0)
    for b, oi, oc in zip(buckets, onehots_img, onehots_cam):
        T, P = b.mask.shape
        q_obs, t_obs, k_obs = bk._gather_obs_params(b, quat, trans, intr, oi, oc)
        rx, ry = bk._bucket_residual(
            model_id, b, q_obs, t_obs, k_obs,
            jnp.zeros((6, T, P)), jnp.zeros((MAX_PARAMS, T, P)),
            jnp.zeros((3, T, P)),
        )
        from pycolmap_tpu.sfm.bundle_adjustment import _robust_cost
        sq = rx * rx + ry * ry
        cost = cost + jnp.sum(_robust_cost(sq, loss_type, loss_scale) * b.mask)
    return cost


t = timeit(stage_cost, quat, trans, intr, onehots_img, onehots_cam)
print(f"total_cost:                 {t*1e3:7.1f} ms")

# end-to-end single LM iteration through the real solver
options = BundleAdjustmentOptions()
options.max_num_iterations = 8
options.function_tolerance = 0.0
from pycolmap_tpu.sfm.bundle_adjustment import solve_bundle

t0 = time.perf_counter()
_, summary = solve_bundle(problem, options, cg_iters=CG_ITERS)
dt = time.perf_counter() - t0
print(f"full solve ({summary.num_iterations} LM iters, warm): "
      f"{dt*1e3:7.1f} ms -> {summary.num_iterations/dt:5.1f} iters/s")
