"""Fused Pallas res+jac / cost / backsub+cost kernels vs the XLA bucket path
(interpret mode). The XLA reference functions (ba_kernels._bucket_res_and_jac
etc.) are themselves cross-checked against jvp/flat references elsewhere."""

import numpy as np
import jax.numpy as jnp

from pycolmap_tpu.ops.camera_models import MAX_PARAMS
from pycolmap_tpu.sfm import ba_kernels as bk
from pycolmap_tpu.sfm import cg_kernel as ck
from pycolmap_tpu.sfm.bundle_adjustment import _robust_cost

MODEL_ID = 2  # SIMPLE_RADIAL
NP = 4  # its parameter count; J is NP-narrow: [2, 9+NP, T, P]
NK = 6 + NP
LOSS_TYPE = 1  # SOFT_L1
LOSS_SCALE = 1.5


def _make_case(seed=0, T=4, P=128, I=6, C=2):
    rng = np.random.default_rng(seed)
    img_idx = rng.integers(0, I, (T, P)).astype(np.int32)
    cam_idx = rng.integers(0, C, (T, P)).astype(np.int32)
    xy = rng.normal(scale=200.0, size=(2, T, P)).astype(np.float32)
    mask = (rng.uniform(size=(T, P)) > 0.3).astype(np.float32)
    # points in front of a ring of cameras looking at origin
    pts = rng.normal(scale=1.0, size=(3, P)).astype(np.float32)
    pfree = (rng.uniform(size=P) > 0.2).astype(np.float32)
    bucket = bk.Bucket(
        img_idx=jnp.asarray(img_idx), cam_idx=jnp.asarray(cam_idx),
        xy=jnp.asarray(xy), mask=jnp.asarray(mask), points=jnp.asarray(pts),
        point_free=jnp.asarray(pfree),
        point_rows=jnp.arange(P, dtype=jnp.int32),
    )
    quat = rng.normal(size=(I, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    trans = rng.normal(size=(I, 3)).astype(np.float32)
    trans[:, 2] += 8.0  # points mostly in front
    intr = np.zeros((C, MAX_PARAMS), np.float32)
    intr[:, 0] = 900.0 + 50 * rng.normal(size=C)
    intr[:, 1] = 320.0
    intr[:, 2] = 240.0
    intr[:, 3] = 0.05 * rng.normal(size=C)
    intr_free = (rng.uniform(size=(C, MAX_PARAMS)) > 0.5).astype(np.float32)
    return bucket, jnp.asarray(quat), jnp.asarray(trans), jnp.asarray(intr), \
        jnp.asarray(intr_free)


def _ref_res_jac(bucket, quat, trans, intr, intr_free):
    """XLA path: numpy gathers + analytic chain + robust weighting."""
    from pycolmap_tpu.sfm.bundle_adjustment import _robust_weight

    ii = np.asarray(bucket.img_idx)
    ci = np.asarray(bucket.cam_idx)
    q = np.asarray(quat)
    t = np.asarray(trans)
    k = np.asarray(intr)
    ifm = np.asarray(intr_free)
    q_obs = tuple(jnp.asarray(q[:, c][ii]) for c in range(4))
    t_obs = tuple(jnp.asarray(t[:, c][ii]) for c in range(3))
    k_obs = tuple(jnp.asarray(k[:, c][ci]) for c in range(MAX_PARAMS))
    ifo = tuple(jnp.asarray(ifm[:, c][ci]) for c in range(MAX_PARAMS))
    res, J = bk._bucket_res_and_jac(MODEL_ID, bucket, q_obs, t_obs, k_obs, ifo)
    sq = res[0] ** 2 + res[1] ** 2
    w = _robust_weight(sq, LOSS_TYPE, LOSS_SCALE) * bucket.mask
    sw = jnp.sqrt(w)
    return np.asarray(res * sw[None]), np.asarray(J * sw[None, None])


def test_resjac_matches_xla():
    bucket, quat, trans, intr, intr_free = _make_case()
    ref_res, ref_J = _ref_res_jac(bucket, quat, trans, intr, intr_free)
    res_l, J_l = ck.res_and_jac(
        [bucket], [bucket.points], quat, trans, intr, intr_free,
        MODEL_ID, LOSS_TYPE, jnp.float32(LOSS_SCALE), interpret=True,
    )
    scale = max(np.abs(ref_J).max(), 1.0)
    np.testing.assert_allclose(
        np.asarray(res_l[0]) / scale, ref_res / scale, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(J_l[0]) / scale, ref_J / scale, atol=1e-5
    )


def test_total_cost_matches_xla():
    bucket, quat, trans, intr, _ = _make_case(seed=1)
    ii = np.asarray(bucket.img_idx)
    ci = np.asarray(bucket.cam_idx)
    q_obs = tuple(jnp.asarray(np.asarray(quat)[:, c][ii]) for c in range(4))
    t_obs = tuple(jnp.asarray(np.asarray(trans)[:, c][ii]) for c in range(3))
    k_obs = tuple(
        jnp.asarray(np.asarray(intr)[:, c][ci]) for c in range(MAX_PARAMS)
    )
    T, P = bucket.mask.shape
    rx, ry = bk._bucket_residual(
        MODEL_ID, bucket, q_obs, t_obs, k_obs,
        jnp.zeros((6, T, P)), jnp.zeros((MAX_PARAMS, T, P)),
        jnp.zeros((3, T, P)),
    )
    sq = rx * rx + ry * ry
    ref = float(jnp.sum(_robust_cost(sq, LOSS_TYPE, LOSS_SCALE) * bucket.mask))
    got = float(ck.total_cost(
        [bucket], [bucket.points], quat, trans, intr,
        MODEL_ID, LOSS_TYPE, jnp.float32(LOSS_SCALE), interpret=True,
    ))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_backsub_and_cost_matches_xla():
    rng = np.random.default_rng(5)
    bucket, quat, trans, intr, intr_free = _make_case(seed=2)
    T, P = bucket.mask.shape
    I, C = quat.shape[0], intr.shape[0]
    _, J = _ref_res_jac(bucket, quat, trans, intr, intr_free)
    J = jnp.asarray(J)
    Vinv = jnp.asarray(rng.normal(size=(6, P)).astype(np.float32))
    g_pt = jnp.asarray(rng.normal(size=(3, P)).astype(np.float32))
    x_pose = jnp.asarray(rng.normal(scale=1e-3, size=(I, 6)).astype(np.float32))
    x_intr = jnp.asarray(rng.normal(scale=1e-3, size=(C, MAX_PARAMS)).astype(np.float32))

    # XLA reference: backsub (finish-step inner loop) + cost at new params
    ii = np.asarray(bucket.img_idx)
    ci = np.asarray(bucket.cam_idx)
    xp = tuple(jnp.asarray(np.asarray(x_pose)[:, c][ii]) for c in range(6))
    xi = tuple(
        jnp.asarray(np.asarray(x_intr)[:, c][ci]) for c in range(NP)
    )
    a_obs = sum(J[:, k] * xp[k][None] for k in range(6)) + sum(
        J[:, 6 + k] * xi[k][None] for k in range(NP)
    )
    bt = bk._jt_apply_sum_t(J[:, NK:NK + 3], a_obs)
    dp = jnp.stack(bk._sym3_apply(
        Vinv, (g_pt[0] - bt[0], g_pt[1] - bt[1], g_pt[2] - bt[2])))
    ref_pts = np.asarray(bucket.points - dp * bucket.point_free[None])

    import pycolmap_tpu.ops.ba_math as bm
    nq = bm.quat_boxplus_cf(
        (quat[:, 0], quat[:, 1], quat[:, 2], quat[:, 3]),
        (-x_pose[:, 0], -x_pose[:, 1], -x_pose[:, 2]),
    )
    new_quat = jnp.stack(nq, axis=1)
    new_trans = trans - x_pose[:, 3:6]
    new_intr = intr - x_intr
    nii = np.asarray(new_quat)
    q_obs = tuple(jnp.asarray(nii[:, c][ii]) for c in range(4))
    t_obs = tuple(
        jnp.asarray(np.asarray(new_trans)[:, c][ii]) for c in range(3)
    )
    k_obs = tuple(
        jnp.asarray(np.asarray(new_intr)[:, c][ci]) for c in range(MAX_PARAMS)
    )
    b2 = bucket._replace(points=jnp.asarray(ref_pts))
    rx, ry = bk._bucket_residual(
        MODEL_ID, b2, q_obs, t_obs, k_obs,
        jnp.zeros((6, T, P)), jnp.zeros((MAX_PARAMS, T, P)),
        jnp.zeros((3, T, P)),
    )
    sq = rx * rx + ry * ry
    ref_cost = float(
        jnp.sum(_robust_cost(sq, LOSS_TYPE, LOSS_SCALE) * bucket.mask)
    )

    new_pts_l, cost = ck.backsub_and_cost(
        [bucket], [bucket.points], [J], [Vinv], [g_pt], x_pose, x_intr,
        new_quat, new_trans, new_intr, MODEL_ID, LOSS_TYPE,
        jnp.float32(LOSS_SCALE), interpret=True,
    )
    scale = max(np.abs(ref_pts).max(), 1.0)
    np.testing.assert_allclose(
        np.asarray(new_pts_l[0]) / scale, ref_pts / scale, atol=1e-5
    )
    np.testing.assert_allclose(float(cost), ref_cost, rtol=1e-4)
