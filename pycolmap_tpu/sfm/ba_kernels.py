"""Bucketed, component-first bundle-adjustment kernels (the fast path).

Layout design (measured on TPU v5e, see scripts/profile_primitives.py): the
flat ``[num_obs, small]`` arrays of the naive solver run at ~1-5% of HBM
bandwidth because their minor dims (2..12) waste (8,128) tiles, and
segment-sum scatters are serial. This module re-lays the problem out as:

- observations bucketed BY POINT into dense ``[T, P_b]`` grids (T = padded
  track length, P_b = points in the bucket, MINOR axis → full tiles);
- all per-observation values component-first: ``[comp, T, P_b]``;
- point-block reductions = dense sums over T (no scatter at all — each
  point's observations share a column);
- camera-block gathers = per-component 1-D table lookups;
- camera-block reductions = one-hot bf16 matmuls on the MXU (images/cameras
  are few; a [T*P, I] one-hot contraction is ~1 GFLOP of systolic work
  instead of a serial scatter);
- 3x3 point-block inverses in closed form on ``[9, P]`` planes.

The LM loop (IRLS robust weights, Schur-eliminated PCG with SCHUR_JACOBI
preconditioner, point back-substitution) matches sfm/bundle_adjustment.py
semantically; that module remains the reference implementation and the two
are cross-checked in tests.

Jacobians are built from 21 jvp passes of the component-first forward model
(pose 6 + intrinsics 12 + point 3), each a fused elementwise sweep.

Distribution: bucket arrays shard cleanly along P_b (a point and all its
observations live in one column), so pjit sharding of the minor axis gives
per-shard Schur elimination with psum-assembled camera systems (SURVEY §2c P4).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pycolmap_tpu.ops import ba_math as bm
from pycolmap_tpu.ops.camera_models import MAX_PARAMS
from pycolmap_tpu.sfm.bundle_adjustment import (
    BundleProblem,
    BASummary,
    LossFunctionType,
    _robust_cost,
    _robust_weight,
)

_BUCKET_TS = (4, 8, 16, 32, 64)
MAX_TRACK = _BUCKET_TS[-1]
_ONEHOT_MAX_SEGMENTS = 1024  # above this, fall back to segment_sum scatters


class Bucket(NamedTuple):
    img_idx: jnp.ndarray  # [T, P] int32
    cam_idx: jnp.ndarray  # [T, P] int32
    xy: jnp.ndarray  # [2, T, P] f32
    mask: jnp.ndarray  # [T, P] f32 (0 = padding)
    points: jnp.ndarray  # [3, P] f32 (bucket-local point positions)
    point_free: jnp.ndarray  # [P] f32
    point_rows: jnp.ndarray  # [P] int32 original row in BundleProblem.points


def _pad_to(n, m):
    return ((n + m - 1) // m) * m


def _pad_pow2(n, lo):
    """Next power of two >= max(n, lo) — bounds the set of compiled shapes
    when problem sizes vary call-to-call (local BA windows)."""
    n = max(n, lo)
    return 1 << (n - 1).bit_length()


def _pad_4x(n, lo):
    """Next 4x step (lo, 4lo, 16lo, ...) >= n. Coarser than pow2: each fresh
    XLA compile through the remote tunnel costs seconds, and the bucketed
    solver's signature is the tuple of ALL padded sizes — 4x steps halve the
    variant count for ~2x worst-case padding compute (cheap: padded columns
    are fully masked)."""
    n = max(n, lo)
    b = lo
    while b < n:
        b *= 4
    return b


def bucketize(problem: BundleProblem):
    """Host-side: flat obs -> per-track-length buckets (numpy)."""
    obs_pt = np.asarray(problem.obs_point_idx)
    obs_img = np.asarray(problem.obs_image_idx)
    obs_cam = np.asarray(problem.obs_camera_idx)
    obs_xy = np.asarray(problem.obs_xy)
    obs_mask = np.asarray(problem.obs_mask)
    points = np.asarray(problem.points)
    point_free = np.asarray(problem.point_free)
    P = points.shape[0]

    valid = obs_mask > 0
    order = np.argsort(obs_pt[valid], kind="stable")
    v_pt = obs_pt[valid][order]
    v_img = obs_img[valid][order]
    v_cam = obs_cam[valid][order]
    v_xy = obs_xy[valid][order]

    starts = np.searchsorted(v_pt, np.arange(P))
    ends = np.searchsorted(v_pt, np.arange(P) + 1)
    lens = ends - starts

    buckets = []
    for T in _BUCKET_TS:
        lo = 0 if T == _BUCKET_TS[0] else _BUCKET_TS[_BUCKET_TS.index(T) - 1]
        if T == _BUCKET_TS[-1]:
            sel = np.nonzero(lens > lo)[0]  # includes over-long tracks
        else:
            sel = np.nonzero((lens > lo) & (lens <= T))[0]
        # empty buckets still emitted at minimal size: a CONSTANT bucket
        # structure keeps the jitted solver's shape signature to
        # (padded sizes only), not 2^5 presence combinations
        Pb = _pad_4x(len(sel), 128)
        n_sel = len(sel)
        # vectorized fill: flat source index per (t, k) grid slot
        flat_pos = starts[sel][None, :] + np.arange(T)[:, None]  # [T, n_sel]
        in_track = flat_pos < ends[sel][None, :]  # over-long tracks truncate
        flat_safe = np.where(in_track, flat_pos, 0)
        img_idx = np.zeros((T, Pb), dtype=np.int32)
        cam_idx = np.zeros((T, Pb), dtype=np.int32)
        xy = np.zeros((2, T, Pb), dtype=np.float32)
        mask = np.zeros((T, Pb), dtype=np.float32)
        pts = np.zeros((3, Pb), dtype=np.float32)
        pfree = np.zeros(Pb, dtype=np.float32)
        rows = np.zeros(Pb, dtype=np.int32)
        img_idx[:, :n_sel] = np.where(in_track, v_img[flat_safe], 0)
        cam_idx[:, :n_sel] = np.where(in_track, v_cam[flat_safe], 0)
        xy[0, :, :n_sel] = np.where(in_track, v_xy[flat_safe, 0], 0.0)
        xy[1, :, :n_sel] = np.where(in_track, v_xy[flat_safe, 1], 0.0)
        mask[:, :n_sel] = in_track.astype(np.float32)
        pts[:, :n_sel] = points[sel].T
        pfree[:n_sel] = point_free[sel]
        rows[:n_sel] = sel
        # numpy (host) arrays: the jitted solver call transfers them in one
        # batch; eager per-array jnp.asarray costs a dispatch each
        buckets.append(
            Bucket(img_idx, cam_idx, xy, mask, pts, pfree, rows)
        )
    return tuple(buckets)


# ---------------------------------------------------------------------------
# per-bucket computations (all shapes static under jit)
# ---------------------------------------------------------------------------


def _gather_table(table, idx):
    """table [N, k] -> tuple of k arrays gathered with idx [...].

    Plain XLA gather — only used on paths where no one-hot is available.
    (Measured ~7 ms per component at M=800k on v5e; the hot paths use
    :func:`_gather_mm` instead.)"""
    return tuple(table[:, c][idx] for c in range(table.shape[1]))


def _make_onehot_t(idx, num_segments, dtype=jnp.float32):
    """Transposed one-hot [num_segments, M] built by iota-compare (no
    transpose of a [M, N] array). f32 so gathers keep full value precision."""
    flat = idx.reshape(-1)
    return (
        jax.lax.broadcasted_iota(jnp.int32, (num_segments, flat.shape[0]), 0)
        == flat[None, :]
    ).astype(dtype)


def _gather_mm(table, onehot_t, shape):
    """table [N, k]; onehot_t [N, M] -> [k, *shape] via MXU contraction.

    TPU rationale: XLA's 1-D gather with ~1M indices runs at <1 GB/s; the
    same selection as a [k, N] x [N, M] matmul is ~1 GFLOP of systolic work
    and streams at full HBM bandwidth."""
    out = jax.lax.dot_general(
        table.T, onehot_t, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [k, M]
    return out.reshape((table.shape[1],) + shape)


def _gather_obs_params(bucket, quat, trans, intr, onehot_i, onehot_c):
    """Gather pose/intrinsics per observation, preferring MXU one-hot matmuls."""
    shape = bucket.mask.shape
    if onehot_i is not None:
        q_obs = tuple(_gather_mm(quat, onehot_i, shape))
        t_obs = tuple(_gather_mm(trans, onehot_i, shape))
    else:
        q_obs = _gather_table(quat, bucket.img_idx)
        t_obs = _gather_table(trans, bucket.img_idx)
    if onehot_c is not None:
        k_obs = tuple(_gather_mm(intr, onehot_c, shape))
    else:
        k_obs = _gather_table(intr, bucket.cam_idx)
    return q_obs, t_obs, k_obs


def _bucket_residual(model_id, bucket, q_obs, t_obs, k_obs, d_pose, d_intr, d_pt):
    """Residual at tangent deltas given pre-gathered per-obs parameters."""
    q = bm.quat_boxplus_cf(q_obs, (d_pose[0], d_pose[1], d_pose[2]))
    t = (t_obs[0] + d_pose[3], t_obs[1] + d_pose[4], t_obs[2] + d_pose[5])
    k = tuple(k_obs[i] + d_intr[i] for i in range(MAX_PARAMS))
    X = (
        bucket.points[0][None, :] + d_pt[0],
        bucket.points[1][None, :] + d_pt[1],
        bucket.points[2][None, :] + d_pt[2],
    )
    px, py, z = bm.project_cf(model_id, k, q, t, X)
    rx = (px - bucket.xy[0]) * bucket.mask
    ry = (py - bucket.xy[1]) * bucket.mask
    behind = (z <= 1e-8) & (bucket.mask > 0)
    rx = jnp.where(behind, 1e3, rx)
    ry = jnp.where(behind, 1e3, ry)
    return rx, ry


def _bucket_res_and_jac(model_id, bucket, q_obs, t_obs, k_obs, intr_free_obs):
    """Residual [2, T, P] + analytic Jacobian [2, 21, T, P].

    Column order matches the tangent layout of :func:`_bucket_residual`:
    [rot(3), trans(3), intrinsics(MAX_PARAMS), point(3)]. The chain rule is
    assembled in closed form — rotation columns via -[RX]x, point columns
    via B R, projection via the 2x3 perspective Jacobian — with only the
    2-D distortion linearized by jvp (2 passes for d(dist)/d(u,v) plus one
    per ACTUAL extra parameter of the model). Replaces 21 full-chain jvps;
    cross-checked against :func:`_bucket_res_and_jac_jvp` in tests.
    """
    from pycolmap_tpu.ops.camera_models import CAMERA_MODEL_BY_ID

    info = CAMERA_MODEL_BY_ID[model_id]
    X = (
        bucket.points[0][None],
        bucket.points[1][None],
        bucket.points[2][None],
    )
    vx, vy, vz = bm.quat_rotate_cf(q_obs, X)
    cx = vx + t_obs[0]
    cy = vy + t_obs[1]
    cz = vz + t_obs[2]
    z_safe = jnp.where(jnp.abs(cz) < 1e-8, 1e-8, cz)
    inv_z = 1.0 / z_safe
    u = cx * inv_z
    v = cy * inv_z

    dist = bm._DISTORT_CF[model_id]
    ones = jnp.ones_like(u)
    zeros = jnp.zeros_like(u)
    (du_, dv_), (ddu_u, ddv_u) = jax.jvp(
        lambda uu: dist(k_obs, uu, v), (u,), (ones,)
    )
    _, (ddu_v, ddv_v) = jax.jvp(lambda vv: dist(k_obs, u, vv), (v,), (ones,))

    if len(info.focal_idxs) == 1:
        fx = fy = k_obs[info.focal_idxs[0]]
        focal_cols = {info.focal_idxs[0]: ("both",)}
    else:
        fx = k_obs[info.focal_idxs[0]]
        fy = k_obs[info.focal_idxs[1]]
        focal_cols = {info.focal_idxs[0]: ("x",), info.focal_idxs[1]: ("y",)}
    pcx = k_obs[info.principal_idxs[0]]
    pcy = k_obs[info.principal_idxs[1]]
    px = fx * du_ + pcx
    py = fy * dv_ + pcy

    behind = (cz <= 1e-8) & (bucket.mask > 0)
    rx = jnp.where(behind, 1e3, (px - bucket.xy[0]) * bucket.mask)
    ry = jnp.where(behind, 1e3, (py - bucket.xy[1]) * bucket.mask)
    res = jnp.stack([rx, ry])

    # per-obs column weight: mask, and zero where the constant 1e3 residual
    # replaced the projection (matches the jvp of the where())
    wgt = bucket.mask * (1.0 - behind.astype(u.dtype))

    # A = d(px,py)/d(u,v); B = A @ d(u,v)/dXc (2x3 perspective)
    A11 = fx * ddu_u
    A12 = fx * ddu_v
    A21 = fy * ddv_u
    A22 = fy * ddv_v
    B1x = A11 * inv_z
    B1y = A12 * inv_z
    B1z = -(A11 * u + A12 * v) * inv_z
    B2x = A21 * inv_z
    B2y = A22 * inv_z
    B2z = -(A21 * u + A22 * v) * inv_z

    def col(jx, jy):
        return jnp.stack([jx * wgt, jy * wgt])

    cols = []
    # rotation (left tangent): dXc/dth = -[RX]x, columns (0,-vz,vy),
    # (vz,0,-vx), (-vy,vx,0)
    cols.append(col(-B1y * vz + B1z * vy, -B2y * vz + B2z * vy))
    cols.append(col(B1x * vz - B1z * vx, B2x * vz - B2z * vx))
    cols.append(col(-B1x * vy + B1y * vx, -B2x * vy + B2y * vx))
    # translation: dXc/dt = I
    cols.append(col(B1x, B2x))
    cols.append(col(B1y, B2y))
    cols.append(col(B1z, B2z))
    # intrinsics
    for j in range(MAX_PARAMS):
        if j in focal_cols:
            kind = focal_cols[j][0]
            if kind == "both":
                c = col(du_, dv_)
            elif kind == "x":
                c = col(du_, zeros)
            else:
                c = col(zeros, dv_)
        elif j == info.principal_idxs[0]:
            c = col(ones, zeros)
        elif j == info.principal_idxs[1]:
            c = col(zeros, ones)
        elif j in info.extra_idxs:
            tang = tuple(
                ones if i == j else zeros for i in range(MAX_PARAMS)
            )
            _, (ddu_k, ddv_k) = jax.jvp(
                lambda kk: dist(kk, u, v), (k_obs,), (tang,)
            )
            c = col(fx * ddu_k, fy * ddv_k)
        else:
            c = jnp.stack([zeros, zeros])
        cols.append(c * intr_free_obs[j][None])
    # point: dXc/dX = R(q)
    w, qx, qy, qz = q_obs
    R00 = 1 - 2 * (qy * qy + qz * qz)
    R01 = 2 * (qx * qy - w * qz)
    R02 = 2 * (qx * qz + w * qy)
    R10 = 2 * (qx * qy + w * qz)
    R11 = 1 - 2 * (qx * qx + qz * qz)
    R12 = 2 * (qy * qz - w * qx)
    R20 = 2 * (qx * qz - w * qy)
    R21 = 2 * (qy * qz + w * qx)
    R22 = 1 - 2 * (qx * qx + qy * qy)
    for Rc in ((R00, R10, R20), (R01, R11, R21), (R02, R12, R22)):
        cols.append(
            col(
                B1x * Rc[0] + B1y * Rc[1] + B1z * Rc[2],
                B2x * Rc[0] + B2y * Rc[1] + B2z * Rc[2],
            )
            * bucket.point_free[None, None, :]
        )
    J = jnp.stack(cols, axis=1)  # [2, 21, T, P]
    return res, J


def _bucket_res_and_jac_jvp(model_id, bucket, q_obs, t_obs, k_obs, intr_free_obs):
    """Residual [2, T, P] + Jacobian [2, 21, T, P] via 21 jvps.

    Reference implementation for the analytic fast path above (cross-checked
    in tests). Parameters are pre-gathered per observation, so the 21 jvp
    passes linearize a purely elementwise chain (gathers are jvp constants).
    intr_free_obs masks the intr columns so fixed intrinsics get
    exactly-zero Jacobians.
    """
    T, P = bucket.mask.shape
    zeros = jnp.zeros((6, T, P), dtype=jnp.float32)
    zeros_i = jnp.zeros((MAX_PARAMS, T, P), dtype=jnp.float32)
    zeros_p = jnp.zeros((3, T, P), dtype=jnp.float32)

    def f(d_pose, d_intr, d_pt):
        rx, ry = _bucket_residual(
            model_id, bucket, q_obs, t_obs, k_obs, d_pose, d_intr, d_pt
        )
        return jnp.stack([rx, ry])

    res = f(zeros, zeros_i, zeros_p)

    cols = []
    for k in range(6):
        tangent = (zeros.at[k].set(1.0), zeros_i, zeros_p)
        _, jc = jax.jvp(f, (zeros, zeros_i, zeros_p), tangent)
        cols.append(jc)
    for k in range(MAX_PARAMS):
        tangent = (zeros, zeros_i.at[k].set(1.0), zeros_p)
        _, jc = jax.jvp(f, (zeros, zeros_i, zeros_p), tangent)
        cols.append(jc * intr_free_obs[k][None])
    for k in range(3):
        tangent = (zeros, zeros_i, zeros_p.at[k].set(1.0))
        _, jc = jax.jvp(f, (zeros, zeros_i, zeros_p), tangent)
        cols.append(jc * bucket.point_free[None, None, :])
    J = jnp.stack(cols, axis=1)  # [2, 21, T, P]
    return res, J


def _inv3x3_planes(V):
    """V: [6, P] packed symmetric (a,b,c,d,e,f) = (00,01,02,11,12,22).

    Returns packed inverse [6, P]."""
    a, b, c, d, e, f = V
    A = d * f - e * e
    B = c * e - b * f
    C = b * e - c * d
    det = a * A + b * B + c * C
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    D = a * f - c * c
    E = b * c - a * e
    F = a * d - b * b
    inv = jnp.stack([A, B, C, D, E, F]) / det[None]
    return inv


def _sym3_apply(Vp, y):
    """Packed symmetric [6, P] times vector tuple (3 x [P])."""
    a, b, c, d, e, f = Vp
    y0, y1, y2 = y
    return (
        a * y0 + b * y1 + c * y2,
        b * y0 + d * y1 + e * y2,
        c * y0 + e * y1 + f * y2,
    )


def _scatter_cam(values, onehot_t, idx, num_segments):
    """values [k, T, P] -> [num_segments, k].

    onehot_t: transposed one-hot [num_segments, T*P] or None (-> segment_sum
    fallback). The contraction runs on the MXU; the [k, I] transpose is tiny.
    """
    k = values.shape[0]
    flat = values.reshape(k, -1)
    if onehot_t is not None:
        out = jax.lax.dot_general(
            flat, onehot_t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [k, I]
        return out.T
    return jax.ops.segment_sum(flat.T, idx.reshape(-1), num_segments=num_segments)


# ---------------------------------------------------------------------------
# the solver
# ---------------------------------------------------------------------------


def _lm_solve_bucketed(
    buckets, quat0, trans0, intr0, pose_free, intr_free, num_images,
    num_cameras, model_id, loss_type, loss_scale, cg_iters, max_iterations,
):
    I, C = num_images, num_cameras
    use_onehot = I <= _ONEHOT_MAX_SEGMENTS

    # Transposed one-hots serve both the matmul-gathers (full f32 value
    # precision) and the matmul-scatters; loop-invariant, computed once.
    onehots_img = []
    onehots_cam = []
    for b in buckets:
        if use_onehot:
            onehots_img.append(_make_onehot_t(b.img_idx, I))
            onehots_cam.append(_make_onehot_t(b.cam_idx, C))
        else:
            onehots_img.append(None)
            onehots_cam.append(None)

    npts = [b.points.shape[1] for b in buckets]

    # per-bucket per-obs intr-free masks (loop-invariant)
    intr_free_obs_l = []
    for b, onehot_c in zip(buckets, onehots_cam):
        if onehot_c is not None:
            intr_free_obs_l.append(
                tuple(_gather_mm(intr_free, onehot_c, b.mask.shape))
            )
        else:
            intr_free_obs_l.append(_gather_table(intr_free, b.cam_idx))

    def total_cost(quat, trans, intr, pts_list):
        cost = jnp.float32(0.0)
        for b, pts, oi, oc in zip(buckets, pts_list, onehots_img, onehots_cam):
            b2 = b._replace(points=pts)
            T, P = b2.mask.shape
            q_obs, t_obs, k_obs = _gather_obs_params(b2, quat, trans, intr, oi, oc)
            rx, ry = _bucket_residual(
                model_id, b2, q_obs, t_obs, k_obs,
                jnp.zeros((6, T, P)), jnp.zeros((MAX_PARAMS, T, P)),
                jnp.zeros((3, T, P)),
            )
            sq = rx * rx + ry * ry
            cost = cost + jnp.sum(
                _robust_cost(sq, loss_type, loss_scale) * b2.mask
            )
        return cost

    def lm_step(state):
        quat, trans, intr, pts_list, lam, cost, it, done = state

        # --- per-bucket residuals, Jacobians, robust weights -------------
        res_l, J_l = [], []
        for b, pts, oi, oc, ifo in zip(
            buckets, pts_list, onehots_img, onehots_cam, intr_free_obs_l
        ):
            b2 = b._replace(points=pts)
            q_obs, t_obs, k_obs = _gather_obs_params(b2, quat, trans, intr, oi, oc)
            res, J = _bucket_res_and_jac(
                model_id, b2, q_obs, t_obs, k_obs, ifo
            )
            sq = res[0] ** 2 + res[1] ** 2
            w = _robust_weight(sq, loss_type, loss_scale) * b2.mask
            sw = jnp.sqrt(w)
            res_l.append(res * sw[None])
            J_l.append(J * sw[None, None])

        # --- point blocks V (packed sym) + inverse ------------------------
        Vinv_l = []
        for J in J_l:
            Jp = J[:, 18:21]  # [2, 3, T, P]
            pairs = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
            V = jnp.stack(
                [jnp.sum(Jp[:, i] * Jp[:, j], axis=(0, 1)) for i, j in pairs]
            )  # [6, P]
            # LM damping on the diagonal entries (indices 0, 3, 5)
            damp = lam * jnp.maximum(jnp.stack([V[0], V[3], V[5]]), 1e-6)
            V = V.at[0].add(damp[0]).at[3].add(damp[1]).at[5].add(damp[2])
            Vinv_l.append(_inv3x3_planes(V))

        # --- gradients ----------------------------------------------------
        g_pose = jnp.zeros((I, 6))
        g_intr = jnp.zeros((C, MAX_PARAMS))
        g_pt_l = []
        for b, J, res, onehot_i, onehot_c in zip(
            buckets, J_l, res_l, onehots_img, onehots_cam
        ):
            gp = jnp.einsum("rkts,rts->kts", J[:, :6], res)
            g_pose = g_pose + _scatter_cam(gp, onehot_i, b.img_idx, I)
            gi = jnp.einsum("rkts,rts->kts", J[:, 6:18], res)
            g_intr = g_intr + _scatter_cam(gi, onehot_c, b.cam_idx, C)
            g_pt_l.append(jnp.einsum("rkts,rts->ks", J[:, 18:21], res))

        # --- reduced RHS: g_c - B C^-1 g_p --------------------------------
        rhs_pose = g_pose
        rhs_intr = g_intr
        z0_l = []
        for b, J, Vinv, g_pt, onehot_i, onehot_c in zip(
            buckets, J_l, Vinv_l, g_pt_l, onehots_img, onehots_cam
        ):
            z0 = jnp.stack(_sym3_apply(Vinv, (g_pt[0], g_pt[1], g_pt[2])))
            z0_l.append(z0)
            Jz = jnp.einsum("rkts,ks->rts", J[:, 18:21], z0)
            rp = jnp.einsum("rkts,rts->kts", J[:, :6], Jz)
            rhs_pose = rhs_pose - _scatter_cam(rp, onehot_i, b.img_idx, I)
            ri = jnp.einsum("rkts,rts->kts", J[:, 6:18], Jz)
            rhs_intr = rhs_intr - _scatter_cam(ri, onehot_c, b.cam_idx, C)
        rhs_pose = rhs_pose * pose_free
        rhs_intr = rhs_intr * intr_free

        # --- damping diagonals + SCHUR_JACOBI preconditioner --------------
        U_diag_pose = jnp.zeros((I, 6))
        U_diag_intr = jnp.zeros((C, MAX_PARAMS))
        S_blocks = jnp.zeros((I, 21))  # packed sym 6x6 (21 entries)
        tri = [(i, j) for i in range(6) for j in range(i, 6)]
        for b, J, Vinv, onehot_i, onehot_c in zip(
            buckets, J_l, Vinv_l, onehots_img, onehots_cam
        ):
            Jc = J[:, :6]
            Jp = J[:, 18:21]
            ud = jnp.einsum("rkts,rkts->kts", Jc, Jc)
            U_diag_pose = U_diag_pose + _scatter_cam(ud, onehot_i, b.img_idx, I)
            ui = jnp.einsum("rkts,rkts->kts", J[:, 6:18], J[:, 6:18])
            U_diag_intr = U_diag_intr + _scatter_cam(ui, onehot_c, b.cam_idx, C)
            # W = Jc^T Jp per obs: [6, 3, T, P]
            W = jnp.einsum("rkts,rats->kats", Jc, Jp)
            # VW[i, b] = sum_a W[i, a] Vinv[a, b]  (Vinv symmetric, packed)
            a, bb, c, d, e, f = Vinv
            VW = jnp.stack(
                [
                    a[None] * W[:, 0] + bb[None] * W[:, 1] + c[None] * W[:, 2],
                    bb[None] * W[:, 0] + d[None] * W[:, 1] + e[None] * W[:, 2],
                    c[None] * W[:, 0] + e[None] * W[:, 1] + f[None] * W[:, 2],
                ],
                axis=1,
            )  # [6, 3, T, P]
            # S_ii[i,j] = sum_r Jc[r,i] Jc[r,j] - sum_b VW[i,b] W[j,b]
            blocks = jnp.stack(
                [
                    jnp.einsum("rts,rts->ts", Jc[:, i], Jc[:, j])
                    - jnp.einsum("bts,bts->ts", VW[i], W[j])
                    for (i, j) in tri
                ]
            )
            S_blocks = S_blocks + _scatter_cam(blocks, onehot_i, b.img_idx, I)

        damp_pose = lam * jnp.maximum(U_diag_pose, 1e-6)
        damp_intr = lam * jnp.maximum(U_diag_intr, 1e-6)

        # unpack packed sym 6x6 + damping, invert per image
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

        # CG-stream Jacobian dtype. bf16 replicas were measured SLOWER here:
        # bf16 tiles are (16, 128) and the dominant track-length bucket has
        # T=8, so the halved traffic is eaten by sublane padding (plus the
        # per-LM-iteration cast of [2, 21, T, P]). Kept as a knob — revisit
        # if bucket shapes change.
        _CG_DTYPE = jnp.float32
        J16_l = [
            J if _CG_DTYPE == jnp.float32 else J.astype(_CG_DTYPE)
            for J in J_l
        ]

        def matvec(x_pose, x_intr):
            out_pose = damp_pose * x_pose
            out_intr = damp_intr * x_intr
            for b, J16, Vinv, onehot_i, onehot_c in zip(
                buckets, J16_l, Vinv_l, onehots_img, onehots_cam
            ):
                if onehot_i is not None:
                    xp = _gather_mm(x_pose, onehot_i, b.mask.shape)
                    xi = _gather_mm(x_intr, onehot_c, b.mask.shape)
                else:
                    xp = jnp.stack(_gather_table(x_pose, b.img_idx))
                    xi = jnp.stack(_gather_table(x_intr, b.cam_idx))
                xc = jnp.concatenate([xp, xi]).astype(_CG_DTYPE)  # [18,T,P]
                a_obs = jnp.einsum(
                    "rkts,kts->rts", J16[:, :18], xc,
                    preferred_element_type=jnp.float32,
                )  # [2, T, P]
                y_p = jnp.einsum(
                    "rkts,rts->ks", J16[:, 18:21], a_obs.astype(_CG_DTYPE),
                    preferred_element_type=jnp.float32,
                )
                z_p = jnp.stack(_sym3_apply(Vinv, (y_p[0], y_p[1], y_p[2])))
                d = a_obs - jnp.einsum(
                    "rkts,ks->rts", J16[:, 18:21], z_p.astype(_CG_DTYPE),
                    preferred_element_type=jnp.float32,
                )
                d16 = d.astype(_CG_DTYPE)
                op = jnp.einsum(
                    "rkts,rts->kts", J16[:, :6], d16,
                    preferred_element_type=jnp.float32,
                )
                out_pose = out_pose + _scatter_cam(op, onehot_i, b.img_idx, I)
                oi = jnp.einsum(
                    "rkts,rts->kts", J16[:, 6:18], d16,
                    preferred_element_type=jnp.float32,
                )
                out_intr = out_intr + _scatter_cam(oi, onehot_c, b.cam_idx, C)
            return out_pose * pose_free, out_intr * intr_free

        # --- PCG ----------------------------------------------------------
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

        z_pose, z_intr = precond(rhs_pose, rhs_intr)
        rz0 = jnp.sum(rhs_pose * z_pose) + jnp.sum(rhs_intr * z_intr)
        (x_pose, x_intr, *_), _ = jax.lax.scan(
            cg_body,
            (jnp.zeros_like(rhs_pose), jnp.zeros_like(rhs_intr),
             rhs_pose, rhs_intr, z_pose, z_intr, rz0),
            None,
            length=cg_iters,
        )

        # --- back-substitute points --------------------------------------
        new_pts_list = []
        for b, J, Vinv, g_pt, pts, oi, oc in zip(
            buckets, J_l, Vinv_l, g_pt_l, pts_list, onehots_img, onehots_cam
        ):
            if oi is not None:
                xp = _gather_mm(x_pose, oi, b.mask.shape)
                xi = _gather_mm(x_intr, oc, b.mask.shape)
            else:
                xp = _gather_table(x_pose, b.img_idx)
                xi = _gather_table(x_intr, b.cam_idx)
            a_obs = sum(J[:, k] * xp[k][None] for k in range(6)) + sum(
                J[:, 6 + k] * xi[k][None] for k in range(MAX_PARAMS)
            )
            bt = jnp.einsum("rkts,rts->ks", J[:, 18:21], a_obs)
            dp = jnp.stack(
                _sym3_apply(
                    Vinv,
                    (g_pt[0] - bt[0], g_pt[1] - bt[1], g_pt[2] - bt[2]),
                )
            )
            new_pts_list.append(pts - dp * b.point_free[None])

        # --- apply + accept/reject ---------------------------------------
        wq, xq, yq, zq = quat[:, 0], quat[:, 1], quat[:, 2], quat[:, 3]
        nq = bm.quat_boxplus_cf(
            (wq, xq, yq, zq), (-x_pose[:, 0], -x_pose[:, 1], -x_pose[:, 2])
        )
        new_quat = jnp.stack(nq, axis=1)
        new_trans = trans - x_pose[:, 3:6]
        new_intr = intr - x_intr

        new_cost = total_cost(new_quat, new_trans, new_intr, new_pts_list)
        improved = new_cost < cost
        quat = jnp.where(improved, new_quat, quat)
        trans = jnp.where(improved, new_trans, trans)
        intr = jnp.where(improved, new_intr, intr)
        pts_out = [
            jnp.where(improved, np_, op_)
            for np_, op_ in zip(new_pts_list, pts_list)
        ]
        cost_out = jnp.where(improved, new_cost, cost)
        lam = jnp.where(improved, jnp.maximum(lam / 3.0, 1e-10), lam * 4.0)
        rel = (cost - cost_out) / jnp.maximum(cost, 1e-20)
        done = jnp.logical_or(done, jnp.logical_and(improved, rel < 1e-7))
        done = jnp.logical_or(done, lam > 1e10)
        return quat, trans, intr, pts_out, lam, cost_out, it + 1, done

    def cond(state):
        *_, it, done = state
        return jnp.logical_and(it < max_iterations, jnp.logical_not(done))

    pts0 = [b.points for b in buckets]
    cost0 = total_cost(quat0, trans0, intr0, pts0)
    init = (quat0, trans0, intr0, pts0, jnp.float32(1e-4), cost0,
            jnp.int32(0), jnp.array(False))
    quat, trans, intr, pts_list, lam, cost, it, done = jax.lax.while_loop(
        cond, lm_step, init
    )
    return quat, trans, intr, pts_list, cost0, cost, it


@partial(
    jax.jit,
    static_argnames=(
        "num_images", "num_cameras", "model_id", "loss_type", "cg_iters",
        "max_iterations",
    ),
)
def _solve_bucketed_jit(
    buckets, quat0, trans0, intr0, pose_free, intr_free,
    num_images, num_cameras, model_id, loss_type, loss_scale,
    cg_iters, max_iterations,
):
    return _lm_solve_bucketed(
        buckets, quat0, trans0, intr0, pose_free, intr_free,
        num_images, num_cameras, model_id, loss_type, loss_scale,
        cg_iters, max_iterations,
    )


def _shard_buckets(buckets, mesh):
    """Place bucket arrays on a mesh, sharding the point axis (minor).

    A point and all its observations live in one column, so this is the
    point-aligned partitioning of SURVEY.md §2c P4: per-shard Schur
    elimination; XLA inserts psums for the one-hot camera contractions.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    axis = mesh.axis_names[0]

    def put(a):
        spec = P(*([None] * (a.ndim - 1) + [axis]))
        return jax.device_put(a, NamedSharding(mesh, spec))

    return tuple(
        Bucket(*(put(arr) for arr in b)) for b in buckets
    )


def solve_bundle_fast(problem: BundleProblem, options, cg_iters: int = 30,
                      mesh=None):
    """Bucketed fast path; same contract as bundle_adjustment.solve_bundle.

    mesh: optional jax.sharding.Mesh — buckets are sharded along the point
    axis for multi-chip distributed BA.
    """
    if problem.num_obs == 0 or float(np.asarray(problem.obs_mask).sum()) == 0:
        return problem, BASummary(0.0, 0.0, 0, 0)
    buckets = bucketize(problem)
    if not buckets:
        return problem, BASummary(0.0, 0.0, 0, 0)
    if mesh is not None:
        buckets = _shard_buckets(buckets, mesh)
    # pad camera-block counts to powers of two (dummy rows are fully fixed);
    # all host-side numpy — the jit call transfers everything in one batch
    I, C = problem.num_images, problem.num_cameras
    I_pad = _pad_4x(I, 8)
    C_pad = _pad_4x(C, 1)
    cam_quat = np.asarray(problem.cam_quat, np.float32)
    cam_trans = np.asarray(problem.cam_trans, np.float32)
    pose_free = np.asarray(problem.pose_free, np.float32)
    intrinsics = np.asarray(problem.intrinsics, np.float32)
    intr_free = np.asarray(problem.intr_free, np.float32)
    if I_pad > I:
        cam_quat = np.concatenate(
            [cam_quat,
             np.tile(np.array([[1.0, 0, 0, 0]], np.float32), (I_pad - I, 1))]
        )
        cam_trans = np.concatenate(
            [cam_trans, np.zeros((I_pad - I, 3), np.float32)]
        )
        pose_free = np.concatenate(
            [pose_free, np.zeros((I_pad - I, 6), np.float32)]
        )
    if C_pad > C:
        intrinsics = np.concatenate(
            [intrinsics, np.ones((C_pad - C, intrinsics.shape[1]), np.float32)]
        )
        intr_free = np.concatenate(
            [intr_free, np.zeros((C_pad - C, intr_free.shape[1]), np.float32)]
        )

    quat, trans, intr, pts_list, cost0, cost, it = _solve_bucketed_jit(
        buckets,
        cam_quat, cam_trans, intrinsics,
        pose_free, intr_free,
        I_pad, C_pad, problem.model_id,
        int(options.loss_function_type),
        jnp.float32(options.loss_function_scale),
        cg_iters, int(options.max_num_iterations),
    )
    # one batched D2H transfer for all results (per-array np.asarray would
    # cost a round-trip each)
    quat, trans, intr, pts_list, cost0, cost, it = jax.device_get(
        (quat, trans, intr, pts_list, cost0, cost, it)
    )
    quat = quat[:I]
    trans = trans[:I]
    intr = intr[:C]
    # write bucketed points back to flat rows
    points = np.asarray(problem.points).copy()
    for b, pts in zip(buckets, pts_list):
        rows = np.asarray(b.point_rows)
        vals = np.asarray(pts).T  # [P, 3]
        # padded columns repeat row 0; only real rows are distinct — padded
        # entries have point_free 0 and mask 0 so their values are unchanged
        sel = np.asarray(b.mask[0] > 0) | (np.asarray(b.point_free) > 0)
        points[rows[sel]] = vals[sel]
    summary = BASummary(float(cost0), float(cost), int(it), 2 * problem.num_obs)
    new_problem = problem._replace(
        cam_quat=quat, cam_trans=trans, intrinsics=intr,
        points=jnp.asarray(points),
    )
    return new_problem, summary
