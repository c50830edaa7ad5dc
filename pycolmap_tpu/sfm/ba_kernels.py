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

import os
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

# Dense-Schur cutoff on the reduced camera-system dimension D = 6*I + 12*C.
# Below this, the reduced system S = U + damp - W Vinv W^T is materialized as
# one dense [D, D] matrix via a single well-shaped [D, 3P] x [3P, D] MXU
# matmul, and CG runs on it with [D,D]x[D] matvecs (~1 us each) instead of
# 20 implicit matvecs that each stream J + one-hots from HBM through
# narrow (18-wide) MXU contractions. Measured (2026-08-18, v5e, C3 scale:
# 128 imgs / 600k obs): implicit CG costs 2.37 ms/matvec -> 47 ms of the
# 93 ms LM iteration; the dense build replaces CG + the 6x6-block
# preconditioner stage. Ceres makes the same tradeoff (DENSE_SCHUR is its
# recommended type for <~a few hundred cameras).
_DENSE_SCHUR_MAX_D = 2048


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
    and streams at full HBM bandwidth.

    precision=HIGHEST is required for exactness: at default precision the
    MXU truncates f32 operands to bf16, so gathered values (poses,
    intrinsics) would silently lose ~3 decimal digits (measured 2026-08-18:
    max err 7.5e-3 on unit-scale tables, 0.0 at HIGHEST)."""
    out = jax.lax.dot_general(
        table.T, onehot_t, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
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


def _jt_apply(Jsub, res):
    """[2, k, T, P] x [2, T, P] -> [k, T, P]: per-obs J^T r.

    Hand-expanded: einsum("rkts,rts->kts") lowers to a tiny-batched gemm at
    ~1% MXU utilization (measured 6x slower than fused VPU stacks)."""
    return jnp.stack(
        [Jsub[0, k] * res[0] + Jsub[1, k] * res[1]
         for k in range(Jsub.shape[1])]
    )


def _jt_apply_sum_t(Jsub, res):
    """[2, k, T, P] x [2, T, P] -> [k, P]: J^T r reduced over the track axis
    (point-local reduction; all observations of a point share a column)."""
    return jnp.stack(
        [jnp.sum(Jsub[0, k] * res[0] + Jsub[1, k] * res[1], axis=0)
         for k in range(Jsub.shape[1])]
    )


def _j_apply_pt(Jsub, z):
    """[2, k, T, P] x [k, P] -> [2, T, P]: apply point-block columns."""
    return sum(Jsub[:, k] * z[k][None, None, :] for k in range(Jsub.shape[1]))


def _chol3x3_planes(Vp):
    """Closed-form Cholesky of packed SPD 3x3 planes.

    Vp: [6, P] packed (a,b,c,d,e,f) = (00,01,02,11,12,22). Returns the six
    nonzero entries of lower L with L L^T = V: (l00, l10, l20, l11, l21, l22).
    """
    a, b, c, d, e, f = Vp
    l00 = jnp.sqrt(jnp.maximum(a, 1e-20))
    l10 = b / l00
    l20 = c / l00
    l11 = jnp.sqrt(jnp.maximum(d - l10 * l10, 1e-20))
    l21 = (e - l10 * l20) / l11
    l22 = jnp.sqrt(jnp.maximum(f - l20 * l20 - l21 * l21, 1e-20))
    return l00, l10, l20, l11, l21, l22


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

    precision=HIGHEST: default MXU precision rounds the f32 values to bf16
    before the product with the 0/1 one-hot, corrupting gradient/Hessian
    reductions (see _gather_mm).
    """
    k = values.shape[0]
    flat = values.reshape(k, -1)
    if onehot_t is not None:
        out = jax.lax.dot_general(
            flat, onehot_t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [k, I]
        return out.T
    return jax.ops.segment_sum(flat.T, idx.reshape(-1), num_segments=num_segments)


def _dense_schur_solve(
    buckets, J_l, Vinv_l, onehots_img, onehots_cam, rhs_pose, rhs_intr,
    lam, pose_free, intr_free, img2cam, I, C, cg_iters,
):
    """Materialize the reduced camera system S = U + damp - W Vinv W^T as a
    dense [D, D] matrix (D = 6*I + MAX_PARAMS*C) and solve S x = rhs by PCG.

    TPU rationale (see _DENSE_SCHUR_MAX_D): the Schur-correction term is
    built as one MXU-friendly rank-3P product  B = Z Z^T  with
    Z[(i,k), (a,p)] = sum_t onehot(img)  Jc^T Jp L  (L = chol(Vinv)), so the
    dominant FLOPs land in a single [D, 3P] x [3P, D] matmul instead of
    cg_iters implicit matvecs that each re-stream J and the one-hots from
    HBM through 18-wide (mostly idle) MXU contractions.

    Replaces Ceres' DENSE_SCHUR + dense Cholesky (reference exposes it via
    pipeline/sfm.h:266-295 solver options); we keep PCG on the dense S with
    the same SCHUR_JACOBI-style block preconditioner because XLA:TPU dense
    factorizations are serial-panel bound, while [D,D]x[D] matvecs are ~free.
    """
    D = 6 * I + MAX_PARAMS * C
    hi = jax.lax.Precision.HIGHEST

    # Implementation notes (measured 2026-08-18, v5e, dominant T=8 bucket):
    # - einsums like "rkts,rats->kats" lower to ~1%-utilization tiny-batched
    #   gemms (7.2 ms); the same contraction as stacked elementwise FMAs
    #   fuses on the VPU (1.2 ms). Everything below is hand-expanded.
    # - Z is built by T broadcast-FMA sweeps (scatter-by-image keeping the
    #   point axis is not matmul-shaped; a batched [I,T]x[T,18] gemm per
    #   point runs at 0.9% MXU utilization).
    # - Z Z^T runs at default precision: the MXU truncates the f32 operands
    #   to bf16 (rel err ~1e-3 on S), which only perturbs the STEP direction
    #   (inexact Newton, like truncated CG); cost accept/reject stays exact.
    S = jnp.zeros((D, D), jnp.float32)
    U_pp = jnp.zeros((I, 36))
    U_pi = jnp.zeros((I, 6 * MAX_PARAMS))
    U_ii = jnp.zeros((C, MAX_PARAMS, MAX_PARAMS))
    for b, J, Vinv, oi, oc in zip(buckets, J_l, Vinv_l, onehots_img, onehots_cam):
        T, P = b.mask.shape
        Jc = J[:, :6]
        Ji = J[:, 6:18]
        Jp = J[:, 18:21]
        l00, l10, l20, l11, l21, l22 = _chol3x3_planes(Vinv)
        # JpL[r, a] = sum_b Jp[r, b] L[b, a]  (L lower-triangular)
        JpL = (
            Jp[:, 0] * l00[None] + Jp[:, 1] * l10[None] + Jp[:, 2] * l20[None],
            Jp[:, 1] * l11[None] + Jp[:, 2] * l21[None],
            Jp[:, 2] * l22[None],
        )  # 3 x [2, T, P]
        # W~ = Jc^T (Jp L) per obs: [18, 3, T, P] as elementwise stacks
        W = [
            [J[0, k] * JpL[a][0] + J[1, k] * JpL[a][1] for a in range(3)]
            for k in range(18)
        ]
        # Z[(i,k),(a,p)] = sum_t OH[i,t,p] W[k,a,t,p]: T broadcast-FMA sweeps
        oh3 = oi.reshape(I, T, P)
        Zp = sum(
            oh3[:, t, None, None, :]
            * jnp.stack(
                [jnp.stack([W[k][a][t] for a in range(3)]) for k in range(6)]
            )[None]
            for t in range(T)
        )  # [I, 6, 3, P]
        if C == 1:
            # single camera: OH_c is all-ones over valid obs; padded obs have
            # zero Jacobians, so the scatter is a plain sum over t
            Zi = jnp.stack(
                [
                    jnp.stack([sum(W[6 + k][a][t] for t in range(T))
                               for a in range(3)])
                    for k in range(MAX_PARAMS)
                ]
            )[None]  # [1, 12, 3, P]
        else:
            oc3 = oc.reshape(C, T, P)
            Zi = sum(
                oc3[:, t, None, None, :]
                * jnp.stack(
                    [jnp.stack([W[6 + k][a][t] for a in range(3)])
                     for k in range(MAX_PARAMS)]
                )[None]
                for t in range(T)
            )  # [C, 12, 3, P]
        Zf = jnp.concatenate(
            [Zp.reshape(6 * I, 3 * P), Zi.reshape(MAX_PARAMS * C, 3 * P)]
        )
        S = S - jax.lax.dot_general(
            Zf, Zf, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # U blocks (pose-pose / pose-intr / intr-intr), elementwise products
        # + HIGHEST-precision one-hot scatter matmuls (values must be exact)
        upp = jnp.stack(
            [J[0, k] * J[0, l] + J[1, k] * J[1, l]
             for k in range(6) for l in range(6)]
        )
        U_pp = U_pp + _scatter_cam(upp, oi, b.img_idx, I)
        upi = jnp.stack(
            [J[0, k] * J[0, 6 + l] + J[1, k] * J[1, 6 + l]
             for k in range(6) for l in range(MAX_PARAMS)]
        )
        U_pi = U_pi + _scatter_cam(upi, oi, b.img_idx, I)
        # intr-intr via one well-shaped [24, M] x [M, 24] self-matmul
        Jif = Ji.reshape(2 * MAX_PARAMS, T * P)
        uii_rr = jax.lax.dot_general(
            Jif, Jif, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hi,
        ).reshape(2, MAX_PARAMS, 2, MAX_PARAMS)
        uii_full = uii_rr[0, :, 0, :] + uii_rr[1, :, 1, :]
        if C == 1:
            U_ii = U_ii + uii_full[None]
        else:
            uii = jnp.stack(
                [Ji[0, k] * Ji[0, l] + Ji[1, k] * Ji[1, l]
                 for k in range(MAX_PARAMS) for l in range(MAX_PARAMS)]
            )
            U_ii = U_ii + _scatter_cam(uii, oc, b.cam_idx, C).reshape(
                C, MAX_PARAMS, MAX_PARAMS
            )

    U_pp = U_pp.reshape(I, 6, 6)
    U_pi = U_pi.reshape(I, 6, MAX_PARAMS)
    U_ii = U_ii.reshape(C, MAX_PARAMS, MAX_PARAMS)
    damp_pose = lam * jnp.maximum(jnp.diagonal(U_pp, axis1=1, axis2=2), 1e-6)
    damp_intr = lam * jnp.maximum(jnp.diagonal(U_ii, axis1=1, axis2=2), 1e-6)
    U_pp = U_pp + jax.vmap(jnp.diag)(damp_pose)
    U_ii = U_ii + jax.vmap(jnp.diag)(damp_intr)

    # scatter U blocks into the dense system
    arI = jnp.arange(I)
    ar6 = jnp.arange(6)
    arK = jnp.arange(MAX_PARAMS)
    rows_p = 6 * arI[:, None, None] + ar6[None, :, None]  # [I, 6, 1]
    cols_p = 6 * arI[:, None, None] + ar6[None, None, :]  # [I, 1, 6]
    S = S.at[rows_p, cols_p].add(U_pp)
    cols_i = 6 * I + MAX_PARAMS * img2cam[:, None, None] + arK[None, None, :]
    S = S.at[rows_p, cols_i].add(U_pi)
    S = S.at[cols_i.transpose(0, 2, 1), cols_p].add(U_pi.transpose(0, 2, 1))
    arC = jnp.arange(C)
    rows_c = 6 * I + MAX_PARAMS * arC[:, None, None] + arK[None, :, None]
    cols_c = 6 * I + MAX_PARAMS * arC[:, None, None] + arK[None, None, :]
    S = S.at[rows_c, cols_c].add(U_ii)

    # fixed parameters: zero rows/cols, unit diagonal
    free = jnp.concatenate([pose_free.reshape(-1), intr_free.reshape(-1)])
    S = S * free[:, None] * free[None, :] + jnp.diag(1.0 - free)

    # block-Jacobi preconditioner from S's diagonal blocks
    blk = S[: 6 * I, : 6 * I].reshape(I, 6, I, 6)[arI, :, arI, :]  # [I, 6, 6]
    P_inv = jnp.linalg.inv(blk + 1e-6 * jnp.eye(6))
    dint = jnp.diagonal(S)[6 * I:]
    dint = jnp.where(jnp.abs(dint) < 1e-8, 1.0, dint)

    rhs = jnp.concatenate([rhs_pose.reshape(-1), rhs_intr.reshape(-1)])

    def precond(r):
        zp = jnp.einsum(
            "iab,ib->ia", P_inv, r[: 6 * I].reshape(I, 6)
        ).reshape(-1)
        zi = r[6 * I:] / dint
        return jnp.concatenate([zp, zi]) * free

    def matvec(x):
        return jax.lax.dot_general(
            S, x[:, None], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hi,
        )[:, 0]

    def cg_body(carry, _):
        x, r, p, rz = carry
        Ap = matvec(p)
        pAp = jnp.dot(p, Ap)
        alpha = rz / jnp.where(jnp.abs(pAp) < 1e-20, 1e-20, pAp)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.dot(r, z)
        beta = rz_new / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
        p = z + beta * p
        return (x, r, p, rz_new), None

    z0 = precond(rhs)
    (x, *_), _ = jax.lax.scan(
        cg_body, (jnp.zeros_like(rhs), rhs, z0, jnp.dot(rhs, z0)),
        None, length=cg_iters,
    )
    x_pose = x[: 6 * I].reshape(I, 6) * pose_free
    x_intr = x[6 * I:].reshape(C, MAX_PARAMS) * intr_free
    return x_pose, x_intr


# ---------------------------------------------------------------------------
# the solver
# ---------------------------------------------------------------------------


def _lm_solve_bucketed(
    buckets, quat0, trans0, intr0, pose_free, intr_free, num_images,
    num_cameras, model_id, loss_type, loss_scale, cg_iters, max_iterations,
    img2cam=None,
):
    from pycolmap_tpu.sfm import cg_kernel as _ck

    I, C = num_images, num_cameras
    use_onehot = I <= _ONEHOT_MAX_SEGMENTS
    use_pallas_mv = _ck.matvec_enabled()
    # Pallas lane-gather for per-obs parameters (res+jac, back-substitution,
    # total_cost): same gate as the matvec kernel. Replaces the one-hot
    # MXU gathers, whose [I, T*P] one-hots cost ~537 MB of HBM read per
    # _gather_mm call at C3 bench scale (see cg_kernel.gather_params_bucket).
    use_pallas_gather = use_pallas_mv
    # with the fused Pallas CG kernels the implicit path beats the dense
    # build well before D = 2048 (measured 24.3 vs 10.7 LM iters/s at
    # C3 scale, D = 780); keep dense only for small local-BA windows
    dense_default = 512 if use_pallas_mv else _DENSE_SCHUR_MAX_D
    dense_max_d = int(
        os.environ.get("PYCOLMAP_TPU_DENSE_SCHUR_MAX_D", dense_default)
    )
    use_dense = (
        img2cam is not None
        and use_onehot
        and (6 * I + MAX_PARAMS * C) <= dense_max_d
    )

    # Transposed one-hots serve both the matmul-gathers (full f32 value
    # precision) and the matmul-scatters; loop-invariant, computed once.
    # On the Pallas fast path the kernels gather/scatter in-register, so the
    # one-hots are only needed by the dense-Schur solve.
    need_onehot = use_onehot and (not use_pallas_mv or use_dense)
    onehots_img = []
    onehots_cam = []
    for b in buckets:
        if need_onehot:
            onehots_img.append(_make_onehot_t(b.img_idx, I))
            onehots_cam.append(_make_onehot_t(b.cam_idx, C))
        else:
            onehots_img.append(None)
            onehots_cam.append(None)

    npts = [b.points.shape[1] for b in buckets]

    def _obs_params(b, quat, trans, intr, oi, oc):
        if use_pallas_gather:
            return _ck.gather_obs_params(b, quat, trans, intr)
        return _gather_obs_params(b, quat, trans, intr, oi, oc)

    # per-bucket per-obs intr-free masks (loop-invariant)
    intr_free_obs_l = []
    for b, onehot_c in zip(buckets, onehots_cam):
        if use_pallas_gather:
            zq = jnp.zeros((I, 4), jnp.float32)
            zt = jnp.zeros((I, 3), jnp.float32)
            _, _, ifo = _ck.gather_obs_params(b, zq, zt, intr_free)
            intr_free_obs_l.append(ifo)
        elif onehot_c is not None:
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
            q_obs, t_obs, k_obs = _obs_params(b2, quat, trans, intr, oi, oc)
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

    def _finish_step(
        quat, trans, intr, pts_list, lam, cost, it, done,
        x_pose, x_intr, J_l, Vinv_l, g_pt_l,
    ):
        # --- back-substitute points --------------------------------------
        new_pts_list = []
        for b, J, Vinv, g_pt, pts, oi, oc in zip(
            buckets, J_l, Vinv_l, g_pt_l, pts_list, onehots_img, onehots_cam
        ):
            if use_pallas_gather:
                xp, xi = _ck.gather_x(b, x_pose, x_intr)
            elif oi is not None:
                xp = _gather_mm(x_pose, oi, b.mask.shape)
                xi = _gather_mm(x_intr, oc, b.mask.shape)
            else:
                xp = _gather_table(x_pose, b.img_idx)
                xi = _gather_table(x_intr, b.cam_idx)
            a_obs = sum(J[:, k] * xp[k][None] for k in range(6)) + sum(
                J[:, 6 + k] * xi[k][None] for k in range(MAX_PARAMS)
            )
            bt = _jt_apply_sum_t(J[:, 18:21], a_obs)
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

    def _cg_phase(quat, trans, intr, pts_list, lam, cost, it, done,
                  J_l, Vinv_l, g_pt_l, rhs_pose, rhs_intr,
                  U_diag_pose, U_diag_intr, S_blocks):
        """SCHUR_JACOBI preconditioner + implicit-matvec PCG + step.

        Shared tail of lm_step for the fused-Pallas and XLA
        preparation paths."""
        tri = [(i, j) for i in range(6) for j in range(i, 6)]
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
            if use_pallas_mv:
                # fused Pallas matvec: streams J once, no HBM one-hots
                # (the XLA path below reads 2.1 GB of one-hot per matvec
                # at C3 scale — see cg_kernel.py)
                mp, mi = _ck.schur_matvec(
                    buckets, J16_l, Vinv_l, x_pose, x_intr, I, C
                )
                return (
                    (out_pose + mp) * pose_free,
                    (out_intr + mi) * intr_free,
                )
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
                a_obs = sum(
                    J16[:, k] * xc[k][None] for k in range(18)
                )  # [2, T, P]
                y_p = _jt_apply_sum_t(J16[:, 18:21], a_obs.astype(_CG_DTYPE))
                z_p = jnp.stack(_sym3_apply(Vinv, (y_p[0], y_p[1], y_p[2])))
                d = a_obs - _j_apply_pt(
                    J16[:, 18:21], z_p.astype(_CG_DTYPE)
                )
                d16 = d.astype(_CG_DTYPE)
                op = _jt_apply(J16[:, :6], d16)
                out_pose = out_pose + _scatter_cam(op, onehot_i, b.img_idx, I)
                oi = _jt_apply(J16[:, 6:18], d16)
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
        return _finish_step(
            quat, trans, intr, pts_list, lam, cost, it, done,
            x_pose, x_intr, J_l, Vinv_l, g_pt_l,
        )

    def lm_step(state):
        quat, trans, intr, pts_list, lam, cost, it, done = state

        # --- per-bucket residuals, Jacobians, robust weights -------------
        res_l, J_l = [], []
        for b, pts, oi, oc, ifo in zip(
            buckets, pts_list, onehots_img, onehots_cam, intr_free_obs_l
        ):
            b2 = b._replace(points=pts)
            q_obs, t_obs, k_obs = _obs_params(b2, quat, trans, intr, oi, oc)
            res, J = _bucket_res_and_jac(
                model_id, b2, q_obs, t_obs, k_obs, ifo
            )
            sq = res[0] ** 2 + res[1] ** 2
            w = _robust_weight(sq, loss_type, loss_scale) * b2.mask
            sw = jnp.sqrt(w)
            res_l.append(res * sw[None])
            J_l.append(J * sw[None, None])

        if use_pallas_mv:
            # fused Pallas preparation: V inverses, point gradients,
            # reduced RHS, damping diagonals, and SCHUR_JACOBI blocks in
            # one pass over J per bucket (see cg_kernel.schur_prepare) —
            # replaces the four XLA stages below and their one-hot streams
            (Vinv_l, g_pt_l, rhs_pose, rhs_intr, U_diag_pose, U_diag_intr,
             S_blocks) = _ck.schur_prepare(buckets, J_l, res_l, lam, I, C)
            rhs_pose = rhs_pose * pose_free
            rhs_intr = rhs_intr * intr_free
            if use_dense:
                x_pose, x_intr = _dense_schur_solve(
                    buckets, J_l, Vinv_l, onehots_img, onehots_cam,
                    rhs_pose, rhs_intr, lam, pose_free, intr_free, img2cam,
                    I, C, max(cg_iters, 64),
                )
                return _finish_step(
                    quat, trans, intr, pts_list, lam, cost, it, done,
                    x_pose, x_intr, J_l, Vinv_l, g_pt_l,
                )
            return _cg_phase(
                quat, trans, intr, pts_list, lam, cost, it, done,
                J_l, Vinv_l, g_pt_l, rhs_pose, rhs_intr,
                U_diag_pose, U_diag_intr, S_blocks,
            )

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
            gp = _jt_apply(J[:, :6], res)
            g_pose = g_pose + _scatter_cam(gp, onehot_i, b.img_idx, I)
            gi = _jt_apply(J[:, 6:18], res)
            g_intr = g_intr + _scatter_cam(gi, onehot_c, b.cam_idx, C)
            g_pt_l.append(_jt_apply_sum_t(J[:, 18:21], res))

        # --- reduced RHS: g_c - B C^-1 g_p --------------------------------
        rhs_pose = g_pose
        rhs_intr = g_intr
        z0_l = []
        for b, J, Vinv, g_pt, onehot_i, onehot_c in zip(
            buckets, J_l, Vinv_l, g_pt_l, onehots_img, onehots_cam
        ):
            z0 = jnp.stack(_sym3_apply(Vinv, (g_pt[0], g_pt[1], g_pt[2])))
            z0_l.append(z0)
            Jz = _j_apply_pt(J[:, 18:21], z0)
            rp = _jt_apply(J[:, :6], Jz)
            rhs_pose = rhs_pose - _scatter_cam(rp, onehot_i, b.img_idx, I)
            ri = _jt_apply(J[:, 6:18], Jz)
            rhs_intr = rhs_intr - _scatter_cam(ri, onehot_c, b.cam_idx, C)
        rhs_pose = rhs_pose * pose_free
        rhs_intr = rhs_intr * intr_free

        if use_dense:
            x_pose, x_intr = _dense_schur_solve(
                buckets, J_l, Vinv_l, onehots_img, onehots_cam,
                rhs_pose, rhs_intr, lam, pose_free, intr_free, img2cam,
                I, C, max(cg_iters, 64),
            )
            return _finish_step(
                quat, trans, intr, pts_list, lam, cost, it, done,
                x_pose, x_intr, J_l, Vinv_l, g_pt_l,
            )

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
            ud = jnp.stack([Jc[0, k] ** 2 + Jc[1, k] ** 2 for k in range(6)])
            U_diag_pose = U_diag_pose + _scatter_cam(ud, onehot_i, b.img_idx, I)
            ui = jnp.stack(
                [J[0, 6 + k] ** 2 + J[1, 6 + k] ** 2 for k in range(MAX_PARAMS)]
            )
            U_diag_intr = U_diag_intr + _scatter_cam(ui, onehot_c, b.cam_idx, C)
            # W = Jc^T Jp per obs: [6, 3, T, P] (hand-expanded, see _jt_apply)
            W = jnp.stack(
                [
                    jnp.stack(
                        [Jc[0, k] * Jp[0, a] + Jc[1, k] * Jp[1, a]
                         for a in range(3)]
                    )
                    for k in range(6)
                ]
            )
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
                    Jc[0, i] * Jc[0, j] + Jc[1, i] * Jc[1, j]
                    - (VW[i, 0] * W[j, 0] + VW[i, 1] * W[j, 1]
                       + VW[i, 2] * W[j, 2])
                    for (i, j) in tri
                ]
            )
            S_blocks = S_blocks + _scatter_cam(blocks, onehot_i, b.img_idx, I)

        return _cg_phase(
            quat, trans, intr, pts_list, lam, cost, it, done,
            J_l, Vinv_l, g_pt_l, rhs_pose, rhs_intr,
            U_diag_pose, U_diag_intr, S_blocks,
        )

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
    cg_iters, max_iterations, img2cam=None,
):
    return _lm_solve_bucketed(
        buckets, quat0, trans0, intr0, pose_free, intr_free,
        num_images, num_cameras, model_id, loss_type, loss_scale,
        cg_iters, max_iterations, img2cam=img2cam,
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

    # image -> camera map (for dense-Schur pose-intrinsics cross blocks);
    # dense path is disabled under a mesh (it materializes replicated [D, D])
    img2cam = None
    if mesh is None:
        img2cam = np.zeros(I_pad, np.int32)
        valid = np.asarray(problem.obs_mask) > 0
        img2cam[np.asarray(problem.obs_image_idx)[valid]] = np.asarray(
            problem.obs_camera_idx
        )[valid]

    quat, trans, intr, pts_list, cost0, cost, it = _solve_bucketed_jit(
        buckets,
        cam_quat, cam_trans, intrinsics,
        pose_free, intr_free,
        I_pad, C_pad, problem.model_id,
        int(options.loss_function_type),
        jnp.float32(options.loss_function_scale),
        cg_iters, int(options.max_num_iterations),
        img2cam=img2cam,
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
