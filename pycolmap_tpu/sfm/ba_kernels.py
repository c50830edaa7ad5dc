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
from pycolmap_tpu.ops.camera_models import MAX_PARAMS, solver_num_params
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


def bucketize(problem: BundleProblem, col_range=None):
    """Host-side: flat obs -> per-track-length buckets (numpy).

    col_range: optional (process_index, process_count) — fill only this
    process's contiguous share of each bucket's point columns (VERDICT r4
    missing #4: per-host problem slice). The returned buckets' big [.., P]
    planes are [.., P/nproc]-sized; the small per-bucket metadata
    (point_rows, point_free over the FULL width) is returned in full so
    every host can write back the gathered result. Host RSS for bucket
    planes then scales O(1/processes); the flat problem arrays themselves
    remain O(M) (slicing those is the hierarchical mapper's partition job).
    """
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

    # Emit only buckets up to the one covering the longest track: the
    # solver's XLA program inlines every bucket (and, on the Pallas path,
    # compiles kernels per bucket shape), so trailing always-empty buckets
    # cost compile time and launches for nothing. The bucket COUNT is part
    # of the jit signature, but it only steps when the max track length
    # crosses a bucket boundary — a monotone, <=5-step ladder — while
    # presence combinations below the max stay constant (empty buckets
    # within the prefix are still emitted at minimal size).
    max_len = int(lens.max()) if len(lens) else 1
    n_buckets = next(
        (k + 1 for k, T in enumerate(_BUCKET_TS) if max_len <= T),
        len(_BUCKET_TS),
    )
    buckets = []
    for T in _BUCKET_TS[:n_buckets]:
        lo = 0 if T == _BUCKET_TS[0] else _BUCKET_TS[_BUCKET_TS.index(T) - 1]
        if T == _BUCKET_TS[n_buckets - 1]:
            sel = np.nonzero(lens > lo)[0]  # includes over-long tracks
        else:
            sel = np.nonzero((lens > lo) & (lens <= T))[0]
        Pb = _pad_4x(len(sel), 128)
        n_sel = len(sel)
        if col_range is not None:
            pid, nproc = col_range
            if Pb % nproc != 0:
                raise ValueError(
                    f"bucket width {Pb} not divisible by {nproc} processes"
                )
            width = Pb // nproc
            c_lo = pid * width
            sel = sel[c_lo : min(c_lo + width, n_sel)]
            n_sel = len(sel)
        else:
            width = Pb
        # vectorized fill: flat source index per (t, k) grid slot
        flat_pos = starts[sel][None, :] + np.arange(T)[:, None]  # [T, n_sel]
        in_track = flat_pos < ends[sel][None, :]  # over-long tracks truncate
        flat_safe = np.where(in_track, flat_pos, 0)
        img_idx = np.zeros((T, width), dtype=np.int32)
        cam_idx = np.zeros((T, width), dtype=np.int32)
        xy = np.zeros((2, T, width), dtype=np.float32)
        mask = np.zeros((T, width), dtype=np.float32)
        pts = np.zeros((3, width), dtype=np.float32)
        pfree = np.zeros(width, dtype=np.float32)
        rows = np.zeros(width, dtype=np.int32)
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


def bucket_meta(problem: BundleProblem):
    """Selection metadata only (no [T, P] planes): per bucket, the FULL
    (point_rows, padded width). O(M) ints of temporary memory — what every
    host needs for result write-back while holding only its local bucket
    slice (see bucketize(col_range=...))."""
    obs_pt = np.asarray(problem.obs_point_idx)
    obs_mask = np.asarray(problem.obs_mask)
    P = np.asarray(problem.points).shape[0]
    valid = obs_mask > 0
    v_pt = np.sort(obs_pt[valid], kind="stable")
    starts = np.searchsorted(v_pt, np.arange(P))
    ends = np.searchsorted(v_pt, np.arange(P) + 1)
    lens = ends - starts
    max_len = int(lens.max()) if len(lens) else 1
    n_buckets = next(
        (k + 1 for k, T in enumerate(_BUCKET_TS) if max_len <= T),
        len(_BUCKET_TS),
    )
    out = []
    for T in _BUCKET_TS[:n_buckets]:
        lo = 0 if T == _BUCKET_TS[0] else _BUCKET_TS[_BUCKET_TS.index(T) - 1]
        if T == _BUCKET_TS[n_buckets - 1]:
            sel = np.nonzero(lens > lo)[0]
        else:
            sel = np.nonzero((lens > lo) & (lens <= T))[0]
        Pb = _pad_4x(len(sel), 128)
        rows = np.zeros(Pb, dtype=np.int32)
        rows[: len(sel)] = sel
        sel_mask = np.arange(Pb) < len(sel)
        out.append((rows, sel_mask, Pb, T))
    return out


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


def _residual_vals(model_id, xy, mask, q, t, k, X):
    """Masked reprojection residual from per-obs parameters (no deltas).

    Shared core of the XLA path and the Pallas fused kernels
    (cg_kernel.resjac/cost/finish) so behind-camera and mask semantics stay
    identical across paths."""
    px, py, z = bm.project_cf(model_id, k, q, t, X)
    rx = (px - xy[0]) * mask
    ry = (py - xy[1]) * mask
    behind = (z <= 1e-8) & (mask > 0)
    rx = jnp.where(behind, 1e3, rx)
    ry = jnp.where(behind, 1e3, ry)
    return rx, ry


def _bucket_residual(model_id, bucket, q_obs, t_obs, k_obs, d_pose, d_intr, d_pt):
    """Residual at tangent deltas given pre-gathered per-obs parameters.

    k_obs/d_intr may be NP-length (the model's actual parameter count) or
    MAX_PARAMS-length — the camera models only read indices < NP."""
    q = bm.quat_boxplus_cf(q_obs, (d_pose[0], d_pose[1], d_pose[2]))
    t = (t_obs[0] + d_pose[3], t_obs[1] + d_pose[4], t_obs[2] + d_pose[5])
    n = min(len(k_obs), d_intr.shape[0] if hasattr(d_intr, "shape")
            else len(d_intr))
    k = tuple(k_obs[i] + d_intr[i] for i in range(n))
    X = (
        bucket.points[0][None, :] + d_pt[0],
        bucket.points[1][None, :] + d_pt[1],
        bucket.points[2][None, :] + d_pt[2],
    )
    return _residual_vals(model_id, bucket.xy, bucket.mask, q, t, k, X)


def _bucket_res_and_jac(model_id, bucket, q_obs, t_obs, k_obs, intr_free_obs):
    """Residual [2, T, P] + analytic Jacobian [2, 9+NP, T, P].

    NP = the model's ACTUAL parameter count (len(k_obs)) — padding the
    intrinsics block to MAX_PARAMS would add all-zero Jacobian planes that
    every downstream stage (Schur prepare, CG matvecs, back-substitution)
    streams from HBM; for SIMPLE_RADIAL that is 8/21 of J's bytes.

    Column order matches the tangent layout of :func:`_bucket_residual`:
    [rot(3), trans(3), intrinsics(NP), point(3)]. The chain rule is
    assembled in closed form — rotation columns via -[RX]x, point columns
    via B R, projection via the 2x3 perspective Jacobian — with only the
    2-D distortion linearized by jvp (2 passes for d(dist)/d(u,v) plus one
    per ACTUAL extra parameter of the model). Replaces 21 full-chain jvps;
    cross-checked against :func:`_bucket_res_and_jac_jvp` in tests.

    model_id may be a tuple (mixed-model bundle): each model's residual and
    Jacobian are computed by this same analytic path and where-selected per
    observation via the selector plane k_obs[mixed_sel_index(models)]. All
    variants emit len(intr_free_obs) intrinsic columns (the mixed solver
    width), so J shapes agree across models; columns beyond a model's own
    parameter count are exact zeros.
    """
    from pycolmap_tpu.ops.camera_models import (
        CAMERA_MODEL_BY_ID,
        mixed_sel_index,
    )

    if isinstance(model_id, tuple):
        sel = k_obs[mixed_sel_index(model_id)]
        res_out = None
        J_out = None
        for m in model_id:
            res_m, J_m = _bucket_res_and_jac(
                m, bucket, q_obs, t_obs, k_obs, intr_free_obs
            )
            c = sel == m
            res_out = (
                res_m if res_out is None else jnp.where(c[None], res_m, res_out)
            )
            J_out = (
                J_m if J_out is None else jnp.where(c[None, None], J_m, J_out)
            )
        return res_out, J_out

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

    NP = info.num_params
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
    # intrinsics: one column per SOLVER intrinsic plane (== NP for a
    # single-model bundle; the mixed solver width otherwise, with exact-zero
    # columns beyond this model's own count)
    for j in range(len(intr_free_obs)):
        if j >= NP:
            cols.append(jnp.stack([zeros, zeros]))
            continue
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
                ones if i == j else zeros for i in range(len(k_obs))
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
    J = jnp.stack(cols, axis=1)  # [2, 9+NP, T, P]
    return res, J


def _bucket_res_and_jac_jvp(model_id, bucket, q_obs, t_obs, k_obs, intr_free_obs):
    """Residual [2, T, P] + Jacobian [2, 9+NP, T, P] via 9+NP jvps.

    Reference implementation for the analytic fast path above (cross-checked
    in tests). Parameters are pre-gathered per observation, so the jvp
    passes linearize a purely elementwise chain (gathers are jvp constants).
    intr_free_obs masks the intr columns so fixed intrinsics get
    exactly-zero Jacobians.
    """
    NP = len(intr_free_obs)  # solver intrinsic width (handles mixed tuples)
    T, P = bucket.mask.shape
    zeros = jnp.zeros((6, T, P), dtype=jnp.float32)
    zeros_i = jnp.zeros((NP, T, P), dtype=jnp.float32)
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
    for k in range(NP):
        tangent = (zeros, zeros_i.at[k].set(1.0), zeros_p)
        _, jc = jax.jvp(f, (zeros, zeros_i, zeros_p), tangent)
        cols.append(jc * intr_free_obs[k][None])
    for k in range(3):
        tangent = (zeros, zeros_i, zeros_p.at[k].set(1.0))
        _, jc = jax.jvp(f, (zeros, zeros_i, zeros_p), tangent)
        cols.append(jc * bucket.point_free[None, None, :])
    J = jnp.stack(cols, axis=1)  # [2, 9+NP, T, P]
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
    lam, pose_free, intr_free, img2cam, I, C, NP, cg_iters,
    eta=None,
):
    if eta is None:  # no jnp defaults: they init the backend at import
        eta = jnp.float32(0.1)
    """Materialize the reduced camera system S = U + damp - W Vinv W^T as a
    dense [D, D] matrix (D = 6*I + NP*C, NP = model param count) and solve S x = rhs by PCG.

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
    D = 6 * I + NP * C
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
    U_pi = jnp.zeros((I, 6 * NP))
    U_ii = jnp.zeros((C, NP, NP))
    for b, J, Vinv, oi, oc in zip(buckets, J_l, Vinv_l, onehots_img, onehots_cam):
        T, P = b.mask.shape
        Jc = J[:, :6]
        Ji = J[:, 6:6 + NP]
        Jp = J[:, 6 + NP:9 + NP]
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
            for k in range(6 + NP)
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
                    for k in range(NP)
                ]
            )[None]  # [1, 12, 3, P]
        else:
            oc3 = oc.reshape(C, T, P)
            Zi = sum(
                oc3[:, t, None, None, :]
                * jnp.stack(
                    [jnp.stack([W[6 + k][a][t] for a in range(3)])
                     for k in range(NP)]
                )[None]
                for t in range(T)
            )  # [C, 12, 3, P]
        Zf = jnp.concatenate(
            [Zp.reshape(6 * I, 3 * P), Zi.reshape(NP * C, 3 * P)]
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
             for k in range(6) for l in range(NP)]
        )
        U_pi = U_pi + _scatter_cam(upi, oi, b.img_idx, I)
        # intr-intr via one well-shaped [24, M] x [M, 24] self-matmul
        Jif = Ji.reshape(2 * NP, T * P)
        uii_rr = jax.lax.dot_general(
            Jif, Jif, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hi,
        ).reshape(2, NP, 2, NP)
        uii_full = uii_rr[0, :, 0, :] + uii_rr[1, :, 1, :]
        if C == 1:
            U_ii = U_ii + uii_full[None]
        else:
            uii = jnp.stack(
                [Ji[0, k] * Ji[0, l] + Ji[1, k] * Ji[1, l]
                 for k in range(NP) for l in range(NP)]
            )
            U_ii = U_ii + _scatter_cam(uii, oc, b.cam_idx, C).reshape(
                C, NP, NP
            )

    U_pp = U_pp.reshape(I, 6, 6)
    U_pi = U_pi.reshape(I, 6, NP)
    U_ii = U_ii.reshape(C, NP, NP)
    damp_pose = lam * jnp.maximum(jnp.diagonal(U_pp, axis1=1, axis2=2), 1e-6)
    damp_intr = lam * jnp.maximum(jnp.diagonal(U_ii, axis1=1, axis2=2), 1e-6)
    U_pp = U_pp + jax.vmap(jnp.diag)(damp_pose)
    U_ii = U_ii + jax.vmap(jnp.diag)(damp_intr)

    # scatter U blocks into the dense system
    arI = jnp.arange(I)
    ar6 = jnp.arange(6)
    arK = jnp.arange(NP)
    rows_p = 6 * arI[:, None, None] + ar6[None, :, None]  # [I, 6, 1]
    cols_p = 6 * arI[:, None, None] + ar6[None, None, :]  # [I, 1, 6]
    S = S.at[rows_p, cols_p].add(U_pp)
    cols_i = 6 * I + NP * img2cam[:, None, None] + arK[None, None, :]
    S = S.at[rows_p, cols_i].add(U_pi)
    S = S.at[cols_i.transpose(0, 2, 1), cols_p].add(U_pi.transpose(0, 2, 1))
    arC = jnp.arange(C)
    rows_c = 6 * I + NP * arC[:, None, None] + arK[None, :, None]
    cols_c = 6 * I + NP * arC[:, None, None] + arK[None, None, :]
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

    def cg_body(carry):
        x, r, p, rz, it = carry
        Ap = matvec(p)
        pAp = jnp.dot(p, Ap)
        alpha = rz / jnp.where(jnp.abs(pAp) < 1e-20, 1e-20, pAp)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.dot(r, z)
        beta = rz_new / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
        p = z + beta * p
        return (x, r, p, rz_new, it + 1)

    z0 = precond(rhs)
    rz0 = jnp.dot(rhs, z0)

    def cg_cond(carry):
        *_, rz, it = carry
        return jnp.logical_and(it < cg_iters, rz > eta * eta * rz0)

    (x, *_) = jax.lax.while_loop(
        cg_cond, cg_body,
        (jnp.zeros_like(rhs), rhs, z0, rz0, jnp.int32(0)),
    )
    x_pose = x[: 6 * I].reshape(I, 6) * pose_free
    x_intr = x[6 * I:].reshape(C, NP) * intr_free
    return x_pose, x_intr


# ---------------------------------------------------------------------------
# the solver
# ---------------------------------------------------------------------------


def _env_knobs():
    """Solver behavior knobs (Pallas on/off, bucket router threshold, bf16 CG
    packing, dense-Schur cutoff), read from env at SOLVER-ENTRY (host) time
    and threaded through the jit as a static argument. Reading os.environ
    inside the traced function freezes the first-seen value into the compiled
    executable (the jit cache keys only on shapes/statics), so flipping a
    knob mid-process would silently have no effect on compiled signatures."""
    from pycolmap_tpu.sfm import cg_kernel as _ck

    d = os.environ.get("PYCOLMAP_TPU_DENSE_SCHUR_MAX_D")
    return (
        _ck.matvec_enabled(),
        int(os.environ.get("PYCOLMAP_TPU_BA_PALLAS_MIN_SLOTS", 65536)),
        os.environ.get("PYCOLMAP_TPU_BA_CG_BF16", "1") != "0",
        None if d is None else int(d),
        os.environ.get("PYCOLMAP_TPU_BA_ADAPTIVE_CG", "1") != "0",
    )


def _lm_solve_bucketed(
    buckets, quat0, trans0, intr0, pose_free, intr_free, num_images,
    num_cameras, model_id, loss_type, loss_scale, cg_iters, max_iterations,
    img2cam=None, knobs=None, eta=None, cam_mesh=None,
):
    from pycolmap_tpu.sfm import cg_kernel as _ck

    if knobs is None:  # direct/profiling callers: resolve at trace time
        knobs = _env_knobs()
    if eta is None:
        eta = jnp.float32(0.1)
    if len(knobs) == 4:  # older callers without the adaptive-CG element
        knobs = knobs + (True,)
    use_pallas_knob, min_slots, use_cg_bf16, dense_env, adaptive_cg = knobs
    I, C = num_images, num_cameras
    # NP-narrow intrinsics: the solver's loop state, gathers, Jacobians and
    # camera-side reductions all use the model's ACTUAL parameter count
    # (MAX_PARAMS-wide J wastes up to 8/21 of its HBM traffic on all-zero
    # planes). The [C, MAX_PARAMS] public width is restored by the caller.
    NP = solver_num_params(model_id)
    nk = 6 + NP
    intr0 = intr0[:, :NP]
    intr_free = intr_free[:, :NP]
    use_onehot = I <= _ONEHOT_MAX_SEGMENTS
    use_pallas = use_pallas_knob
    # camera-block sharding (SURVEY §2c P4 level 2, VERDICT r4 missing #3):
    # when cam_mesh is set, the camera-side CG state ([I, 6] vectors and
    # [I, 6, 6] preconditioner blocks) is ROW-SHARDED over the mesh via
    # sharding constraints — per-device camera memory O(I/D); GSPMD inserts
    # the I*6*4-byte all_gather of x at the per-observation contraction and
    # psums for the reduced-system partials. Pallas kernels have no SPMD
    # partitioning rules, so camera sharding forces the XLA path.
    if cam_mesh is not None:
        use_pallas = False

    def _rowshard(x):
        if cam_mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        ax = cam_mesh.axis_names[0]
        spec = P(*([ax] + [None] * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(cam_mesh, spec)
        )
    # Per-bucket engine choice: the fused Pallas kernels (res+jac, prepare,
    # matvec, backsub+cost) win on big buckets, but every fresh (T, P)
    # kernel shape costs a minutes-scale Mosaic remote compile — and the
    # mapper's local-BA signatures are legion. Small buckets therefore run
    # the XLA one-hot path (cheap at their size, XLA compiles are ~seconds).
    pallas_b = [
        use_pallas and (b.mask.shape[0] * b.mask.shape[1] >= min_slots)
        for b in buckets
    ]
    pal = [i for i, f in enumerate(pallas_b) if f]
    xla = [i for i, f in enumerate(pallas_b) if not f]
    nb = len(buckets)
    any_pallas = bool(pal)
    # with the fused Pallas CG kernels the implicit path beats the dense
    # build well before D = 2048 (measured 24.3 vs 10.7 LM iters/s at
    # C3 scale, D = 780); keep dense only for small local-BA windows
    dense_default = 512 if any_pallas else _DENSE_SCHUR_MAX_D
    dense_max_d = dense_env if dense_env is not None else dense_default
    use_dense = (
        img2cam is not None
        and use_onehot
        and (6 * I + NP * C) <= dense_max_d
    )

    # Transposed one-hots serve both the matmul-gathers (full f32 value
    # precision) and the matmul-scatters, for XLA-path buckets and the
    # dense-Schur solve (which consumes every bucket).
    onehots_img = []
    onehots_cam = []
    for i, b in enumerate(buckets):
        if use_onehot and (not pallas_b[i] or use_dense):
            onehots_img.append(_make_onehot_t(b.img_idx, I))
            onehots_cam.append(_make_onehot_t(b.cam_idx, C))
        else:
            onehots_img.append(None)
            onehots_cam.append(None)

    # per-bucket per-obs intr-free masks for XLA-path buckets (the fused
    # Pallas res+jac kernel gathers them in-kernel from the camera table)
    intr_free_obs_l = []
    for i, b in enumerate(buckets):
        if pallas_b[i]:
            intr_free_obs_l.append(None)
        elif onehots_cam[i] is not None:
            intr_free_obs_l.append(
                tuple(_gather_mm(intr_free, onehots_cam[i], b.mask.shape))
            )
        else:
            intr_free_obs_l.append(_gather_table(intr_free, b.cam_idx))

    def _xla_bucket_cost(i, b2, quat, trans, intr):
        T, P = b2.mask.shape
        q_obs, t_obs, k_obs = _gather_obs_params(
            b2, quat, trans, intr, onehots_img[i], onehots_cam[i]
        )
        rx, ry = _bucket_residual(
            model_id, b2, q_obs, t_obs, k_obs,
            jnp.zeros((6, T, P)), jnp.zeros((NP, T, P)),
            jnp.zeros((3, T, P)),
        )
        sq = rx * rx + ry * ry
        return jnp.sum(_robust_cost(sq, loss_type, loss_scale) * b2.mask)

    def total_cost(quat, trans, intr, pts_list):
        cost = jnp.float32(0.0)
        if pal:
            cost = cost + _ck.total_cost(
                [buckets[i] for i in pal], [pts_list[i] for i in pal],
                quat, trans, intr, model_id, loss_type, loss_scale,
            )
        for i in xla:
            b2 = buckets[i]._replace(points=pts_list[i])
            cost = cost + _xla_bucket_cost(i, b2, quat, trans, intr)
        return cost

    def _finish_step(
        quat, trans, intr, pts_list, lam, cost, it, done,
        x_pose, x_intr, J_l, Vinv_l, g_pt_l,
    ):
        # --- apply camera updates (tiny [I, k] ops) ----------------------
        wq, xq, yq, zq = quat[:, 0], quat[:, 1], quat[:, 2], quat[:, 3]
        nq = bm.quat_boxplus_cf(
            (wq, xq, yq, zq), (-x_pose[:, 0], -x_pose[:, 1], -x_pose[:, 2])
        )
        new_quat = jnp.stack(nq, axis=1)
        new_trans = trans - x_pose[:, 3:6]
        new_intr = intr - x_intr

        # --- back-substitute points + cost at the updated parameters ------
        new_pts_list = [None] * nb
        new_cost = jnp.float32(0.0)
        if pal:
            sub_pts, cost_p = _ck.backsub_and_cost(
                [buckets[i] for i in pal], [pts_list[i] for i in pal],
                [J_l[i] for i in pal], [Vinv_l[i] for i in pal],
                [g_pt_l[i] for i in pal], x_pose, x_intr,
                new_quat, new_trans, new_intr, model_id, loss_type,
                loss_scale,
            )
            for k, i in enumerate(pal):
                new_pts_list[i] = sub_pts[k]
            new_cost = new_cost + cost_p
        for i in xla:
            b = buckets[i]
            J, Vinv, g_pt = J_l[i], Vinv_l[i], g_pt_l[i]
            if onehots_img[i] is not None:
                xp = _gather_mm(x_pose, onehots_img[i], b.mask.shape)
                xi = _gather_mm(x_intr, onehots_cam[i], b.mask.shape)
            else:
                xp = _gather_table(x_pose, b.img_idx)
                xi = _gather_table(x_intr, b.cam_idx)
            a_obs = sum(J[:, k] * xp[k][None] for k in range(6)) + sum(
                J[:, 6 + k] * xi[k][None] for k in range(NP)
            )
            bt = _jt_apply_sum_t(J[:, nk:nk + 3], a_obs)
            dp = jnp.stack(
                _sym3_apply(
                    Vinv,
                    (g_pt[0] - bt[0], g_pt[1] - bt[1], g_pt[2] - bt[2]),
                )
            )
            new_pts_list[i] = pts_list[i] - dp * b.point_free[None]
            b2 = b._replace(points=new_pts_list[i])
            new_cost = new_cost + _xla_bucket_cost(
                i, b2, new_quat, new_trans, new_intr
            )

        # --- accept/reject ------------------------------------------------
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
        # a step whose ATTEMPTED cost matches the current cost to <1e-7
        # relative signals convergence even when rejected: re-solves on
        # already-converged problems (the mapper's 2nd refinement rounds)
        # otherwise burn ~24 iterations walking lambda from 1e-4 to the
        # 1e10 bail-out (measured it=24-26 per 2nd round, r5)
        att_rel = jnp.abs(new_cost - cost) / jnp.maximum(cost, 1e-20)
        done = jnp.logical_or(done, att_rel < 1e-7)
        done = jnp.logical_or(done, lam > 1e10)
        return quat, trans, intr, pts_out, lam, cost_out, it + 1, done

    def _cg_phase(quat, trans, intr, pts_list, lam, cost, it, done,
                  J_l, Vinv_l, g_pt_l, rhs_pose, rhs_intr,
                  U_diag_pose, U_diag_intr, S_blocks):
        """SCHUR_JACOBI preconditioner + implicit-matvec PCG + step."""
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
        P_inv = _rowshard(jnp.linalg.inv(S_full + 1e-6 * jnp.eye(6)))

        def precond(r_pose, r_intr):
            p_pose = _rowshard(
                jnp.einsum("iab,ib->ia", P_inv, _rowshard(r_pose))
                * pose_free
            )
            denom = U_diag_intr + damp_intr
            p_intr = r_intr / jnp.where(denom < 1e-8, 1.0, denom)
            return p_pose, p_intr * intr_free

        # bf16-packed J for the Pallas CG matvecs: [nj, 2T, P] bf16 tiles
        # (residual rows packed into sublanes) halve the J stream that the
        # CG loop re-reads cg_iters times; one transpose+cast per LM step.
        # PYCOLMAP_TPU_BA_CG_BF16=0 keeps full-f32 matvecs (via knobs).
        if pal and use_cg_bf16:
            J16_pal = [_ck.pack_j_bf16(J_l[i]) for i in pal]

        def matvec(x_pose, x_intr):
            out_pose = damp_pose * x_pose
            out_intr = damp_intr * x_intr
            if pal and use_cg_bf16:
                from pycolmap_tpu.sfm.cg_kernel import (
                    _LANES, _round_up, cg_matvec16_bucket,
                    interpret_default,
                )

                interp = interpret_default()
                single_cam = C == 1
                Ip = _round_up(I, _LANES)
                Cp = _round_up(C, _LANES)
                xp_t = jnp.zeros((8, Ip)).at[:6, :I].set(x_pose.T)
                mp8 = _round_up(NP, 8)
                xi_t = jnp.zeros((mp8, Cp)).at[:NP, :C].set(x_intr.T)
                mp = jnp.zeros((I, 6))
                mi = jnp.zeros((C, NP))
                for k, i in enumerate(pal):
                    op_t, oi_t = cg_matvec16_bucket(
                        J16_pal[k],
                        buckets[i].img_idx, buckets[i].cam_idx,
                        Vinv_l[i], xp_t, xi_t, single_cam=single_cam,
                        interpret=interp,
                    )
                    mp = mp + op_t[:6, :I].T
                    if single_cam:
                        mi = mi + jnp.sum(oi_t[:NP], axis=1).reshape(1, NP)
                    else:
                        mi = mi + oi_t[:NP, :C].T
                out_pose = out_pose + mp
                out_intr = out_intr + mi
            elif pal:
                # fused Pallas matvec: streams J once, no HBM one-hots
                mp, mi = _ck.schur_matvec(
                    [buckets[i] for i in pal], [J_l[i] for i in pal],
                    [Vinv_l[i] for i in pal], x_pose, x_intr, I, C,
                )
                out_pose = out_pose + mp
                out_intr = out_intr + mi
            for i in xla:
                b, J16, Vinv = buckets[i], J_l[i], Vinv_l[i]
                if onehots_img[i] is not None:
                    xp = _gather_mm(x_pose, onehots_img[i], b.mask.shape)
                    xi = _gather_mm(x_intr, onehots_cam[i], b.mask.shape)
                else:
                    xp = jnp.stack(_gather_table(x_pose, b.img_idx))
                    xi = jnp.stack(_gather_table(x_intr, b.cam_idx))
                xc = jnp.concatenate([xp, xi])  # [nk, T, P]
                a_obs = sum(
                    J16[:, k] * xc[k][None] for k in range(nk)
                )  # [2, T, P]
                y_p = _jt_apply_sum_t(J16[:, nk:nk + 3], a_obs)
                z_p = jnp.stack(_sym3_apply(Vinv, (y_p[0], y_p[1], y_p[2])))
                d = a_obs - _j_apply_pt(J16[:, nk:nk + 3], z_p)
                op = _jt_apply(J16[:, :6], d)
                out_pose = out_pose + _scatter_cam(
                    op, onehots_img[i], b.img_idx, I
                )
                oi = _jt_apply(J16[:, 6:nk], d)
                out_intr = out_intr + _scatter_cam(
                    oi, onehots_cam[i], b.cam_idx, C
                )
            return out_pose * pose_free, out_intr * intr_free

        # --- PCG with forcing sequence ------------------------------------
        # (inexact Newton, Ceres Solver::Options::eta): stop when the
        # preconditioned residual norm-squared r.z drops below eta^2 x its
        # initial value; cg_iters is the cap. Early LM iterations (large
        # lambda, fast-converging inner systems) typically stop in a few
        # matvecs instead of burning the full budget.
        def cg_body(carry):
            x_pose, x_intr, r_pose, r_intr, p_pose, p_intr, rz, it = carry
            Ap_pose, Ap_intr = matvec(p_pose, p_intr)
            Ap_pose = _rowshard(Ap_pose)
            pAp = jnp.sum(p_pose * Ap_pose) + jnp.sum(p_intr * Ap_intr)
            alpha = rz / jnp.where(jnp.abs(pAp) < 1e-20, 1e-20, pAp)
            x_pose = _rowshard(x_pose + alpha * p_pose)
            x_intr = x_intr + alpha * p_intr
            r_pose = _rowshard(r_pose - alpha * Ap_pose)
            r_intr = r_intr - alpha * Ap_intr
            z_pose, z_intr = precond(r_pose, r_intr)
            rz_new = jnp.sum(r_pose * z_pose) + jnp.sum(r_intr * z_intr)
            beta = rz_new / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
            p_pose = z_pose + beta * p_pose
            p_intr = z_intr + beta * p_intr
            return (x_pose, x_intr, r_pose, r_intr, p_pose, p_intr, rz_new,
                    it + 1)

        z_pose, z_intr = precond(rhs_pose, rhs_intr)
        rz0 = jnp.sum(rhs_pose * z_pose) + jnp.sum(rhs_intr * z_intr)
        cg_init = (jnp.zeros_like(rhs_pose), jnp.zeros_like(rhs_intr),
                   rhs_pose, rhs_intr, z_pose, z_intr, rz0, jnp.int32(0))
        if adaptive_cg:
            def cg_cond(carry):
                *_, rz, it = carry
                return jnp.logical_and(it < cg_iters, rz > eta * eta * rz0)

            (x_pose, x_intr, *_) = jax.lax.while_loop(
                cg_cond, cg_body, cg_init
            )
        else:  # fixed trip count (PYCOLMAP_TPU_BA_ADAPTIVE_CG=0): scan
            (x_pose, x_intr, *_), _ = jax.lax.scan(
                lambda c, _: (cg_body(c), None), cg_init, None,
                length=cg_iters,
            )
        return _finish_step(
            quat, trans, intr, pts_list, lam, cost, it, done,
            x_pose, x_intr, J_l, Vinv_l, g_pt_l,
        )

    def lm_step(state):
        quat, trans, intr, pts_list, lam, cost, it, done = state

        # --- per-bucket residuals, Jacobians, robust weights -------------
        res_l = [None] * nb
        J_l = [None] * nb
        if pal:
            # fused Pallas res+jac: in-kernel parameter gathers + analytic
            # Jacobian chain + IRLS weighting; J written once from registers
            sub_res, sub_J = _ck.res_and_jac(
                [buckets[i] for i in pal], [pts_list[i] for i in pal],
                quat, trans, intr, intr_free,
                model_id, loss_type, loss_scale,
            )
            for k, i in enumerate(pal):
                res_l[i] = sub_res[k]
                J_l[i] = sub_J[k]
        for i in xla:
            b2 = buckets[i]._replace(points=pts_list[i])
            q_obs, t_obs, k_obs = _gather_obs_params(
                b2, quat, trans, intr, onehots_img[i], onehots_cam[i]
            )
            res, J = _bucket_res_and_jac(
                model_id, b2, q_obs, t_obs, k_obs, intr_free_obs_l[i]
            )
            sq = res[0] ** 2 + res[1] ** 2
            w = _robust_weight(sq, loss_type, loss_scale) * b2.mask
            sw = jnp.sqrt(w)
            res_l[i] = res * sw[None]
            J_l[i] = J * sw[None, None]

        # --- LM preparation: V inverses, gradients, reduced RHS, damping
        # diagonals, SCHUR_JACOBI blocks ----------------------------------
        Vinv_l = [None] * nb
        g_pt_l = [None] * nb
        rhs_pose = jnp.zeros((I, 6))
        rhs_intr = jnp.zeros((C, NP))
        U_diag_pose = jnp.zeros((I, 6))
        U_diag_intr = jnp.zeros((C, NP))
        S_blocks = jnp.zeros((I, 21))  # packed sym 6x6 (21 entries)
        tri = [(i, j) for i in range(6) for j in range(i, 6)]
        if pal:
            # fused Pallas preparation: one pass over J per bucket
            (sub_V, sub_g, rp, ri, udp, udi, sb) = _ck.schur_prepare(
                [buckets[i] for i in pal], [J_l[i] for i in pal],
                [res_l[i] for i in pal], lam, I, C,
            )
            for k, i in enumerate(pal):
                Vinv_l[i] = sub_V[k]
                g_pt_l[i] = sub_g[k]
            rhs_pose = rhs_pose + rp
            rhs_intr = rhs_intr + ri
            U_diag_pose = U_diag_pose + udp
            U_diag_intr = U_diag_intr + udi
            S_blocks = S_blocks + sb
        for i in xla:
            b, J, res = buckets[i], J_l[i], res_l[i]
            oi_h, oc_h = onehots_img[i], onehots_cam[i]
            Jc = J[:, :6]
            Jp = J[:, nk:nk + 3]
            # point blocks V (packed sym) + damped inverse
            pairs = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
            V = jnp.stack(
                [jnp.sum(Jp[:, a] * Jp[:, bidx], axis=(0, 1))
                 for a, bidx in pairs]
            )  # [6, P]
            damp = lam * jnp.maximum(jnp.stack([V[0], V[3], V[5]]), 1e-6)
            V = V.at[0].add(damp[0]).at[3].add(damp[1]).at[5].add(damp[2])
            Vinv = _inv3x3_planes(V)
            Vinv_l[i] = Vinv
            # gradients
            gp = _jt_apply(Jc, res)
            rhs_pose = rhs_pose + _scatter_cam(gp, oi_h, b.img_idx, I)
            gi = _jt_apply(J[:, 6:nk], res)
            rhs_intr = rhs_intr + _scatter_cam(gi, oc_h, b.cam_idx, C)
            g_pt = _jt_apply_sum_t(Jp, res)
            g_pt_l[i] = g_pt
            # reduced RHS: g_c - B C^-1 g_p
            z0 = jnp.stack(_sym3_apply(Vinv, (g_pt[0], g_pt[1], g_pt[2])))
            Jz = _j_apply_pt(Jp, z0)
            rp2 = _jt_apply(Jc, Jz)
            rhs_pose = rhs_pose - _scatter_cam(rp2, oi_h, b.img_idx, I)
            ri2 = _jt_apply(J[:, 6:nk], Jz)
            rhs_intr = rhs_intr - _scatter_cam(ri2, oc_h, b.cam_idx, C)
            # damping diagonals
            ud = jnp.stack([Jc[0, k] ** 2 + Jc[1, k] ** 2 for k in range(6)])
            U_diag_pose = U_diag_pose + _scatter_cam(ud, oi_h, b.img_idx, I)
            ui = jnp.stack(
                [J[0, 6 + k] ** 2 + J[1, 6 + k] ** 2 for k in range(NP)]
            )
            U_diag_intr = U_diag_intr + _scatter_cam(ui, oc_h, b.cam_idx, C)
            # SCHUR_JACOBI blocks
            W = jnp.stack(
                [
                    jnp.stack(
                        [Jc[0, k] * Jp[0, a] + Jc[1, k] * Jp[1, a]
                         for a in range(3)]
                    )
                    for k in range(6)
                ]
            )
            a_, bb, c_, d_, e_, f_ = Vinv
            VW = jnp.stack(
                [
                    a_[None] * W[:, 0] + bb[None] * W[:, 1]
                    + c_[None] * W[:, 2],
                    bb[None] * W[:, 0] + d_[None] * W[:, 1]
                    + e_[None] * W[:, 2],
                    c_[None] * W[:, 0] + e_[None] * W[:, 1]
                    + f_[None] * W[:, 2],
                ],
                axis=1,
            )  # [6, 3, T, P]
            blocks = jnp.stack(
                [
                    Jc[0, a] * Jc[0, bidx] + Jc[1, a] * Jc[1, bidx]
                    - (VW[a, 0] * W[bidx, 0] + VW[a, 1] * W[bidx, 1]
                       + VW[a, 2] * W[bidx, 2])
                    for (a, bidx) in tri
                ]
            )
            S_blocks = S_blocks + _scatter_cam(blocks, oi_h, b.img_idx, I)

        rhs_pose = rhs_pose * pose_free
        rhs_intr = rhs_intr * intr_free

        if use_dense:
            x_pose, x_intr = _dense_schur_solve(
                buckets, J_l, Vinv_l, onehots_img, onehots_cam,
                rhs_pose, rhs_intr, lam, pose_free, intr_free, img2cam,
                I, C, NP, max(cg_iters, 64), eta=eta,
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
        "max_iterations", "knobs", "cam_mesh",
    ),
)
def _solve_bucketed_jit(
    buckets, quat0, trans0, intr0, pose_free, intr_free,
    num_images, num_cameras, model_id, loss_type, loss_scale,
    cg_iters, max_iterations, img2cam=None, knobs=None, eta=None,
    cam_mesh=None,
):
    return _lm_solve_bucketed(
        buckets, quat0, trans0, intr0, pose_free, intr_free,
        num_images, num_cameras, model_id, loss_type, loss_scale,
        cg_iters, max_iterations, img2cam=img2cam, knobs=knobs, eta=eta,
        cam_mesh=cam_mesh,
    )


# camera-block sharding threshold: below this many (padded) images the
# camera state is small enough that replication beats the all_gather per
# CG iteration; above it, rows shard O(I/D) (VERDICT r4 missing #3)
def _cam_shard_min() -> int:
    return int(os.environ.get("PYCOLMAP_TPU_BA_CAM_SHARD_MIN", 2048))


@partial(
    jax.jit,
    static_argnames=(
        "npts", "num_images", "num_cameras", "model_id", "loss_type",
        "cg_iters", "max_iterations", "knobs",
    ),
)
def _solve_bucketed_packed_jit(
    buckets, pts_all, quat0, trans0, intr0, pose_free, intr_free,
    npts, num_images, num_cameras, model_id, loss_type, loss_scale,
    cg_iters, max_iterations, img2cam=None, knobs=None, eta=None,
):
    """Transfer-packed solver entry: bucket structure arrays arrive
    device-resident (see _bucketize_cached); the parameter-dependent point
    planes arrive as ONE [3, sum(P_b)] array (single H2D through the remote
    tunnel instead of one transfer per bucket), and all results leave as ONE
    flat f32 vector (single D2H; measured 72 ms for the pytree fetch vs
    ~15 ms packed at C3 scale). buckets' own .points fields are stale
    placeholders and ignored."""
    offs = np.cumsum((0,) + npts)
    bl = tuple(
        b._replace(points=pts_all[:, offs[i]:offs[i + 1]])
        for i, b in enumerate(buckets)
    )
    quat, trans, intr, pts_list, cost0, cost, it = _lm_solve_bucketed(
        bl, quat0, trans0, intr0, pose_free, intr_free,
        num_images, num_cameras, model_id, loss_type, loss_scale,
        cg_iters, max_iterations, img2cam=img2cam, knobs=knobs, eta=eta,
    )
    return jnp.concatenate(
        [quat.reshape(-1), trans.reshape(-1), intr.reshape(-1)]
        + [p.reshape(-1) for p in pts_list]
        + [jnp.stack([cost0, cost, it.astype(jnp.float32)])]
    )


def _mesh_is_multiprocess(mesh) -> bool:
    return len({d.process_index for d in mesh.devices.flat}) > 1


def _put_sharded_last_axis(a, mesh):
    """Place `a` on the mesh sharded along its LAST axis.

    Single-process: plain device_put. Multi-process (jax.distributed): each
    process contributes only its local slice via
    jax.make_array_from_process_local_data — the point axis is contiguous
    per process because the 1-D mesh is built over jax.devices() (ordered
    by process)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    axis = mesh.axis_names[0]
    spec = P(*([None] * (a.ndim - 1) + [axis]))
    sharding = NamedSharding(mesh, spec)
    if not _mesh_is_multiprocess(mesh):
        return jax.device_put(a, sharding)
    a = np.asarray(a)
    nproc = jax.process_count()
    pid = jax.process_index()
    n = a.shape[-1]
    # make_array_from_process_local_data splits the local slice across the
    # process's LOCAL devices too, so the real requirement is divisibility
    # by the total device count (a bare assert would vanish under -O)
    if n % mesh.devices.size != 0:
        raise ValueError(
            f"sharded axis of size {n} is not divisible by the mesh's "
            f"{mesh.devices.size} devices ({nproc} processes); pad the "
            "point axis to a multiple of the device count"
        )
    chunk = n // nproc
    local = a[..., pid * chunk:(pid + 1) * chunk]
    return jax.make_array_from_process_local_data(
        sharding, np.ascontiguousarray(local), a.shape
    )


def _put_local_last_axis(local, mesh):
    """Assemble a last-axis-sharded global array from THIS PROCESS's local
    slice only (the per-host problem-slice path: no process ever holds the
    full plane, host or device)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    axis = mesh.axis_names[0]
    spec = P(*([None] * (local.ndim - 1) + [axis]))
    sharding = NamedSharding(mesh, spec)
    full_shape = local.shape[:-1] + (
        local.shape[-1] * jax.process_count(),
    )
    return jax.make_array_from_process_local_data(
        sharding, np.ascontiguousarray(local), full_shape
    )


def _shard_buckets(buckets, mesh):
    """Place bucket arrays on a mesh, sharding the point axis (minor).

    A point and all its observations live in one column, so this is the
    point-aligned partitioning of SURVEY.md §2c P4: per-shard Schur
    elimination; XLA inserts psums for the one-hot camera contractions.
    Works single-process (virtual or real multi-chip) and multi-process
    (jax.distributed; VERDICT r3 missing #3).
    """
    return tuple(
        Bucket(*(_put_sharded_last_axis(np.asarray(arr), mesh)
                 for arr in b))
        for b in buckets
    )


# Structure cache for bucketize: the bucket layout depends only on the
# observation graph (indices, xy, mask, free masks) — not on the point
# positions being optimized. Entries hold the structure arrays
# DEVICE-RESIDENT; only the [3, P] point planes are rebuilt per call.
# Kills the two fixed per-solve costs measured at C3 scale (2026-08-20,
# v5e via tunnel: bucketize 0.3-0.8 s host + ~0.7 s H2D of 24 MB) for
# repeated solves on the same graph (bench reps; mapper re-BA rounds).
_BUCKET_CACHE_MAX = 8
_bucket_cache: "dict[tuple, tuple]" = {}


def _bucketize_cached(problem: BundleProblem, mesh):
    import hashlib

    h = hashlib.blake2b(digest_size=16)
    for a in (
        problem.obs_point_idx, problem.obs_image_idx,
        problem.obs_camera_idx, problem.obs_xy, problem.obs_mask,
        problem.point_free,
    ):
        a = np.ascontiguousarray(np.asarray(a))
        h.update(str(a.shape).encode())
        h.update(a.tobytes())
    # mesh keyed by CONTENT (device ids + axis layout), not id(): a gc'd
    # mesh's address can be reused by a new mesh whose sharded arrays would
    # then silently alias a stale entry laid out for dead devices
    mesh_key = (
        None
        if mesh is None
        else (
            tuple(d.id for d in mesh.devices.flat),
            tuple(mesh.axis_names),
            mesh.devices.shape,
        )
    )
    key = (h.digest(), mesh_key)
    multiproc = mesh is not None and _mesh_is_multiprocess(mesh)
    hit = _bucket_cache.get(key)
    if hit is None:
        if multiproc:
            # per-host problem slice (VERDICT r4 missing #4): this process
            # builds ONLY its share of each bucket's [.., P] planes; the
            # full-width write-back metadata comes from the cheap
            # selection-only pass
            pid, nproc = jax.process_index(), jax.process_count()
            local_buckets = bucketize(problem, col_range=(pid, nproc))
            meta = bucket_meta(problem)
            rows_l = [m[0] for m in meta]
            sel_l = [m[1] for m in meta]
            local_rows_l = [np.asarray(b.point_rows) for b in local_buckets]
            dev_buckets = tuple(
                Bucket(*(_put_local_last_axis(np.asarray(arr), mesh)
                         for arr in b))
                for b in local_buckets
            )
            hit = (dev_buckets, rows_l, sel_l, local_rows_l)
        else:
            buckets = bucketize(problem)
            rows_l = [np.asarray(b.point_rows) for b in buckets]
            # columns holding a real point (padded columns repeat row 0 and
            # are fully masked — harmless to fill, excluded from write-back)
            sel_l = [
                (np.asarray(b.mask[0]) > 0) | (np.asarray(b.point_free) > 0)
                for b in buckets
            ]
            if mesh is not None:
                dev_buckets = _shard_buckets(buckets, mesh)
            else:
                dev_buckets = jax.device_put(buckets)
            hit = (dev_buckets, rows_l, sel_l, None)
        if len(_bucket_cache) >= _BUCKET_CACHE_MAX:
            _bucket_cache.pop(next(iter(_bucket_cache)))
        _bucket_cache[key] = hit
    dev_buckets, rows_l, sel_l, local_rows_l = hit

    # per-call point planes (the only parameter-dependent bucket content)
    points = np.asarray(problem.points, np.float32)
    if multiproc:
        buckets = tuple(
            b._replace(
                points=_put_local_last_axis(
                    np.ascontiguousarray(points[rows].T), mesh
                )
            )
            for b, rows in zip(dev_buckets, local_rows_l)
        )
        return buckets, None, rows_l, sel_l
    pts_l = [
        np.ascontiguousarray(points[rows].T)  # [3, P]
        for rows in rows_l
    ]
    if mesh is not None:
        buckets = tuple(
            b._replace(points=_put_sharded_last_axis(pts, mesh))
            for b, pts in zip(dev_buckets, pts_l)
        )
        return buckets, None, rows_l, sel_l
    # mesh-less path: leave the (stale) device-resident point placeholders in
    # place — the packed solver entry overwrites them from the single
    # concatenated H2D array
    return dev_buckets, pts_l, rows_l, sel_l


def _packed_dispatch(buckets, pts_all, cam_quat, cam_trans, intrinsics,
                     pose_free, intr_free, loss_scale, img2cam, eta,
                     npts, nts, I_pad, C_pad, model_id, loss_type,
                     cg_iters, max_iters, knobs):
    """Dispatch the packed solver through the persistent executable cache.

    Fresh processes re-pay each solver signature's remote compile (190-260 s
    for global-BA shapes) without it — see utils/aot_cache.py. Returns the
    packed result still ON DEVICE (callers fetch or chain as they choose).
    """
    import sys

    from pycolmap_tpu.ops import ba_math as _bam
    from pycolmap_tpu.ops import camera_models as _cmm
    from pycolmap_tpu.sfm import cg_kernel as _ckm
    from pycolmap_tpu.utils import aot_cache

    statics = (npts, I_pad, C_pad, model_id, loss_type,
               cg_iters, max_iters, knobs)
    sig = ("packed", nts, statics,
           aot_cache.source_salt(sys.modules[__name__], _ckm, _bam, _cmm))
    exe = aot_cache.get("ba", sig)
    if exe is not None:
        return exe(
            buckets, pts_all, cam_quat, cam_trans, intrinsics,
            pose_free, intr_free, loss_scale, img2cam=img2cam, eta=eta,
        )
    packed = _solve_bucketed_packed_jit(
        buckets, pts_all,
        cam_quat, cam_trans, intrinsics,
        pose_free, intr_free,
        npts, I_pad, C_pad, model_id, loss_type,
        loss_scale, cg_iters, max_iters,
        img2cam=img2cam, knobs=knobs, eta=eta,
    )
    if aot_cache.enabled():
        try:
            aot_cache.put(
                "ba", sig,
                _solve_bucketed_packed_jit.lower(
                    buckets, pts_all,
                    cam_quat, cam_trans, intrinsics,
                    pose_free, intr_free,
                    npts, I_pad, C_pad, model_id,
                    loss_type, loss_scale, cg_iters, max_iters,
                    img2cam=img2cam, knobs=knobs, eta=eta,
                ).compile(),  # in-memory hit: ~ms after the call
            )
        except Exception:
            pass
    return packed


def solve_bundle_fast(problem: BundleProblem, options, cg_iters: int = 30,
                      mesh=None):
    """Bucketed fast path; same contract as bundle_adjustment.solve_bundle.

    mesh: optional jax.sharding.Mesh — buckets are sharded along the point
    axis for multi-chip distributed BA.
    """
    if problem.num_obs == 0 or float(np.asarray(problem.obs_mask).sum()) == 0:
        return problem, BASummary(0.0, 0.0, 0, 0)
    buckets, pts_host_l, rows_l, sel_l = _bucketize_cached(problem, mesh)
    if not buckets:
        return problem, BASummary(0.0, 0.0, 0, 0)
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

    NP = solver_num_params(problem.model_id)
    knobs = _env_knobs()
    if mesh is None:
        npts = tuple(b.points.shape[1] for b in buckets)
        nts = tuple(b.mask.shape[0] for b in buckets)
        pts_all = np.concatenate(pts_host_l, axis=1)
        loss_type = int(options.loss_function_type)
        max_iters = int(options.max_num_iterations)
        loss_scale = jnp.float32(options.loss_function_scale)
        eta = jnp.float32(getattr(options, "eta", 0.1))
        packed = _packed_dispatch(
            buckets, pts_all, cam_quat, cam_trans, intrinsics,
            pose_free, intr_free, loss_scale, img2cam, eta,
            npts, nts, I_pad, C_pad, problem.model_id, loss_type,
            cg_iters, max_iters, knobs,
        )
        packed = np.asarray(packed)  # ONE D2H
        o = 0
        quat = packed[o:o + 4 * I_pad].reshape(I_pad, 4); o += 4 * I_pad
        trans = packed[o:o + 3 * I_pad].reshape(I_pad, 3); o += 3 * I_pad
        intr = packed[o:o + NP * C_pad].reshape(C_pad, NP); o += NP * C_pad
        pts_list = []
        for P in npts:
            pts_list.append(packed[o:o + 3 * P].reshape(3, P)); o += 3 * P
        cost0, cost, it = packed[o], packed[o + 1], packed[o + 2]
    else:
        quat, trans, intr, pts_list, cost0, cost, it = _solve_bucketed_jit(
            buckets,
            cam_quat, cam_trans, intrinsics,
            pose_free, intr_free,
            I_pad, C_pad, problem.model_id,
            int(options.loss_function_type),
            jnp.float32(options.loss_function_scale),
            cg_iters, int(options.max_num_iterations),
            img2cam=img2cam, knobs=knobs,
            eta=jnp.float32(getattr(options, "eta", 0.1)),
            cam_mesh=mesh if I_pad >= _cam_shard_min() else None,
        )
        if _mesh_is_multiprocess(mesh):
            # point outputs are shard-local per process; replicate on device
            # so every process can fetch the full result (all_gather over
            # the point axis; camera blocks are already psum-replicated)
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(mesh, P())
            pts_list = jax.jit(
                lambda ps: [jax.lax.with_sharding_constraint(p, rep)
                            for p in ps]
            )(pts_list)
            quat, trans, intr, cost0, cost, it = jax.jit(
                lambda xs: [jax.lax.with_sharding_constraint(x, rep)
                            for x in xs]
            )((quat, trans, intr, cost0, cost, it))
        # one batched D2H transfer for all results (per-array np.asarray
        # would cost a round-trip each)
        quat, trans, intr, pts_list, cost0, cost, it = jax.device_get(
            (quat, trans, intr, pts_list, cost0, cost, it)
        )
    quat = quat[:I]
    trans = trans[:I]
    # the solver runs NP-narrow intrinsics; restore the public
    # [C, MAX_PARAMS] width (columns >= NP are untouched by BA)
    intr_full = np.asarray(problem.intrinsics, np.float32).copy()
    intr_full[:, : intr.shape[1]] = intr[:C]
    intr = intr_full
    # write bucketed points back to flat rows (rows/sel cached host-side —
    # the bucket structure arrays themselves live on device)
    points = np.asarray(problem.points).copy()
    for pts, rows, sel in zip(pts_list, rows_l, sel_l):
        vals = np.asarray(pts).T  # [P, 3]
        points[rows[sel]] = vals[sel]
    summary = BASummary(float(cost0), float(cost), int(it), 2 * problem.num_obs)
    # points stay HOST numpy: an eager jnp.asarray here cost one H2D per
    # solve and the immediate apply_bundle_solution paid the D2H right back
    # (~2 tunnel round trips per local-BA round for nothing)
    new_problem = problem._replace(
        cam_quat=quat, cam_trans=trans, intrinsics=intr, points=points,
    )
    if mesh is None:
        _prewarm_next_signatures(
            tuple(b.points.shape[1] for b in buckets),
            tuple(b.mask.shape[0] for b in buckets),
            I_pad, C_pad, problem.model_id,
            int(options.loss_function_type), cg_iters,
            int(options.max_num_iterations), knobs,
        )
    return new_problem, summary


# Predictive compile prewarm: an incremental-mapping run meets a short
# monotone ladder of solver signatures (4x padded I / per-bucket P steps);
# the FIRST solve at each new shape blocks on a minutes-scale remote
# compile (measured 192 s for a global-BA step, 2026-08-21). After each
# solve, compile the likely next shapes up in a daemon thread on all-zero
# buckets of exactly those paddings, so growth finds a warm executable.
_prewarmed_sigs: set = set()
_prewarm_lock = None
_prewarm_thread = None


def compile_solver_signature(npts, nts, I_pad, C_pad, model_id, loss_type,
                             cg_iters, max_iterations, knobs=None):
    """AOT-compile ONE packed-solver signature (no execution).

    Uses jit(...).lower(...).compile(): the executable lands in jax's
    executable cache keyed by the same (shape, static-args) signature the
    real solve will present, so the first real solve at this shape dispatches
    warm. Compile-only also means the prewarm thread never runs LM
    iterations on the chip (it used to block_until_ready a real solve,
    competing with critical-path work through the serialized tunnel)."""
    import sys

    from pycolmap_tpu.ops import ba_math as _bam
    from pycolmap_tpu.ops import camera_models as _cmm
    from pycolmap_tpu.sfm import cg_kernel as _ckm
    from pycolmap_tpu.utils import aot_cache

    if knobs is None:
        knobs = _env_knobs()
    statics = (npts, I_pad, C_pad, model_id, loss_type, cg_iters,
               max_iterations, knobs)
    sig = ("packed", tuple(nts), statics,
           aot_cache.source_salt(sys.modules[__name__], _ckm, _bam, _cmm))
    if aot_cache.get("ba", sig) is not None:
        return  # already on disk (or warm in this process)
    buckets = tuple(
        Bucket(
            img_idx=np.zeros((T, P), np.int32),
            cam_idx=np.zeros((T, P), np.int32),
            xy=np.zeros((2, T, P), np.float32),
            mask=np.zeros((T, P), np.float32),
            points=np.zeros((3, P), np.float32),
            point_free=np.zeros(P, np.float32),
            point_rows=np.zeros(P, np.int32),
        )
        for T, P in zip(nts, npts)
    )
    pts_all = np.zeros((3, sum(npts)), np.float32)
    quat0 = np.tile(np.array([[1.0, 0, 0, 0]], np.float32), (I_pad, 1))
    compiled = _solve_bucketed_packed_jit.lower(
        buckets, pts_all,
        quat0, np.zeros((I_pad, 3), np.float32),
        np.ones((C_pad, MAX_PARAMS), np.float32),
        np.zeros((I_pad, 6), np.float32),
        np.zeros((C_pad, MAX_PARAMS), np.float32),
        npts, I_pad, C_pad, model_id, loss_type,
        jnp.float32(1.0), cg_iters, max_iterations,
        img2cam=np.zeros(I_pad, np.int32), knobs=knobs,
        eta=jnp.float32(0.1),
    ).compile()
    aot_cache.put("ba", sig, compiled)


def _prewarm_next_signatures(npts, nts, I_pad, C_pad, model_id, loss_type,
                             cg_iters, max_iterations, knobs=None):
    import threading

    global _prewarm_lock, _prewarm_thread
    if os.environ.get("PYCOLMAP_TPU_BA_PREWARM_NEXT", "1") == "0":
        return
    # only for global-BA-sized solves: local-BA signatures are few and hit
    # early, and speculative compiles QUEUE AHEAD of the critical path on
    # the (serial) remote compile service — a miss costs real wall time
    if I_pad < 32:
        return
    try:
        if jax.default_backend() == "cpu":
            return
    except Exception:  # pragma: no cover
        return
    if _prewarm_lock is None:
        _prewarm_lock = threading.Lock()

    # signature includes nts (the bucket T ladder): distinct ladders with
    # equal npts are distinct jit signatures
    base = (C_pad, model_id, loss_type, cg_iters, max_iterations, knobs)
    # single most-likely next shape: the reconstruction grows images and
    # points together between global rounds
    cands = [
        (tuple(p * 4 for p in npts), I_pad * 4),
    ]
    todo = []
    with _prewarm_lock:
        if _prewarm_thread is not None and _prewarm_thread.is_alive():
            return  # at most one speculative compile in flight
        # the CURRENT signature just compiled for real — safe to record done
        _prewarmed_sigs.add((tuple(npts), tuple(nts), I_pad) + base)
        for npts_c, ipad_c in cands:
            sig = (npts_c, tuple(nts), ipad_c) + base
            if sig not in _prewarmed_sigs:
                todo.append((npts_c, ipad_c, sig))
    if not todo:
        return

    def work():
        for npts_c, ipad_c, sig in todo:
            try:
                compile_solver_signature(
                    npts_c, nts, ipad_c, C_pad, model_id, loss_type,
                    cg_iters, max_iterations, knobs,
                )
            except Exception:
                # never take the pipeline down from the warm path; the
                # signature stays unrecorded so a later call can retry
                continue
            with _prewarm_lock:
                _prewarmed_sigs.add(sig)

    t = threading.Thread(
        target=work, name="pycolmap-tpu-ba-prewarm-next", daemon=True
    )
    with _prewarm_lock:
        _prewarm_thread = t
    t.start()
