"""Epipolar geometry residuals and pose recovery (batched JAX).

TPU-native counterparts of upstream colmap/estimators residual computations:
- squared Sampson error (ref: two_view_geometry.h:161-175)
- homography transfer error
- cheirality-aware pose-from-essential recovery (upstream PoseFromEssentialMatrix)
- pure-rotation-aware pose-from-homography (upstream HomographyDecomposition)

All functions broadcast over leading axes; matrices [..., 3, 3], points
[..., N, 2] in normalized camera coordinates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pycolmap_tpu.ops import quaternion as qops
from pycolmap_tpu.ops import solvers


def sampson_error(E, x1, x2):
    """Squared Sampson distance. E/F: [..., 3, 3]; x: [..., N, 2].

    Units: squared (normalized or pixel) image coordinates, matching the
    units of x.
    """
    ones = jnp.ones_like(x1[..., :1])
    p1 = jnp.concatenate([x1, ones], axis=-1)  # [..., N, 3]
    p2 = jnp.concatenate([x2, ones], axis=-1)
    Ex1 = jnp.einsum("...ij,...nj->...ni", E, p1)
    Etx2 = jnp.einsum("...ji,...nj->...ni", E, p2)
    x2Ex1 = jnp.sum(p2 * Ex1, axis=-1)
    denom = (
        Ex1[..., 0] ** 2 + Ex1[..., 1] ** 2 + Etx2[..., 0] ** 2 + Etx2[..., 1] ** 2
    )
    return x2Ex1**2 / jnp.maximum(denom, 1e-12)


def epipolar_line_error(E, x1, x2):
    """Squared point-to-epipolar-line distance of x2 w.r.t. line E x1."""
    ones = jnp.ones_like(x1[..., :1])
    p1 = jnp.concatenate([x1, ones], axis=-1)
    p2 = jnp.concatenate([x2, ones], axis=-1)
    Ex1 = jnp.einsum("...ij,...nj->...ni", E, p1)
    num = jnp.sum(p2 * Ex1, axis=-1) ** 2
    denom = Ex1[..., 0] ** 2 + Ex1[..., 1] ** 2
    return num / jnp.maximum(denom, 1e-12)


def homography_transfer_error(H, x1, x2):
    """Squared one-sided transfer error |x2 - proj(H x1)|^2."""
    ones = jnp.ones_like(x1[..., :1])
    p1 = jnp.concatenate([x1, ones], axis=-1)
    Hx1 = jnp.einsum("...ij,...nj->...ni", H, p1)
    w = Hx1[..., 2]
    # points mapping to infinity get a huge (but finite) error
    bad = jnp.abs(w) < 1e-8
    w_safe = jnp.where(bad, 1.0, w)
    proj = Hx1[..., :2] / w_safe[..., None]
    err = jnp.sum((proj - x2) ** 2, axis=-1)
    return jnp.where(bad, 1e12, err)


def reprojection_error_normalized(quat, trans, points2D, points3D):
    """Squared reprojection error in the normalized plane for cam_from_world.

    quat [..., 4] wxyz, trans [..., 3], points2D [..., N, 2] (normalized),
    points3D [..., N, 3] (world). Points behind the camera get huge error.
    """
    p_cam = qops.quat_rotate(quat[..., None, :], points3D) + trans[..., None, :]
    z = p_cam[..., 2]
    behind = z <= 1e-8
    z_safe = jnp.where(behind, 1.0, z)
    proj = p_cam[..., :2] / z_safe[..., None]
    err = jnp.sum((proj - points2D) ** 2, axis=-1)
    return jnp.where(behind, 1e12, err)


def triangulate_and_count_cheirality(quat, trans, x1, x2, max_depth=None):
    """Triangulate x1/x2 under cam2_from_cam1=(quat,trans); count points with
    positive depth in both views (the cheirality test used to disambiguate
    E/H decompositions).

    Returns (points3D_in_cam1 [..., N, 3], front_mask [..., N]).
    """
    R = qops.quat_to_matrix(quat)
    shape = jnp.broadcast_shapes(R.shape[:-2], x1.shape[:-2])
    eye = jnp.broadcast_to(jnp.eye(3, dtype=x1.dtype), shape + (3, 3))
    zero = jnp.zeros(shape + (3, 1), dtype=x1.dtype)
    P1 = jnp.concatenate([eye, zero], axis=-1)  # [..., 3, 4]
    P2 = jnp.concatenate(
        [jnp.broadcast_to(R, shape + (3, 3)),
         jnp.broadcast_to(trans[..., :, None], shape + (3, 1))], axis=-1
    )
    proj = jnp.stack([P1, P2], axis=-3)  # [..., 2, 3, 4]
    n = x1.shape[-2]
    proj_n = jnp.broadcast_to(
        proj[..., None, :, :, :], shape + (n, 2, 3, 4)
    )
    x = jnp.stack([x1, x2], axis=-2)  # [..., N, 2(views), 2]
    X = solvers.triangulate_dlt(proj_n, x)  # [..., N, 3]
    z1 = X[..., 2]
    Xc2 = qops.quat_rotate(quat[..., None, :], X) + trans[..., None, :]
    z2 = Xc2[..., 2]
    # reasonable depth bounds as in upstream CheckCheirality:
    # kMinDepth < z < max_depth (max_depth = 1000 * baseline)
    baseline = jnp.linalg.norm(trans, axis=-1)
    if max_depth is None:
        max_d = 1000.0 * baseline
    else:
        max_d = max_depth
    eps = 1e-6
    front = (z1 > eps) & (z2 > eps)
    front = front & (z1 < max_d[..., None]) & (z2 < max_d[..., None])
    return X, front


def pose_from_essential(E, x1, x2, inlier_mask=None):
    """Recover cam2_from_cam1 from E via cheirality (upstream PoseFromEssentialMatrix).

    E [..., 3, 3]; x [..., N, 2]. Returns (quat wxyz, trans, points3D, front_mask)
    for the best of the 4 candidate decompositions.
    """
    R1, R2, t = solvers.decompose_essential(E)
    q1 = qops.matrix_to_quat(R1)
    q2 = qops.matrix_to_quat(R2)
    cands_q = jnp.stack([q1, q1, q2, q2], axis=-2)  # [..., 4, 4]
    cands_t = jnp.stack([t, -t, t, -t], axis=-2)  # [..., 4, 3]
    if inlier_mask is None:
        inlier_mask = jnp.ones(x1.shape[:-1], dtype=bool)

    X, front = jax.vmap(
        lambda q_, t_: triangulate_and_count_cheirality(q_, t_, x1, x2)
    )(
        jnp.moveaxis(cands_q, -2, 0), jnp.moveaxis(cands_t, -2, 0)
    )  # X: [4, ..., N, 3]; front: [4, ..., N]
    counts = jnp.sum(front & inlier_mask, axis=-1)  # [4, ...]
    best = jnp.argmax(counts, axis=0)  # [...]
    quat = jnp.take_along_axis(
        jnp.moveaxis(cands_q, -2, 0), best[None, ..., None], axis=0
    )[0]
    trans = jnp.take_along_axis(
        jnp.moveaxis(cands_t, -2, 0), best[None, ..., None], axis=0
    )[0]
    X_best = jnp.take_along_axis(X, best[None, ..., None, None], axis=0)[0]
    front_best = jnp.take_along_axis(front, best[None, ..., None], axis=0)[0]
    return quat, trans, X_best, front_best & inlier_mask


def decompose_homography(H, K1=None, K2=None):
    """Malis–Vargas homography decomposition into (R, t, n) candidates.

    H maps normalized coords cam1 -> cam2 (K's already removed if None).
    Returns (R [..., 4, 3, 3], t [..., 4, 3], n [..., 4, 3]).
    """
    if K1 is not None:
        H = jnp.linalg.solve(K2, H @ K1)
    # normalize by middle singular value
    _, S, _ = jnp.linalg.svd(H)
    Hn = H / S[..., 1:2, None]
    # ensure det-positive orientation
    det = jnp.linalg.det(Hn)
    Hn = Hn * jnp.where(det[..., None, None] < 0, -1.0, 1.0)

    S_mat = jnp.swapaxes(Hn, -1, -2) @ Hn - jnp.eye(3, dtype=H.dtype)

    # Malis-Vargas analytic decomposition
    s11, s12, s13 = S_mat[..., 0, 0], S_mat[..., 0, 1], S_mat[..., 0, 2]
    s22, s23, s33 = S_mat[..., 1, 1], S_mat[..., 1, 2], S_mat[..., 2, 2]

    def opp_minor(a, b, c):
        return b * b - a * c  # M_opposite = s_ab^2 - s_aa s_bb

    M11 = opp_minor(s22, s23, s33)
    M22 = opp_minor(s11, s13, s33)
    M33 = opp_minor(s11, s12, s22)
    M12 = s13 * s23 - s12 * s33
    M13 = s12 * s23 - s13 * s22
    M23 = s12 * s13 - s23 * s11

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 0.0))

    # pick pivot = largest |s_ii|
    abs_s = jnp.stack([jnp.abs(s11), jnp.abs(s22), jnp.abs(s33)], axis=-1)
    pivot = jnp.argmax(abs_s, axis=-1)

    eps_sign = lambda x: jnp.where(x >= 0, 1.0, -1.0)

    # candidate normals for each pivot choice
    na_1 = jnp.stack([s11, s12 + safe_sqrt(M33), s13 + eps_sign(M23) * safe_sqrt(M22)], axis=-1)
    nb_1 = jnp.stack([s11, s12 - safe_sqrt(M33), s13 - eps_sign(M23) * safe_sqrt(M22)], axis=-1)
    na_2 = jnp.stack([s12 + safe_sqrt(M33), s22, s23 - eps_sign(M13) * safe_sqrt(M11)], axis=-1)
    nb_2 = jnp.stack([s12 - safe_sqrt(M33), s22, s23 + eps_sign(M13) * safe_sqrt(M11)], axis=-1)
    na_3 = jnp.stack([s13 + eps_sign(M12) * safe_sqrt(M22), s23 + safe_sqrt(M11), s33], axis=-1)
    nb_3 = jnp.stack([s13 - eps_sign(M12) * safe_sqrt(M22), s23 - safe_sqrt(M11), s33], axis=-1)

    pivot_e = pivot[..., None]
    na = jnp.where(pivot_e == 0, na_1, jnp.where(pivot_e == 1, na_2, na_3))
    nb = jnp.where(pivot_e == 0, nb_1, jnp.where(pivot_e == 1, nb_2, nb_3))

    def unit(v):
        return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)

    na = unit(na)
    nb = unit(nb)

    # For each candidate normal n, recover R and t from Hn = R + t n^T by a
    # fixpoint of polar decompositions: given t, R is the polar factor of
    # (Hn - t n^T); given R, t = (Hn - R) n. Branch-free, jit/vmap safe.
    def rt_from_n(n):
        R_est = Hn
        t_est = jnp.zeros_like(n)
        for _ in range(10):
            A = Hn - t_est[..., :, None] * n[..., None, :]
            U, _, Vt = jnp.linalg.svd(A)
            dsign = jnp.linalg.det(U @ Vt)
            D = jnp.stack(
                [jnp.ones_like(dsign), jnp.ones_like(dsign), dsign], axis=-1
            )
            R_est = U @ (D[..., :, None] * Vt)
            t_est = jnp.einsum("...ij,...j->...i", Hn - R_est, n)
        return R_est, t_est

    Ra, ta = rt_from_n(na)
    Rb, tb = rt_from_n(nb)
    R_out = jnp.stack([Ra, Ra, Rb, Rb], axis=-3)
    t_out = jnp.stack([ta, -ta, tb, -tb], axis=-2)
    n_out = jnp.stack([na, -na, nb, -nb], axis=-2)
    # the (R, -t, -n) pair shares R with (R, t, n)
    return R_out, t_out, n_out


def pose_from_homography(H, x1, x2, inlier_mask=None):
    """cam2_from_cam1 from H + cheirality (plane-induced or pure rotation).

    Returns (quat, trans, n, points3D, front_mask).
    """
    R_c, t_c, n_c = decompose_homography(H)
    q_c = qops.matrix_to_quat(R_c)  # [..., 4cand, 4]
    if inlier_mask is None:
        inlier_mask = jnp.ones(x1.shape[:-1], dtype=bool)

    def eval_cand(q_, t_):
        X, front = triangulate_and_count_cheirality(q_, t_, x1, x2)
        return X, front

    X, front = jax.vmap(eval_cand, in_axes=(0, 0))(
        jnp.moveaxis(q_c, -2, 0), jnp.moveaxis(t_c, -2, 0)
    )
    counts = jnp.sum(front & inlier_mask, axis=-1)
    best = jnp.argmax(counts, axis=0)
    quat = jnp.take_along_axis(jnp.moveaxis(q_c, -2, 0), best[None, ..., None], axis=0)[0]
    trans = jnp.take_along_axis(jnp.moveaxis(t_c, -2, 0), best[None, ..., None], axis=0)[0]
    n = jnp.take_along_axis(jnp.moveaxis(n_c, -2, 0), best[None, ..., None], axis=0)[0]
    X_best = jnp.take_along_axis(X, best[None, ..., None, None], axis=0)[0]
    front_best = jnp.take_along_axis(front, best[None, ..., None], axis=0)[0]
    return quat, trans, n, X_best, front_best & inlier_mask
