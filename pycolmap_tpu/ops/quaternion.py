"""Batched quaternion / SE(3) math in JAX (device-side functional core).

This is the compute-path counterpart of :mod:`pycolmap_tpu.geometry.types`
(ref API: pycolmap/geometry/bindings.h). Everything here is pure, jittable,
vmappable and differentiable; quaternions are **[w, x, y, z]** here (matching
COLMAP's on-disk/BA convention) and all functions broadcast over leading axes.

Design note: BA and pose estimators parameterize rotation updates in the
tangent space (axis-angle, 3 dof) and retract via :func:`quat_boxplus`, the
JAX equivalent of Ceres' quaternion manifold (ref: pipeline/sfm.h:307-319).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_mul(q1, q2):
    """Hamilton product, wxyz convention; broadcasts over leading axes."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q, v):
    """Rotate vectors v [..., 3] by quaternions q [..., 4] (wxyz).

    Uses the expanded 15-mul form (cheaper than building the matrix when the
    rotation is applied to a single point, as in BA residuals).
    """
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_to_matrix(q):
    """wxyz quaternion [..., 4] -> rotation matrix [..., 3, 3]."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    m = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(R):
    """Rotation matrix [..., 3, 3] -> wxyz quaternion [..., 4].

    Branch-free (selects among the four Shepperd cases with jnp.where), so it
    is safe under jit/vmap for arbitrary rotations.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate quaternions, each valid when its pivot is largest.
    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-24))

    s0 = safe_sqrt(1.0 + tr)
    q0 = jnp.stack(
        [0.5 * s0, 0.5 * (m21 - m12) / s0, 0.5 * (m02 - m20) / s0,
         0.5 * (m10 - m01) / s0], axis=-1)
    s1 = safe_sqrt(1.0 + m00 - m11 - m22)
    q1 = jnp.stack(
        [0.5 * (m21 - m12) / s1, 0.5 * s1, 0.5 * (m01 + m10) / s1,
         0.5 * (m02 + m20) / s1], axis=-1)
    s2 = safe_sqrt(1.0 - m00 + m11 - m22)
    q2 = jnp.stack(
        [0.5 * (m02 - m20) / s2, 0.5 * (m01 + m10) / s2, 0.5 * s2,
         0.5 * (m12 + m21) / s2], axis=-1)
    s3 = safe_sqrt(1.0 - m00 - m11 + m22)
    q3 = jnp.stack(
        [0.5 * (m10 - m01) / s3, 0.5 * (m02 + m20) / s3,
         0.5 * (m12 + m21) / s3, 0.5 * s3], axis=-1)

    cond1 = (m00 > m11) & (m00 > m22)
    cond2 = m11 > m22
    q_no_tr = jnp.where(
        cond1[..., None], q1, jnp.where(cond2[..., None], q2, q3)
    )
    q = jnp.where((tr > 0)[..., None], q0, q_no_tr)
    return quat_normalize(q)


def axis_angle_to_quat(aa):
    """so(3) tangent [..., 3] -> wxyz quaternion (exponential map).

    Differentiable at aa = 0: the norm is guarded with the double-where
    pattern and the sinc factor switches to its Taylor series near zero,
    because BA linearizes exactly at the zero tangent and a plain
    sqrt(sum(aa^2)) would feed NaN into every pose Jacobian.
    """
    sq = jnp.sum(aa * aa, axis=-1, keepdims=True)
    small = sq < 1e-12
    angle = jnp.sqrt(jnp.where(small, 1.0, sq))
    half = 0.5 * angle
    # sin(a/2)/a = 1/2 - a^2/48 + O(a^4);  cos(a/2) = 1 - a^2/8 + O(a^4)
    k = jnp.where(small, 0.5 - sq / 48.0, jnp.sin(half) / angle)
    w = jnp.where(small, 1.0 - sq / 8.0, jnp.cos(half))
    return jnp.concatenate([w, k * aa], axis=-1)


def quat_to_axis_angle(q):
    """wxyz quaternion -> so(3) tangent [..., 3] (log map)."""
    q = quat_normalize(q)
    q = q * jnp.sign(jnp.where(q[..., :1] == 0, 1.0, q[..., :1]))
    sin_half = jnp.linalg.norm(q[..., 1:], axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(sin_half, q[..., :1])
    k = jnp.where(sin_half > 1e-8, angle / jnp.maximum(sin_half, 1e-12), 2.0)
    return k * q[..., 1:]


def quat_boxplus(q, delta):
    """Manifold retraction: apply tangent update delta [...,3] to q [...,4].

    q' = exp(delta) * q  (left-multiplicative convention, as used for
    cam_from_world updates in BA).
    """
    return quat_normalize(quat_mul(axis_angle_to_quat(delta), q))


def quat_angle(q):
    """Rotation angle in radians of wxyz quaternion."""
    q = quat_normalize(q)
    return 2.0 * jnp.arctan2(
        jnp.linalg.norm(q[..., 1:], axis=-1), jnp.abs(q[..., 0])
    )


def rigid_transform(quat, trans, points):
    """Apply cam_from_world (quat wxyz [...,4], t [...,3]) to points [...,3]."""
    return quat_rotate(quat, points) + trans


def rigid_compose(quat_ab, t_ab, quat_bc, t_bc):
    """(a_from_b) * (b_from_c) -> a_from_c."""
    quat_ac = quat_mul(quat_ab, quat_bc)
    t_ac = quat_rotate(quat_ab, t_bc) + t_ab
    return quat_ac, t_ac


def rigid_inverse(quat, trans):
    q_inv = quat_conj(quat)
    return q_inv, -quat_rotate(q_inv, trans)


def cross_matrix(v):
    """[..., 3] -> skew-symmetric [..., 3, 3]."""
    zero = jnp.zeros_like(v[..., 0])
    rows = jnp.stack(
        [zero, -v[..., 2], v[..., 1],
         v[..., 2], zero, -v[..., 0],
         -v[..., 1], v[..., 0], zero], axis=-1)
    return rows.reshape(v.shape[:-1] + (3, 3))


def essential_from_pose(quat, trans):
    """E = [t]_x R for cam2_from_cam1 (ref: geometry/bindings.h:82)."""
    t = trans / jnp.maximum(jnp.linalg.norm(trans, axis=-1, keepdims=True), 1e-12)
    return cross_matrix(t) @ quat_to_matrix(quat)


def project_center(quat, trans):
    """Camera projection center in world coords: -R^T t."""
    return -quat_rotate(quat_conj(quat), trans)
