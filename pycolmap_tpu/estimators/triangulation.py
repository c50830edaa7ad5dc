"""Robust multi-view triangulation (API parity: pycolmap/estimators/triangulation.h).

RANSAC over view pairs: sample two observations, DLT-triangulate, score by
reprojection over all observing views with per-view pixel thresholds and a
minimum triangulation angle (ref: triangulation.h:22-76).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pycolmap_tpu.estimators.ransac import BatchedLORANSAC, RANSACOptions, RANSACReport
from pycolmap_tpu.ops import solvers
from pycolmap_tpu.utils.options import BaseOptions, options_dataclass


@options_dataclass
class EstimateTriangulationOptions(BaseOptions):
    min_tri_angle: float = 1.5  # degrees (upstream default 1.5deg)
    ransac: RANSACOptions = None

    def __post_init__(self):
        if self.ransac is None:
            self.ransac = RANSACOptions()


def _tri_residual(model, x, proj, fsq, centers, min_tri_angle_rad):
    """model: X [K, S, 3]; residual = pixel^2 reprojection over views."""
    X = model
    Xh = jnp.concatenate([X, jnp.ones_like(X[..., :1])], axis=-1)  # [K,S,4]
    p = jnp.einsum("mij,ksj->ksmi", proj, Xh)  # [K,S,M,3]
    z = p[..., 2]
    behind = z <= 1e-8
    z_safe = jnp.where(behind, 1.0, z)
    uv = p[..., :2] / z_safe[..., None]
    err = jnp.sum((uv - x[None, None]) ** 2, axis=-1) * fsq[None, None]
    return jnp.where(behind, 1e12, err)


def _make_minimal(min_tri_angle_rad):
    def minimal(idx, x, proj, fsq, centers):
        # idx [K, 2] view pairs
        proj_pair = proj[idx]  # [K,2,3,4]
        x_pair = x[idx]  # [K,2,2]
        X = solvers.triangulate_dlt(proj_pair, x_pair)  # [K,3]
        # triangulation angle check
        c1 = centers[idx[:, 0]]
        c2 = centers[idx[:, 1]]
        r1 = c1 - X
        r2 = c2 - X
        denom = jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1)
        cosang = jnp.sum(r1 * r2, axis=-1) / jnp.maximum(denom, 1e-12)
        angle = jnp.arccos(jnp.clip(cosang, -1.0, 1.0))
        ok = angle >= min_tri_angle_rad
        return X[:, None], ok[:, None]

    return minimal


def _refit(weights, x, proj, fsq, centers):
    X = solvers.triangulate_dlt(proj[None], x[None], weights[None])
    return X[:, None], jnp.ones((1, 1), dtype=bool)


def estimate_triangulation(
    points2D,
    cams_from_world,
    cameras,
    options: EstimateTriangulationOptions = None,
):
    """Triangulate a track robustly.

    points2D: Mx2 pixel observations; cams_from_world: list of M Rigid3d;
    cameras: list of M Camera. Returns dict(point3D, inliers) or None.
    """
    if options is None:
        options = EstimateTriangulationOptions()
    M = len(points2D)
    if M < 2:
        return None
    x_norm = np.stack(
        [
            np.asarray(cameras[i].cam_from_img(np.asarray(points2D[i])[None]))[0]
            for i in range(M)
        ]
    ).astype(np.float32)
    proj = np.stack([t.matrix() for t in cams_from_world]).astype(np.float32)
    fsq = np.array(
        [cameras[i].mean_focal_length() ** 2 for i in range(M)], dtype=np.float32
    )
    centers = np.stack(
        [t.inverse().translation for t in cams_from_world]
    ).astype(np.float32)

    min_angle_rad = np.deg2rad(options.min_tri_angle)
    engine = BatchedLORANSAC(
        minimal_solver=_make_minimal(jnp.float32(min_angle_rad)),
        residual_fn=lambda model, x, p, f, c: _tri_residual(
            model, x, p, f, c, min_angle_rad
        ),
        sample_size=2,
        refit_solver=_refit,
        chunk_size=64,
        # min_angle is baked into the traced closures -> part of the key
        name=f"tri2view:{min_angle_rad:.6f}",
    )
    report = engine.estimate(options.ransac, x_norm, proj, fsq, centers, seed=0)
    if not report.success or report.support_num_inliers < 2:
        return None
    return {
        "point3D": np.asarray(report.model, dtype=np.float64),
        "inliers": report.inlier_mask,
        "num_inliers": report.support_num_inliers,
    }


estimate_triangulation_robust = estimate_triangulation
