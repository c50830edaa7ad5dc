"""Homography estimation (API parity: pycolmap/estimators/homography_matrix.h).

LORANSAC with batched 4-point DLT hypotheses and weighted-DLT local
optimization (ref: homography_matrix.h:25-27).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pycolmap_tpu.estimators.ransac import BatchedLORANSAC, RANSACOptions
from pycolmap_tpu.ops import solvers


def _transfer_batched(H, x1, x2):
    """H [K, S, 3, 3]; x [N, 2] -> [K, S, N] squared transfer error."""
    ones = jnp.ones_like(x1[..., :1])
    p1 = jnp.concatenate([x1, ones], axis=-1)
    Hx1 = jnp.einsum("ksij,nj->ksni", H, p1)
    w = Hx1[..., 2]
    bad = jnp.abs(w) < 1e-8
    w_safe = jnp.where(bad, 1.0, w)
    proj = Hx1[..., :2] / w_safe[..., None]
    err = jnp.sum((proj - x2) ** 2, axis=-1)
    return jnp.where(bad, 1e12, err)


def _minimal_4pt(idx, x1, x2):
    H = solvers.homography_dlt(x1[idx], x2[idx])
    # degenerate (collinear) samples produce near-singular H; mark invalid
    det = jnp.abs(jnp.linalg.det(H))
    return H[:, None], (det > 1e-12)[:, None]


def _refit_dlt(weights, x1, x2):
    H = solvers.homography_dlt(x1[None], x2[None], weights[None])
    return H[:, None], jnp.ones((1, 1), dtype=bool)


_engine = BatchedLORANSAC(
    minimal_solver=_minimal_4pt,
    residual_fn=_transfer_batched,
    sample_size=4,
    refit_solver=_refit_dlt,
    name="homography4pt",
)


def estimate_homography_matrix(points2D1, points2D2, options: RANSACOptions = None):
    """LORANSAC H estimation. Returns dict(H, num_inliers, inliers) or None."""
    if options is None:
        options = RANSACOptions()
    options.check()
    x1 = np.asarray(points2D1, dtype=np.float32)
    x2 = np.asarray(points2D2, dtype=np.float32)
    report = _engine.estimate(options, x1, x2, seed=0)
    if not report.success:
        return None
    return {
        "H": np.asarray(report.model, dtype=np.float64),
        "num_inliers": report.support_num_inliers,
        "inliers": report.inlier_mask,
        "num_trials": report.num_trials,
    }


homography_matrix_estimation = estimate_homography_matrix
