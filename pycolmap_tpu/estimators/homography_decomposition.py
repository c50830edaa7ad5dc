"""Homography decomposition API (parity: pycolmap/geometry/homography_matrix.h:33-41).

``homography_decomposition(H, K1, K2, points1, points2)`` ->
dict(R, t, n, points3D) — the cheirality-selected decomposition.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pycolmap_tpu.ops import epipolar


def homography_decomposition(H, K1, K2, points1, points2):
    """Decompose H (pixel-space, x2 ~ H x1) with calibration K1/K2.

    points1/points2: Nx2 pixel correspondences used for the cheirality test.
    Returns dict(R, t, n, points3D).
    """
    H = np.asarray(H, dtype=np.float64)
    K1 = np.asarray(K1, dtype=np.float64)
    K2 = np.asarray(K2, dtype=np.float64)
    x1 = np.asarray(points1, dtype=np.float64).reshape(-1, 2)
    x2 = np.asarray(points2, dtype=np.float64).reshape(-1, 2)
    # normalize points
    def norm(K, x):
        xh = np.concatenate([x, np.ones((len(x), 1))], axis=1)
        xn = np.linalg.solve(K, xh.T).T
        return (xn[:, :2] / xn[:, 2:]).astype(np.float32)

    Hn = np.linalg.solve(K2, H @ K1)
    quat, trans, n, X, front = epipolar.pose_from_homography(
        jnp.asarray(Hn, dtype=jnp.float32),
        jnp.asarray(norm(K1, x1)),
        jnp.asarray(norm(K2, x2)),
    )
    quat = np.asarray(quat, dtype=np.float64)
    from pycolmap_tpu.ops import quaternion as qops

    R = np.asarray(qops.quat_to_matrix(jnp.asarray(quat)), dtype=np.float64)
    return {
        "R": R,
        "t": np.asarray(trans, dtype=np.float64),
        "n": np.asarray(n, dtype=np.float64),
        "points3D": np.asarray(X, dtype=np.float64)[np.asarray(front, dtype=bool)],
    }
