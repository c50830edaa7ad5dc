"""Two-view geometry estimation with E/F/H arbitration.

API parity: pycolmap/estimators/two_view_geometry.h — config enum (:67-77),
TwoViewGeometryOptions (:41-63), estimate_calibrated_two_view_geometry (:95),
estimate_two_view_geometry (:124), estimate_two_view_geometry_pose (:153).

The three models are estimated as three batched LORANSACs (they share the
correspondence tensors on device); the winning configuration follows the
reference's inlier-ratio arbitration.
"""

from __future__ import annotations

import enum

import jax.numpy as jnp
import numpy as np

from pycolmap_tpu.estimators import essential_matrix as em
from pycolmap_tpu.estimators import fundamental_matrix as fm
from pycolmap_tpu.estimators import homography_matrix as hm
from pycolmap_tpu.estimators.ransac import RANSACOptions
from pycolmap_tpu.geometry import Rigid3d, Rotation3d
from pycolmap_tpu.ops import epipolar
from pycolmap_tpu.utils.options import BaseOptions, options_dataclass


class TwoViewGeometryConfiguration(enum.IntEnum):
    """Matches upstream TwoViewGeometry::ConfigurationType (two_view_geometry.h:67-77)."""

    UNDEFINED = 0
    DEGENERATE = 1
    CALIBRATED = 2
    UNCALIBRATED = 3
    PLANAR = 4
    PANORAMIC = 5
    PLANAR_OR_PANORAMIC = 6
    WATERMARK = 7
    MULTIPLE = 8


@options_dataclass
class TwoViewGeometryOptions(BaseOptions):
    """Defaults mirror the reference (two_view_geometry.h:41-63)."""

    min_num_inliers: int = 15
    min_E_F_inlier_ratio: float = 0.95
    max_H_inlier_ratio: float = 0.8
    watermark_min_inlier_ratio: float = 0.7
    watermark_border_size: float = 0.1
    detect_watermark: bool = True
    multiple_ignore_watermark: bool = True
    force_H_use: bool = False
    compute_relative_pose: bool = False
    multiple_models: bool = False
    ransac: RANSACOptions = None

    def __post_init__(self):
        if self.ransac is None:
            self.ransac = RANSACOptions()


class TwoViewGeometry:
    """Result container (mirrors upstream TwoViewGeometry struct)."""

    __slots__ = (
        "config", "E", "F", "H", "cam2_from_cam1",
        "inlier_matches", "tri_angle",
    )

    def __init__(self):
        self.config = int(TwoViewGeometryConfiguration.UNDEFINED)
        self.E = None
        self.F = None
        self.H = None
        self.cam2_from_cam1 = None
        self.inlier_matches = np.zeros((0, 2), dtype=np.uint32)
        self.tri_angle = 0.0

    def invalidate(self):
        self.__init__()

    def __repr__(self):
        return (
            f"TwoViewGeometry(config={TwoViewGeometryConfiguration(self.config).name}, "
            f"num_inliers={len(self.inlier_matches)})"
        )


def _detect_watermark(x1_px, x2_px, inlier_mask, camera1, camera2, options):
    """Watermark = translation-only H inliers concentrated in the border
    (upstream DetectWatermark)."""
    inl = np.asarray(inlier_mask, dtype=bool)
    if inl.sum() == 0:
        return False
    d = x2_px[inl] - x1_px[inl]
    # translational model: median shift, count agreement
    shift = np.median(d, axis=0)
    agree = np.sum(np.sum((d - shift) ** 2, axis=1) <= options.ransac.max_error**2)
    if agree < options.watermark_min_inlier_ratio * inl.sum():
        return False
    bs1x = options.watermark_border_size * camera1.width
    bs1y = options.watermark_border_size * camera1.height
    in_border1 = (
        (x1_px[inl][:, 0] < bs1x)
        | (x1_px[inl][:, 0] > camera1.width - bs1x)
        | (x1_px[inl][:, 1] < bs1y)
        | (x1_px[inl][:, 1] > camera1.height - bs1y)
    )
    return np.mean(in_border1) > options.watermark_min_inlier_ratio


def _estimate_multiple(single_fn, matches, options) -> TwoViewGeometry:
    """MULTIPLE-configuration recovery (ref: two_view_geometry.h:67-77 and
    upstream EstimateMultipleTwoViewGeometries): repeatedly estimate a
    geometry on the remaining matches, peel its inliers off, and continue
    while each new geometry clears min_num_inliers. More than one surviving
    geometry -> config MULTIPLE with the union of inlier matches (the
    scene has several independent rigid motions / planes); exactly one ->
    that geometry; none -> DEGENERATE. Watermark geometries are peeled but
    not collected when multiple_ignore_watermark is set."""
    import copy

    sub = copy.deepcopy(options)
    sub.multiple_models = False
    remaining = matches
    geometries = []
    while len(remaining) >= options.min_num_inliers:
        g = single_fn(remaining, sub)
        if len(g.inlier_matches) < options.min_num_inliers:
            break
        inl = {tuple(m) for m in g.inlier_matches.tolist()}
        keep = np.array(
            [tuple(m) not in inl for m in remaining.tolist()], dtype=bool
        )
        remaining = remaining[keep]
        if (
            g.config == int(TwoViewGeometryConfiguration.WATERMARK)
            and options.multiple_ignore_watermark
        ):
            continue
        geometries.append(g)
    if not geometries:
        out = TwoViewGeometry()
        out.config = int(TwoViewGeometryConfiguration.DEGENERATE)
        return out
    if len(geometries) == 1:
        return geometries[0]
    out = TwoViewGeometry()
    out.config = int(TwoViewGeometryConfiguration.MULTIPLE)
    out.inlier_matches = np.concatenate(
        [g.inlier_matches for g in geometries]
    ).astype(np.uint32)
    # keep the dominant geometry's models for downstream consumers
    out.E, out.F, out.H = (
        geometries[0].E, geometries[0].F, geometries[0].H
    )
    return out


def estimate_calibrated_two_view_geometry(
    camera1, points2D1, camera2, points2D2, matches=None,
    options: TwoViewGeometryOptions = None,
) -> TwoViewGeometry:
    """E + F + H estimation with degeneracy arbitration (ref: :95-123)."""
    if options is None:
        options = TwoViewGeometryOptions()
    points2D1 = np.asarray(points2D1, dtype=np.float64).reshape(-1, 2)
    points2D2 = np.asarray(points2D2, dtype=np.float64).reshape(-1, 2)
    if matches is None:
        if len(points2D1) != len(points2D2):
            raise ValueError("without matches, point arrays must align")
        matches = np.stack(
            [np.arange(len(points2D1)), np.arange(len(points2D1))], axis=1
        )
    matches = np.asarray(matches).reshape(-1, 2)
    if options.multiple_models:
        return _estimate_multiple(
            lambda m, o: estimate_calibrated_two_view_geometry(
                camera1, points2D1, camera2, points2D2, m, o
            ),
            matches, options,
        )
    geometry = TwoViewGeometry()
    if len(matches) < options.min_num_inliers:
        geometry.config = int(TwoViewGeometryConfiguration.DEGENERATE)
        return geometry

    x1_px = points2D1[matches[:, 0]]
    x2_px = points2D2[matches[:, 1]]

    e_res = em.estimate_essential_matrix(
        x1_px, x2_px, camera1, camera2, options.ransac
    )
    f_res = fm.estimate_fundamental_matrix(x1_px, x2_px, options.ransac)
    h_res = hm.estimate_homography_matrix(x1_px, x2_px, options.ransac)

    e_inl = e_res["num_inliers"] if e_res else 0
    f_inl = f_res["num_inliers"] if f_res else 0
    h_inl = h_res["num_inliers"] if h_res else 0

    if max(e_inl, f_inl, h_inl) < options.min_num_inliers:
        geometry.config = int(TwoViewGeometryConfiguration.DEGENERATE)
        return geometry

    best_inl = max(e_inl, f_inl)
    if e_inl >= options.min_num_inliers and e_inl >= options.min_E_F_inlier_ratio * f_inl:
        chosen, mask = e_res, e_res["inliers"]
        geometry.config = int(TwoViewGeometryConfiguration.CALIBRATED)
    elif f_inl >= options.min_num_inliers:
        chosen, mask = f_res, f_res["inliers"]
        geometry.config = int(TwoViewGeometryConfiguration.UNCALIBRATED)
    else:
        chosen, mask = h_res, h_res["inliers"]
        geometry.config = int(TwoViewGeometryConfiguration.PLANAR_OR_PANORAMIC)

    if (
        geometry.config
        in (
            int(TwoViewGeometryConfiguration.CALIBRATED),
            int(TwoViewGeometryConfiguration.UNCALIBRATED),
        )
        and h_inl > options.max_H_inlier_ratio * best_inl
    ):
        geometry.config = int(TwoViewGeometryConfiguration.PLANAR_OR_PANORAMIC)
        if h_res is not None and not options.force_H_use:
            # keep the epipolar inliers (upstream keeps best model's inliers)
            pass

    if e_res is not None:
        geometry.E = e_res["E"]
    if f_res is not None:
        geometry.F = f_res["F"]
    if h_res is not None:
        geometry.H = h_res["H"]

    if options.detect_watermark and _detect_watermark(
        x1_px, x2_px, mask, camera1, camera2, options
    ):
        geometry.config = int(TwoViewGeometryConfiguration.WATERMARK)

    geometry.inlier_matches = matches[np.asarray(mask, dtype=bool)].astype(np.uint32)
    if options.compute_relative_pose:
        estimate_two_view_geometry_pose(
            camera1, points2D1, camera2, points2D2, geometry
        )
    return geometry


def estimate_two_view_geometry(
    camera1, points2D1, camera2, points2D2, matches=None,
    options: TwoViewGeometryOptions = None,
) -> TwoViewGeometry:
    """Uncalibrated entry point (ref: :124-152): F + H only."""
    if options is None:
        options = TwoViewGeometryOptions()
    points2D1 = np.asarray(points2D1, dtype=np.float64).reshape(-1, 2)
    points2D2 = np.asarray(points2D2, dtype=np.float64).reshape(-1, 2)
    if matches is None:
        matches = np.stack(
            [np.arange(len(points2D1)), np.arange(len(points2D1))], axis=1
        )
    matches = np.asarray(matches).reshape(-1, 2)
    if options.multiple_models:
        return _estimate_multiple(
            lambda m, o: estimate_two_view_geometry(
                camera1, points2D1, camera2, points2D2, m, o
            ),
            matches, options,
        )
    geometry = TwoViewGeometry()
    if len(matches) < options.min_num_inliers:
        geometry.config = int(TwoViewGeometryConfiguration.DEGENERATE)
        return geometry
    x1_px = points2D1[matches[:, 0]]
    x2_px = points2D2[matches[:, 1]]
    f_res = fm.estimate_fundamental_matrix(x1_px, x2_px, options.ransac)
    h_res = hm.estimate_homography_matrix(x1_px, x2_px, options.ransac)
    f_inl = f_res["num_inliers"] if f_res else 0
    h_inl = h_res["num_inliers"] if h_res else 0
    if max(f_inl, h_inl) < options.min_num_inliers:
        geometry.config = int(TwoViewGeometryConfiguration.DEGENERATE)
        return geometry
    if h_inl > options.max_H_inlier_ratio * f_inl:
        geometry.config = int(TwoViewGeometryConfiguration.PLANAR_OR_PANORAMIC)
        chosen, mask = h_res, h_res["inliers"]
    else:
        geometry.config = int(TwoViewGeometryConfiguration.UNCALIBRATED)
        chosen, mask = f_res, f_res["inliers"]
    if f_res is not None:
        geometry.F = f_res["F"]
    if h_res is not None:
        geometry.H = h_res["H"]
    if options.detect_watermark and _detect_watermark(
        x1_px, x2_px, mask, camera1, camera2, options
    ):
        geometry.config = int(TwoViewGeometryConfiguration.WATERMARK)
    geometry.inlier_matches = matches[np.asarray(mask, dtype=bool)].astype(np.uint32)
    if options.compute_relative_pose:
        estimate_two_view_geometry_pose(
            camera1, points2D1, camera2, points2D2, geometry
        )
    return geometry


def _pose_recovery_cached(tag, jf, model, x1, x2):
    """Dispatch pose recovery on pow2-padded inputs through the persistent
    executable cache. The inlier count is DATA-DEPENDENT — dispatching at
    the raw count compiled a fresh remote program for nearly every pair
    (measured r5: ~1.5 s/pair, 1514 s of the 1000-image loop-closure
    match+verify stage). Padding to a pow2 bucket with a validity mask
    bounds the signature count to ~8 shapes total."""
    import sys as _sys

    from pycolmap_tpu.ops import quaternion as _q
    from pycolmap_tpu.ops import solvers as _sv
    from pycolmap_tpu.utils import aot_cache

    n_real = len(x1)
    Np = max(16, 1 << (n_real - 1).bit_length())
    x1p = np.zeros((Np, 2), np.float32)
    x2p = np.zeros((Np, 2), np.float32)
    x1p[:n_real] = x1
    x2p[:n_real] = x2
    maskp = np.zeros(Np, bool)
    maskp[:n_real] = True
    salt = aot_cache.source_salt(epipolar, _sv, _q)
    return aot_cache.cached_call(
        jf, tag, salt, {},
        jnp.asarray(model, dtype=jnp.float32), jnp.asarray(x1p),
        jnp.asarray(x2p), jnp.asarray(maskp),
    )


_pose_E_jit = None
_pose_H_jit = None


def estimate_two_view_geometry_pose(
    camera1, points2D1, camera2, points2D2, geometry: TwoViewGeometry
) -> bool:
    """Recover cam2_from_cam1 + mean tri angle for an estimated geometry
    (ref: :153-160; upstream EstimateTwoViewGeometryPose)."""
    global _pose_E_jit, _pose_H_jit
    if len(geometry.inlier_matches) == 0:
        return False
    points2D1 = np.asarray(points2D1, dtype=np.float64).reshape(-1, 2)
    points2D2 = np.asarray(points2D2, dtype=np.float64).reshape(-1, 2)
    m = geometry.inlier_matches
    x1 = np.asarray(camera1.cam_from_img(points2D1[m[:, 0]]), dtype=np.float32)
    x2 = np.asarray(camera2.cam_from_img(points2D2[m[:, 1]]), dtype=np.float32)
    cfg = geometry.config
    C = TwoViewGeometryConfiguration
    if cfg in (int(C.CALIBRATED), int(C.UNCALIBRATED)):
        if cfg == int(C.CALIBRATED) and geometry.E is not None:
            E = np.asarray(geometry.E, dtype=np.float32)
        else:
            # build E from F: E = K2^T F K1
            K1 = camera1.calibration_matrix()
            K2 = camera2.calibration_matrix()
            E = np.asarray(K2.T @ geometry.F @ K1, dtype=np.float32)
        if _pose_E_jit is None:
            import jax

            _pose_E_jit = jax.jit(epipolar.pose_from_essential)
        quat, trans, X, front = _pose_recovery_cached(
            "pose_from_E", _pose_E_jit, E, x1, x2
        )
    elif cfg in (int(C.PLANAR), int(C.PANORAMIC), int(C.PLANAR_OR_PANORAMIC)):
        K1 = camera1.calibration_matrix()
        K2 = camera2.calibration_matrix()
        Hn = np.linalg.solve(
            K2, np.asarray(geometry.H, np.float64) @ K1
        ).astype(np.float32)
        if _pose_H_jit is None:
            import jax

            _pose_H_jit = jax.jit(epipolar.pose_from_homography)
        quat, trans, n, X, front = _pose_recovery_cached(
            "pose_from_H", _pose_H_jit, Hn, x1, x2
        )
        # refine config: pure rotation -> PANORAMIC
        if float(jnp.linalg.norm(trans)) < 1e-6:
            geometry.config = int(C.PANORAMIC)
        elif cfg == int(C.PLANAR_OR_PANORAMIC):
            geometry.config = int(C.PLANAR)
    else:
        return False

    quat = np.asarray(quat, dtype=np.float64)
    trans_np = np.asarray(trans, dtype=np.float64)
    norm = np.linalg.norm(trans_np)
    if norm > 1e-12:
        trans_np = trans_np / norm
    geometry.cam2_from_cam1 = Rigid3d(
        Rotation3d(np.array([quat[1], quat[2], quat[3], quat[0]])), trans_np
    )
    # mean triangulation angle over front points
    X = np.asarray(X, dtype=np.float64)
    front = np.asarray(front, dtype=bool)
    if front.sum() > 0:
        c1 = np.zeros(3)
        c2 = -np.asarray(
            Rotation3d(
                np.array([quat[1], quat[2], quat[3], quat[0]])
            ).matrix().T
            @ trans_np
        )
        Xf = X[front]
        r1 = Xf - c1
        r2 = Xf - c2
        cosang = np.sum(r1 * r2, axis=1) / np.maximum(
            np.linalg.norm(r1, axis=1) * np.linalg.norm(r2, axis=1), 1e-12
        )
        geometry.tri_angle = float(np.median(np.arccos(np.clip(cosang, -1, 1))))
    return True
