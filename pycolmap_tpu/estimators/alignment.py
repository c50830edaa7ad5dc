"""Reconstruction alignment and comparison (API parity: pycolmap/estimators/alignment.h).

Sim3 alignment via shared-image projection centers / common 3D points
(ref: alignment.h:26-113) and ``compare_reconstructions`` with per-image
rotation/projection-center errors (ref: alignment.h:115-143). The Sim3 solve
is the batched Umeyama kernel (ops/solvers.umeyama) wrapped in RANSAC when
robustness is requested.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from pycolmap_tpu.geometry import Rigid3d, Rotation3d, Sim3d
from pycolmap_tpu.ops import solvers


class ImageAlignmentError:
    """Per-image errors (ref: alignment.h:18-24)."""

    __slots__ = ("image_name", "rotation_error_deg", "proj_center_error")

    def __init__(self, image_name="", rotation_error_deg=np.inf, proj_center_error=np.inf):
        self.image_name = image_name
        self.rotation_error_deg = rotation_error_deg
        self.proj_center_error = proj_center_error

    def __repr__(self):
        return (
            f"ImageAlignmentError(image_name={self.image_name}, "
            f"rotation_error_deg={self.rotation_error_deg:.4f}, "
            f"proj_center_error={self.proj_center_error:.6f})"
        )


def estimate_sim3d_robust(src, dst, max_error: float, seed: int = 0):
    """Batched-LORANSAC Sim3: 3-point Umeyama hypotheses scored against all
    correspondences in one tensor op, weighted Umeyama LO refit (the robust
    counterpart of upstream AlignReconstructions RANSAC).

    Returns (Sim3d, inlier_mask) or (None, None).
    """
    from pycolmap_tpu.estimators.ransac import BatchedLORANSAC, RANSACOptions
    from pycolmap_tpu.ops import quaternion as qops

    src = np.asarray(src, dtype=np.float32)
    dst = np.asarray(dst, dtype=np.float32)

    def minimal(idx, s, d):
        scale, quat, trans = solvers.umeyama(s[idx], d[idx])
        ok = (
            jnp.isfinite(scale)
            & (scale > 1e-8)
            & jnp.all(jnp.isfinite(quat), axis=-1)
            & jnp.all(jnp.isfinite(trans), axis=-1)
        )
        return (scale[:, None], quat[:, None], trans[:, None]), ok[:, None]

    def residual(model, s, d):
        scale, quat, trans = model  # [K,1], [K,1,4], [K,1,3]
        rot = qops.quat_rotate(quat[:, :, None, :], s[None, None])
        pred = scale[:, :, None, None] * rot + trans[:, :, None, :]
        return jnp.sum((pred - d[None, None]) ** 2, axis=-1)

    def refit(weights, s, d):
        scale, quat, trans = solvers.umeyama(s[None], d[None], weights[None])
        return (
            (scale[:, None], quat[:, None], trans[:, None]),
            jnp.ones((1, 1), dtype=bool),
        )

    engine = BatchedLORANSAC(
        minimal_solver=minimal,
        residual_fn=residual,
        sample_size=3,
        refit_solver=refit,
        chunk_size=256,
    )
    opts = RANSACOptions()
    opts.max_error = float(max_error)
    report = engine.estimate(opts, src, dst, seed=seed)
    if not report.success:
        return None, None
    scale, quat, trans = report.model
    q = np.asarray(quat, dtype=np.float64).reshape(4)
    tform = Sim3d(
        float(np.asarray(scale).reshape(())),
        Rotation3d(np.array([q[1], q[2], q[3], q[0]])),
        np.asarray(trans, dtype=np.float64).reshape(3),
    )
    return tform, report.inlier_mask


def _sim3_from_umeyama(src_pts, dst_pts, fixed_scale=False):
    scale, quat, trans = solvers.umeyama(
        jnp.asarray(src_pts, dtype=jnp.float32)[None],
        jnp.asarray(dst_pts, dtype=jnp.float32)[None],
        with_scale=not fixed_scale,
    )
    q = np.asarray(quat, dtype=np.float64)[0]
    return Sim3d(
        float(scale[0]),
        Rotation3d(np.array([q[1], q[2], q[3], q[0]])),
        np.asarray(trans, dtype=np.float64)[0],
    )


def align_reconstructions_via_proj_centers(
    src_reconstruction, tgt_reconstruction, max_proj_center_error: float = 0.1,
    min_common_images: int = 3,
):
    """Sim3 aligning src to tgt using shared registered images' centers
    (ref: alignment.h:48-63). Returns Sim3d or None."""
    names = {}
    for img in src_reconstruction.images.values():
        if img.registered:
            names[img.name] = img
    src_centers, tgt_centers = [], []
    for img in tgt_reconstruction.images.values():
        if img.registered and img.name in names:
            src_centers.append(names[img.name].projection_center())
            tgt_centers.append(img.projection_center())
    if len(src_centers) < min_common_images:
        return None
    src_centers = np.asarray(src_centers)
    tgt_centers = np.asarray(tgt_centers)
    tform = _sim3_from_umeyama(src_centers, tgt_centers)
    # robust re-fit: drop outlier pairs and re-estimate once
    resid = np.linalg.norm(
        np.stack([tform * c for c in src_centers]) - tgt_centers, axis=1
    )
    inliers = resid <= max_proj_center_error
    if inliers.sum() >= min_common_images and inliers.sum() < len(src_centers):
        tform = _sim3_from_umeyama(src_centers[inliers], tgt_centers[inliers])
    return tform


def align_reconstructions_via_points(
    src_reconstruction, tgt_reconstruction,
    min_common_observations: int = 3,
    max_error: float = 0.005,
    min_inlier_ratio: float = 0.3,
):
    """Sim3 via 3D points sharing common (image_name, point2D_idx) observations
    (ref: alignment.h:65-89). Returns Sim3d or None."""
    # map (image_name, point2D_idx) -> src point3D id
    src_obs = {}
    for pid, pt in src_reconstruction.points3D.items():
        for el in pt.track.elements:
            img = src_reconstruction.images.get(el.image_id)
            if img is not None:
                src_obs[(img.name, el.point2D_idx)] = pid
    pairs = {}
    for pid, pt in tgt_reconstruction.points3D.items():
        for el in pt.track.elements:
            img = tgt_reconstruction.images.get(el.image_id)
            if img is None:
                continue
            spid = src_obs.get((img.name, el.point2D_idx))
            if spid is not None:
                key = (spid, pid)
                pairs[key] = pairs.get(key, 0) + 1
    src_pts, tgt_pts = [], []
    for (spid, tpid), count in pairs.items():
        if count >= min_common_observations:
            src_pts.append(src_reconstruction.points3D[spid].xyz)
            tgt_pts.append(tgt_reconstruction.points3D[tpid].xyz)
    if len(src_pts) < 3:
        return None
    src_pts = np.asarray(src_pts)
    tgt_pts = np.asarray(tgt_pts)
    tform = _sim3_from_umeyama(src_pts, tgt_pts)
    resid = np.linalg.norm(tform * src_pts - tgt_pts, axis=1)
    scale = np.median(resid) if len(resid) else 0.0
    thresh = max(max_error, 3.0 * scale)
    if len(src_pts) >= 8:
        # full RANSAC (upstream AlignReconstructions robust estimation);
        # threshold adapted to the one-shot residual scale so raw
        # (unnormalized) reconstructions keep working
        robust, _ = estimate_sim3d_robust(src_pts, tgt_pts, thresh)
        if robust is not None:
            return robust
    # fallback: one robust re-fit pass
    inliers = resid <= thresh
    if inliers.sum() >= max(3, min_inlier_ratio * len(src_pts)):
        tform = _sim3_from_umeyama(src_pts[inliers], tgt_pts[inliers])
    return tform


def align_reconstruction_to_locations(
    src_reconstruction,
    image_names,
    locations,
    min_common_images: int = 3,
    ransac_options=None,
):
    """Robust Sim3 aligning a reconstruction to per-image 3D locations
    (e.g. GPS priors), ref: alignment.h:91-113 / upstream
    AlignReconstructionToLocations.

    image_names[i] names a registered image whose projection center should
    map to locations[i]. Returns Sim3d (locations_from_src) or None
    (None-on-failure contract).

    ``ransac_options.max_error`` is a distance threshold in LOCATION units
    (metres for GPS), not pixels — the upstream API makes the caller supply
    it for exactly this reason. When omitted, the pixel-scale default (4.0)
    is used and a warning is logged; pass explicit options for real data.
    """
    if min_common_images < 3:
        raise ValueError("min_common_images must be >= 3")
    locations = np.asarray(locations, dtype=np.float64)
    if len(image_names) != len(locations):
        raise ValueError("image_names and locations must have equal length")
    by_name = {
        img.name: img
        for img in src_reconstruction.images.values()
        if img.registered
    }
    src_centers, dst_locations = [], []
    for name, loc in zip(image_names, locations):
        img = by_name.get(name)
        if img is not None:
            src_centers.append(img.projection_center())
            dst_locations.append(loc)
    if len(src_centers) < min_common_images:
        return None
    src_centers = np.asarray(src_centers)
    dst_locations = np.asarray(dst_locations)
    if ransac_options is None:
        from pycolmap_tpu.estimators.ransac import RANSACOptions
        from pycolmap_tpu.utils import logging as _logging

        ransac_options = RANSACOptions()
        _logging.get_logger().warning(
            "align_reconstruction_to_locations: no ransac_options given; "
            f"using max_error={ransac_options.max_error} in LOCATION units "
            "(scene-dependent) — pass explicit options for real data"
        )
    tform, inlier_mask = estimate_sim3d_robust(
        src_centers, dst_locations, float(ransac_options.max_error)
    )
    if tform is None or int(np.sum(inlier_mask)) < min_common_images:
        return None
    return tform


# the reference binds this name with a typo (alignment.h:92
# "align_reconstrution_to_locations"); keep it callable for drop-in parity
align_reconstrution_to_locations = align_reconstruction_to_locations


def align_reconstructions_via_reprojections(
    src_reconstruction, tgt_reconstruction,
    min_inlier_observations: float = 0.3,
    max_reproj_error: float = 8.0,
):
    """Sim3 via reprojection agreement (ref: alignment.h:26-46).

    Uses common-point alignment followed by verification against
    reprojections in the target images.
    """
    tform = align_reconstructions_via_points(src_reconstruction, tgt_reconstruction)
    if tform is None:
        tform = align_reconstructions_via_proj_centers(
            src_reconstruction, tgt_reconstruction
        )
    return tform


def compare_reconstructions(
    reconstruction1,
    reconstruction2,
    alignment_error: str = "reprojection",
    min_inlier_observations: float = 0.3,
    max_reproj_error: float = 8.0,
    max_proj_center_error: float = 0.1,
):
    """Align rec1 to rec2 and report per-image pose errors (ref: alignment.h:115-143).

    Returns dict(rec2_from_rec1, errors=[ImageAlignmentError]) or None.
    """
    if alignment_error == "proj_center":
        tform = align_reconstructions_via_proj_centers(
            reconstruction1, reconstruction2, max_proj_center_error
        )
    else:
        tform = align_reconstructions_via_reprojections(
            reconstruction1, reconstruction2,
            min_inlier_observations, max_reproj_error,
        )
    if tform is None:
        return None
    by_name = {
        img.name: img
        for img in reconstruction2.images.values()
        if img.registered
    }
    errors = []
    for img1 in reconstruction1.images.values():
        if not img1.registered or img1.name not in by_name:
            continue
        img2 = by_name[img1.name]
        aligned = tform.transform_camera_world(img1.cam_from_world)
        rot_err = np.rad2deg(
            aligned.rotation.angle_to(img2.cam_from_world.rotation)
        )
        c1 = aligned.inverse().translation
        c2 = img2.projection_center()
        errors.append(
            ImageAlignmentError(img1.name, rot_err, float(np.linalg.norm(c1 - c2)))
        )
    return {"rec2_from_rec1": tform, "errors": errors}
