"""Integration test: incremental mapping end-to-end from a synthetic database
(the SURVEY.md §4.4 integration tier, with ground-truth comparison via
compare_reconstructions semantics)."""

import numpy as np
import pytest

from pycolmap_tpu.estimators import compare_reconstructions
from pycolmap_tpu.estimators.two_view_geometry import (
    TwoViewGeometry,
    TwoViewGeometryConfiguration,
)
from pycolmap_tpu.geometry import Rigid3d, Rotation3d
from pycolmap_tpu.pipeline.sfm import (
    IncrementalPipelineOptions,
    incremental_mapping,
)
from pycolmap_tpu.scene import Camera, Database, DatabaseTransaction, Image


def make_synthetic_database(
    db_path, num_images=8, num_points=300, pixel_noise=0.4, seed=0,
    mode="orbit", match_overlap=None, cameras=None,
):
    """Ground-truth scene written as a COLMAP database: cameras, images,
    keypoints (+noise), and verified two-view geometries from true matches.

    mode="orbit": all cameras see the same point cloud (dense pair graph);
    mode="sequential": forward-moving trajectory over an extended scene —
    points are only visible from a window of frames and matching is
    restricted to |i - j| <= match_overlap (C4-style sparse graph);
    mode="loop": closed circular trajectory looking outward at a point
    ring — the last frames revisit the first frames' view, but matching
    stays |i - j| <= match_overlap (NO wrap-around), so closing the loop
    is the retrieval/loop-detection machinery's job (C4/C5 loop-closure
    demos). Descriptors are anchored per 3D point (+noise), so descriptor
    matching and vocab-tree retrieval genuinely work on these databases.
    """
    rng = np.random.default_rng(seed)
    # cameras: optional list of Camera objects; image i uses camera
    # i % len(cameras) (mixed-camera-model scenes, VERDICT r4 missing #1)
    if cameras is None:
        cameras = [Camera.create(0, "SIMPLE_PINHOLE", 600.0, 640, 480)]

    poses = []
    if mode == "loop":
        step = 0.3
        R_cam = num_images * step / (2 * np.pi)
        # radial DEPTH BAND, not a thin ring: near points (4) pin the
        # short-baseline pairs, deep points (up to 20) stay visible across
        # wider camera separations so the quadratic-overlap pairs have
        # real correspondences (a thin ring at depth 5 limits the shared
        # arc to ~±5 deg and the chain stays floppy)
        th = rng.uniform(0, 2 * np.pi, num_points)
        R_pts = R_cam + rng.uniform(4.0, 20.0, num_points)
        points = np.stack(
            [
                R_pts * np.cos(th),
                rng.uniform(-2.0, 2.0, num_points),
                R_pts * np.sin(th),
            ],
            axis=1,
        )
        for i in range(num_images):
            phi = 2 * np.pi * i / num_images
            center = np.array(
                [R_cam * np.cos(phi), 0.1 * np.sin(0.5 * i),
                 R_cam * np.sin(phi)]
            )
            fwd = np.array([np.cos(phi), 0.0, np.sin(phi)])  # outward
            up = np.array([0.0, -1.0, 0.0])
            right = np.cross(up, fwd)
            right /= np.linalg.norm(right)
            up2 = np.cross(fwd, right)
            R_wc = np.stack([right, up2, fwd], axis=0)
            poses.append(Rigid3d(Rotation3d(R_wc), -R_wc @ center))
    elif mode == "sequential":
        step = 0.3
        span = num_images * step + 5.0
        points = np.stack(
            [
                rng.uniform(-1.0, span, num_points),
                rng.uniform(-2.0, 2.0, num_points),
                rng.uniform(4.0, 7.0, num_points),
            ],
            axis=1,
        )
        for i in range(num_images):
            # gentle yaw oscillation so poses are not a degenerate line
            yaw = 0.08 * np.sin(0.3 * i)
            c, s = np.cos(yaw), np.sin(yaw)
            R_wc = np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]])
            center = np.array([i * step, 0.1 * np.sin(0.5 * i), 0.0])
            poses.append(Rigid3d(Rotation3d(R_wc), -R_wc @ center))
    else:
        target = np.array([0.0, 0.0, 5.0])
        points = rng.uniform(-1.5, 1.5, (num_points, 3)) + target
        for i in range(num_images):
            theta = -0.6 + i * (1.2 / max(num_images - 1, 1))
            center = target + 5.0 * np.array(
                [np.sin(theta), 0.15 * np.sin(2 * theta), -np.cos(theta)]
            )
            fwd = target - center
            fwd /= np.linalg.norm(fwd)
            up = np.array([0.0, -1.0, 0.0])
            right = np.cross(up, fwd)
            right /= np.linalg.norm(right)
            up2 = np.cross(fwd, right)
            R_wc = np.stack([right, up2, fwd], axis=0)
            poses.append(Rigid3d(Rotation3d(R_wc), -R_wc @ center))

    # per-image keypoints = projections of visible points (+ noise), with a
    # random permutation so keypoint index != point index
    kp_xy = []
    kp_pid = []
    for i in range(num_images):
        cam_i = cameras[i % len(cameras)]
        p_cam = poses[i] * points
        uv = p_cam[:, :2] / p_cam[:, 2:]
        xy = cam_i.img_from_cam(uv)
        vis = (
            (p_cam[:, 2] > 0.2)
            & (xy[:, 0] >= 0) & (xy[:, 0] < cam_i.width)
            & (xy[:, 1] >= 0) & (xy[:, 1] < cam_i.height)
        )
        ids = np.nonzero(vis)[0]
        perm = rng.permutation(len(ids))
        ids = ids[perm]
        kp_pid.append(ids)
        kp_xy.append(xy[ids] + rng.normal(0, pixel_noise, (len(ids), 2)))

    db = Database(db_path)
    with DatabaseTransaction(db):
        cam_db_ids = [db.write_camera(c) for c in cameras]
        cam_id = cam_db_ids[0]
        image_ids = []
        for i in range(num_images):
            img = Image(
                name=f"img{i:03d}.jpg",
                camera_id=cam_db_ids[i % len(cameras)],
            )
            image_ids.append(db.write_image(img))
        # descriptors anchored per 3D point: observations of the same point
        # get near-identical descriptors, so matching/retrieval are real
        point_desc = rng.integers(20, 235, (num_points, 128))
        for i in range(num_images):
            db.write_keypoints(image_ids[i], kp_xy[i].astype(np.float32))
            d = point_desc[kp_pid[i]] + rng.integers(
                -4, 5, (len(kp_pid[i]), 128)
            )
            db.write_descriptors(
                image_ids[i], np.clip(d, 0, 255).astype(np.uint8)
            )
        # verified pairs from ground-truth correspondences; quadratic
        # spacings mirror the reference sequential-matching default
        # (SequentialMatchingOptions.quadratic_overlap=True,
        # ref match_features.h:114-120) — without them a long chain is
        # floppy and loop closure bends into a local minimum
        quad = set()
        if match_overlap is not None:
            k = 1
            while (1 << k) <= 4 * match_overlap:
                quad.add(1 << k)
                k += 1
        for i in range(num_images):
            for j in range(i + 1, num_images):
                if (
                    match_overlap is not None
                    and j - i > match_overlap
                    and (j - i) not in quad
                ):
                    continue
                common, ii, jj = np.intersect1d(
                    kp_pid[i], kp_pid[j], return_indices=True
                )
                if len(common) < 30:
                    continue
                matches = np.stack([ii, jj], axis=1).astype(np.uint32)
                g = TwoViewGeometry()
                g.config = int(TwoViewGeometryConfiguration.CALIBRATED)
                g.inlier_matches = matches
                rel = poses[j] * poses[i].inverse()
                g.E = rel.essential_matrix()
                g.cam2_from_cam1 = rel
                db.write_two_view_geometry(image_ids[i], image_ids[j], g)
    db.close()

    # ground-truth reconstruction for comparison
    from pycolmap_tpu.scene import Reconstruction, Track, TrackElement

    gt = Reconstruction()
    for c, cid in zip(cameras, cam_db_ids):
        gt.add_camera(Camera(cid, c.model, c.width, c.height, c.params))
    for i in range(num_images):
        img = Image(
            name=f"img{i:03d}.jpg",
            camera_id=cam_db_ids[i % len(cameras)],
            id=image_ids[i],
        )
        img.cam_from_world = poses[i]
        img.set_keypoints(kp_xy[i])
        img.registered = True
        gt.add_image(img)
    return gt


@pytest.mark.slow
def test_incremental_mapping_synthetic(tmp_path):
    gt = make_synthetic_database(tmp_path / "db.db", num_images=8, num_points=300)
    options = IncrementalPipelineOptions()
    options.min_model_size = 4
    options.extract_colors = False
    options.ba_refine_principal_point = False
    recs = incremental_mapping(
        tmp_path / "db.db", tmp_path, tmp_path / "sparse", options
    )
    assert len(recs) >= 1
    rec = recs[0]
    assert rec.num_reg_images >= 7
    assert rec.num_points3D > 150
    err = rec.compute_mean_reprojection_error()
    assert err < 1.0
    rec.check()

    # pose accuracy vs ground truth (Sim3-aligned)
    result = compare_reconstructions(rec, gt)
    assert result is not None
    rot_errs = [e.rotation_error_deg for e in result["errors"]]
    assert np.median(rot_errs) < 0.5

    # model written to disk
    from pycolmap_tpu.scene import Reconstruction

    rec2 = Reconstruction(tmp_path / "sparse" / "0")
    assert rec2.num_reg_images == rec.num_reg_images
