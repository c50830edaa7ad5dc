"""Multi-model reconstruction: two disconnected components -> two models."""

import numpy as np
import pytest

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


def make_two_component_database(db_path, num_per_side=5, num_points=150, seed=0):
    """Two disconnected camera clusters observing disjoint point clouds."""
    rng = np.random.default_rng(seed)
    cam = Camera.create(0, "SIMPLE_PINHOLE", 600.0, 640, 480)
    db = Database(db_path)
    with DatabaseTransaction(db):
        cam_id = db.write_camera(cam)
        all_ids = []
        for comp in range(2):
            target = np.array([comp * 100.0, 0.0, 5.0])
            points = rng.uniform(-1.5, 1.5, (num_points, 3)) + target
            poses = []
            for i in range(num_per_side):
                theta = -0.5 + i * (1.0 / max(num_per_side - 1, 1))
                center = target + 5.0 * np.array(
                    [np.sin(theta), 0.1, -np.cos(theta)]
                )
                fwd = target - center
                fwd /= np.linalg.norm(fwd)
                up = np.array([0.0, -1.0, 0.0])
                right = np.cross(up, fwd)
                right /= np.linalg.norm(right)
                up2 = np.cross(fwd, right)
                R_wc = np.stack([right, up2, fwd], axis=0)
                poses.append(Rigid3d(Rotation3d(R_wc), -R_wc @ center))
            kp_xy, kp_pid, ids = [], [], []
            for i, pose in enumerate(poses):
                p_cam = pose * points
                uv = p_cam[:, :2] / p_cam[:, 2:]
                xy = cam.img_from_cam(uv)
                vis = (
                    (p_cam[:, 2] > 0.2)
                    & (xy[:, 0] >= 0) & (xy[:, 0] < 640)
                    & (xy[:, 1] >= 0) & (xy[:, 1] < 480)
                )
                sel = np.nonzero(vis)[0]
                img = Image(
                    name=f"c{comp}_img{i:02d}.jpg", camera_id=cam_id
                )
                iid = db.write_image(img)
                ids.append(iid)
                kp_pid.append(sel)
                kps = xy[sel] + rng.normal(0, 0.3, (len(sel), 2))
                db.write_keypoints(iid, kps.astype(np.float32))
                db.write_descriptors(
                    iid,
                    rng.integers(0, 255, (len(sel), 128)).astype(np.uint8),
                )
            for i in range(num_per_side):
                for j in range(i + 1, num_per_side):
                    common, ii, jj = np.intersect1d(
                        kp_pid[i], kp_pid[j], return_indices=True
                    )
                    if len(common) < 30:
                        continue
                    g = TwoViewGeometry()
                    g.config = int(TwoViewGeometryConfiguration.CALIBRATED)
                    g.inlier_matches = np.stack([ii, jj], axis=1).astype(
                        np.uint32
                    )
                    rel = poses[j] * poses[i].inverse()
                    g.E = rel.essential_matrix()
                    g.cam2_from_cam1 = rel
                    db.write_two_view_geometry(ids[i], ids[j], g)
            all_ids.append(ids)
    db.close()
    return all_ids


@pytest.mark.slow
def test_two_disconnected_components(tmp_path):
    make_two_component_database(tmp_path / "db.db")
    options = IncrementalPipelineOptions()
    options.min_model_size = 3
    options.extract_colors = False
    options.multiple_models = True
    options.mapper.init_min_num_inliers = 30
    options.mapper.abs_pose_min_num_inliers = 15
    recs = incremental_mapping(
        tmp_path / "db.db", tmp_path, tmp_path / "sparse", options
    )
    assert len(recs) == 2
    sizes = sorted(r.num_reg_images for r in recs.values())
    assert sizes[0] >= 3 and sizes[1] >= 3
    # the two models must not share images
    ids0 = set(recs[0].reg_image_ids)
    ids1 = set(recs[1].reg_image_ids)
    assert not (ids0 & ids1)
