"""Pipeline matcher strategies (sequential / spatial / vocabtree) and
mapping resume, on small synthetic databases."""

import numpy as np
import pytest

from pycolmap_tpu.geometry import Rigid3d, Rotation3d
from pycolmap_tpu.pipeline.match_features import (
    SequentialMatchingOptions,
    SpatialMatchingOptions,
    match_sequential,
    match_spatial,
)
from pycolmap_tpu.scene import Camera, Database, Image


def make_feature_db(db_path, num_images=6, with_priors=False, seed=0):
    """Images along a line; neighbors share planted descriptors, so matching
    + geometric verification should link consecutive images."""
    rng = np.random.default_rng(seed)
    cam = Camera.create(0, "SIMPLE_PINHOLE", 500.0, 640, 480)
    db = Database(db_path)
    cam_id = db.write_camera(cam)
    # world points visible from consecutive views
    X = rng.uniform(-2, 2, (400, 3)) + [0, 0, 6]
    descs_global = rng.integers(10, 250, (400, 128)).astype(np.uint8)
    ids = []
    for i in range(num_images):
        pose = Rigid3d(Rotation3d(), np.array([0.8 * i, 0.0, 0.0]))
        Xc = pose * X
        uv = Xc[:, :2] / Xc[:, 2:]
        xy = cam.img_from_cam(uv)
        vis = (
            (Xc[:, 2] > 1)
            & (xy[:, 0] > 0) & (xy[:, 0] < 640)
            & (xy[:, 1] > 0) & (xy[:, 1] < 480)
        )
        sel = np.nonzero(vis)[0]
        img = Image(name=f"im{i:02d}.png", camera_id=cam_id)
        if with_priors:
            img.cam_from_world_prior = pose
        iid = db.write_image(img)
        ids.append(iid)
        kps = xy[sel].astype(np.float32) + rng.normal(0, 0.3, (len(sel), 2))
        db.write_keypoints(iid, kps.astype(np.float32))
        noise = rng.integers(-3, 3, (len(sel), 128))
        db.write_descriptors(
            iid, np.clip(descs_global[sel] + noise, 0, 255).astype(np.uint8)
        )
    db.commit()
    db.close()
    return ids


def test_match_sequential(tmp_path):
    db_path = tmp_path / "db.db"
    make_feature_db(db_path)
    opts = SequentialMatchingOptions()
    opts.overlap = 2
    n = match_sequential(db_path, matching_options=opts)
    db = Database(db_path)
    assert db.num_verified_image_pairs >= 4
    # consecutive pairs must be verified with decent inlier counts
    m = db.read_two_view_geometry(1, 2)
    assert m is not None and len(m.inlier_matches) > 30
    db.close()


def test_match_spatial(tmp_path):
    db_path = tmp_path / "db.db"
    make_feature_db(db_path, with_priors=True)
    opts = SpatialMatchingOptions()
    opts.max_num_neighbors = 2
    opts.max_distance = 2.0
    n = match_spatial(db_path, matching_options=opts)
    db = Database(db_path)
    assert db.num_verified_image_pairs >= 3
    db.close()


def test_incremental_mapping_resume(tmp_path):
    from test_incremental_mapping import make_synthetic_database

    from pycolmap_tpu.pipeline.sfm import (
        IncrementalPipelineOptions,
        incremental_mapping,
    )

    make_synthetic_database(tmp_path / "db.db", num_images=6, num_points=200)
    options = IncrementalPipelineOptions()
    options.min_model_size = 4
    options.extract_colors = False
    # first run restricted to a subset of images
    options.image_names = [f"img{i:03d}.jpg" for i in range(4)]
    recs = incremental_mapping(
        tmp_path / "db.db", tmp_path, tmp_path / "sparse1", options
    )
    n_first = recs[0].num_reg_images
    assert n_first >= 3

    # resume with all images from the previous model
    options2 = IncrementalPipelineOptions()
    options2.min_model_size = 4
    options2.extract_colors = False
    recs2 = incremental_mapping(
        tmp_path / "db.db", tmp_path, tmp_path / "sparse2", options2,
        input_path=str(tmp_path / "sparse1" / "0"),
    )
    assert recs2[0].num_reg_images > n_first
