"""Direct tests of remaining pipeline entry points: triangulate_points,
bundle_adjustment, undistort_images, match_vocabtree."""

import numpy as np
import pytest
from PIL import Image as PILImage

from pycolmap_tpu.pipeline import (
    IncrementalPipelineOptions,
    bundle_adjustment,
    match_vocabtree,
    triangulate_points,
    undistort_images,
)
from pycolmap_tpu.pipeline.match_features import VocabTreeMatchingOptions
from pycolmap_tpu.scene import Reconstruction

from test_incremental_mapping import make_synthetic_database
from test_pipeline_matchers import make_feature_db
from test_scene import build_synthetic_reconstruction


def test_triangulate_points_with_known_poses(tmp_path):
    gt = make_synthetic_database(tmp_path / "db.db", num_images=6, num_points=200)
    # model with ground-truth poses but no 3D points
    rec = Reconstruction()
    for cam in gt.cameras.values():
        rec.add_camera(cam)
    import copy

    for iid, img in gt.images.items():
        img2 = copy.deepcopy(img)
        rec.add_image(img2)
    out = triangulate_points(
        rec, tmp_path / "db.db", tmp_path, tmp_path / "tri",
        clear_points=True,
    )
    assert out.num_points3D > 100
    assert out.compute_mean_reprojection_error() < 1.5
    out.check()


def test_bundle_adjustment_pipeline(tmp_path):
    rec = build_synthetic_reconstruction(num_images=5, num_points=120, seed=7)
    rng = np.random.default_rng(0)
    for pt in rec.points3D.values():
        pt.xyz = pt.xyz + rng.normal(0, 0.01, 3)
    err_before = rec.compute_mean_reprojection_error()
    from pycolmap_tpu.sfm.bundle_adjustment import BundleAdjustmentOptions

    opts = BundleAdjustmentOptions()
    opts.refine_focal_length = False
    opts.refine_extra_params = False
    opts.max_num_iterations = 30
    summary = bundle_adjustment(rec, opts)
    assert summary is not None
    assert rec.compute_mean_reprojection_error() < err_before


def test_undistort_images_workspace(tmp_path):
    rec = build_synthetic_reconstruction(num_images=3, num_points=50)
    # give the camera some distortion and matching synthetic image files
    rec.cameras[1].params[3] = 0.05
    (tmp_path / "images").mkdir()
    rng = np.random.default_rng(0)
    for img in rec.images.values():
        arr = rng.integers(0, 255, (480, 640, 3)).astype(np.uint8)
        PILImage.fromarray(arr).save(tmp_path / "images" / img.name)
    rec.write_binary(tmp_path / "sparse_in")
    out = undistort_images(
        tmp_path / "dense", tmp_path / "sparse_in", tmp_path / "images"
    )
    assert (tmp_path / "dense" / "sparse" / "cameras.bin").exists()
    und = Reconstruction(tmp_path / "dense" / "sparse")
    assert all(c.model == "PINHOLE" for c in und.cameras.values())
    imgs = list((tmp_path / "dense" / "images").glob("*.jpg"))
    assert len(imgs) == 3


@pytest.mark.slow
def test_match_vocabtree(tmp_path):
    db_path = tmp_path / "db.db"
    make_feature_db(db_path, num_images=5)
    opts = VocabTreeMatchingOptions()
    opts.num_images = 3
    n = match_vocabtree(db_path, matching_options=opts)
    from pycolmap_tpu.scene import Database

    db = Database(db_path)
    assert db.num_verified_image_pairs >= 2
    db.close()
