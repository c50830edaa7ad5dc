"""Breadth coverage: options machinery, exporters, retrieval, rig pose,
homography decomposition, undistortion, native traversal, logging."""

import numpy as np
import pytest

from pycolmap_tpu.estimators.generalized_absolute_pose import (
    rig_absolute_pose_estimation,
)
from pycolmap_tpu.estimators.homography_decomposition import (
    homography_decomposition,
)
from pycolmap_tpu.geometry import Rigid3d, Rotation3d
from pycolmap_tpu.scene import Camera
from pycolmap_tpu.scene.exporters import (
    export_bundler,
    export_CAM,
    export_NVM,
    export_VRML,
)
from pycolmap_tpu.utils.options import BaseOptions, options_dataclass

from test_scene import build_synthetic_reconstruction


class TestOptionsMachinery:
    def test_dict_constructor_and_merge(self):
        from pycolmap_tpu.estimators import RANSACOptions

        o = RANSACOptions({"max_error": 2.0})
        assert o.max_error == 2.0
        assert o.confidence == 0.9999  # default preserved
        o.mergedict({"min_num_trials": 50})
        assert o.min_num_trials == 50
        with pytest.raises(AttributeError):
            o.mergedict({"nope": 1})

    def test_nested_merge(self):
        from pycolmap_tpu.pipeline.sfm import IncrementalPipelineOptions

        o = IncrementalPipelineOptions(
            {"mapper": {"init_min_num_inliers": 42}, "min_num_matches": 20}
        )
        assert o.mapper.init_min_num_inliers == 42
        assert o.min_num_matches == 20

    def test_todict_summary_pickle(self):
        import pickle

        from pycolmap_tpu.features import SiftExtractionOptions

        o = SiftExtractionOptions()
        d = o.todict()
        assert d["max_num_features"] == 8192
        assert "max_num_features" in o.summary()
        o2 = pickle.loads(pickle.dumps(o))
        assert o2 == o


class TestExporters:
    def test_all_formats(self, tmp_path):
        rec = build_synthetic_reconstruction(num_images=3, num_points=30)
        export_NVM(rec, tmp_path / "model.nvm")
        assert (tmp_path / "model.nvm").read_text().startswith("NVM_V3")
        export_bundler(rec, tmp_path / "bundle.out", tmp_path / "list.txt")
        assert "# Bundle file" in (tmp_path / "bundle.out").read_text()
        assert len((tmp_path / "list.txt").read_text().splitlines()) == 3
        export_CAM(rec, tmp_path / "cams")
        assert len(list((tmp_path / "cams").glob("*.cam"))) == 3
        export_VRML(rec, tmp_path / "images.wrl", tmp_path / "points.wrl")
        assert (tmp_path / "points.wrl").exists()


class TestRigPose:
    def test_two_camera_rig(self):
        rng = np.random.default_rng(0)
        cam = Camera.create(1, "PINHOLE", 500.0, 640, 480)
        # rig: two cameras offset along x
        cams_from_rig = [
            Rigid3d(Rotation3d(), np.array([-0.2, 0.0, 0.0])),
            Rigid3d(Rotation3d(), np.array([0.2, 0.0, 0.0])),
        ]
        rig_from_world = Rigid3d(
            Rotation3d(np.array([0.1, -0.2, 0.05])), np.array([0.3, 0.1, 1.0])
        )
        X = rng.uniform(-2, 2, (120, 3)) + [0, 0, 6]
        points2D, cameras, extr = [], [], []
        for i in range(len(X)):
            rig_cam = cams_from_rig[i % 2]
            full = rig_cam * rig_from_world
            Xc = full * X[i]
            if Xc[2] <= 0.1:
                continue
            xy = cam.img_from_cam(Xc[None, :2] / Xc[2])[0]
            points2D.append(xy + rng.normal(0, 0.3, 2))
            cameras.append(cam)
            extr.append(rig_cam)
        res = rig_absolute_pose_estimation(
            np.asarray(points2D), X[: len(points2D)], cameras, extr
        )
        assert res is not None
        est = res["rig_from_world"]
        assert np.rad2deg(est.rotation.angle_to(rig_from_world.rotation)) < 0.5
        assert np.abs(est.translation - rig_from_world.translation).max() < 0.05


class TestHomographyDecomposition:
    def test_planar_pose(self):
        rng = np.random.default_rng(1)
        cam = Camera.create(1, "PINHOLE", 600.0, 640, 480)
        K = cam.calibration_matrix()
        rel = Rigid3d(
            Rotation3d(np.array([0.05, 0.2, -0.1])), np.array([0.5, 0.1, 0.02])
        )
        n = np.array([0.1, -0.05, -1.0])
        n /= np.linalg.norm(n)
        d = 6.0  # plane n.X = -d? use X on plane z≈6
        X = np.concatenate(
            [rng.uniform(-2, 2, (60, 2)), np.zeros((60, 1))], axis=1
        )
        # place points on the plane through (0,0,6) with normal n
        X[:, 2] = (np.dot(n, [0, 0, 6.0]) - X[:, 0] * n[0] - X[:, 1] * n[1]) / n[2]
        x1 = cam.img_from_cam(X[:, :2] / X[:, 2:])
        Xc2 = rel * X
        x2 = cam.img_from_cam(Xc2[:, :2] / Xc2[:, 2:])
        from pycolmap_tpu.estimators import estimate_homography_matrix

        res = estimate_homography_matrix(x1, x2)
        out = homography_decomposition(res["H"], K, K, x1, x2)
        R_err = np.abs(out["R"] - rel.rotation.matrix()).max()
        t_est = out["t"] / max(np.linalg.norm(out["t"]), 1e-9)
        t_true = rel.translation / np.linalg.norm(rel.translation)
        assert R_err < 0.05
        assert min(
            np.abs(t_est - t_true).max(), np.abs(t_est + t_true).max()
        ) < 0.1


class TestUndistortion:
    def test_undistort_camera_and_image(self):
        from pycolmap_tpu.pipeline.images import undistort_camera, undistort_image

        cam = Camera.create(1, "SIMPLE_RADIAL", 500.0, 320, 240)
        cam.params[3] = 0.08
        new_cam = undistort_camera(cam)
        assert new_cam.model == "PINHOLE"
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 255, (240, 320)).astype(np.uint8)
        out = undistort_image(img, cam, new_cam)
        assert out.shape == (new_cam.height, new_cam.width)
        assert out.dtype == np.uint8


class TestNative:
    def test_traversal_matches_python(self):
        from pycolmap_tpu.native import get_lib
        from pycolmap_tpu.scene import CorrespondenceGraph

        if get_lib() is None:
            pytest.skip("no C++ toolchain")
        g = CorrespondenceGraph()
        for i in (1, 2, 3, 4):
            g.add_image(i, 8)
        g.add_correspondences(1, 2, np.array([[0, 0], [1, 1]]))
        g.add_correspondences(2, 3, np.array([[0, 2]]))
        g.add_correspondences(3, 4, np.array([[2, 5]]))
        g.finalize()
        native = {
            (c.image_id, c.point2D_idx)
            for c in g.find_transitive_correspondences(1, 0, 3)
        }
        g._traversal = False
        python = {
            (c.image_id, c.point2D_idx)
            for c in g.find_transitive_correspondences(1, 0, 3)
        }
        assert native == python
        assert (3, 2) in native
        assert (4, 5) in native

    def test_min_cut_chain(self):
        from pycolmap_tpu import native

        eu = np.array([0, 1])
        ev = np.array([1, 2])
        ecap = np.array([1.0, 5.0], np.float32)
        net = np.array([10.0, 0.0, -10.0], np.float32)
        # cheapest cut severs the weak 0-1 edge
        assert native.min_cut(3, eu, ev, ecap, net).tolist() == [1, 0, 0]
        assert native._min_cut_py(3, eu, ev, ecap, net).tolist() == [1, 0, 0]

    def test_min_cut_native_matches_python_cost(self):
        from pycolmap_tpu import native

        if native.get_lib() is None:
            pytest.skip("no C++ toolchain")
        rng = np.random.default_rng(7)
        for _ in range(10):
            n, m = 25, 70
            eu = rng.integers(0, n, m)
            ev = rng.integers(0, n, m)
            keep = eu != ev
            eu, ev = eu[keep].astype(np.int64), ev[keep].astype(np.int64)
            ecap = rng.uniform(0.1, 2.0, len(eu)).astype(np.float32)
            net = rng.normal(0, 3.0, n).astype(np.float32)

            def cut_cost(lab):
                c = float(np.sum(ecap[lab[eu] != lab[ev]]))
                c += float(np.sum(np.maximum(net, 0)[lab == 0]))
                c += float(np.sum(np.maximum(-net, 0)[lab == 1]))
                return c

            c_native = cut_cost(native.min_cut(n, eu, ev, ecap, net))
            c_py = cut_cost(native._min_cut_py(n, eu, ev, ecap, net))
            assert abs(c_native - c_py) < 1e-4


class TestRetrieval:
    def test_bow_pairs(self, tmp_path):
        from pycolmap_tpu.features.retrieval import retrieve_pairs
        from pycolmap_tpu.scene import Camera as Cam, Database, Image as Img

        rng = np.random.default_rng(0)
        db = Database(tmp_path / "db.db")
        cam_id = db.write_camera(Cam.create(0, "SIMPLE_PINHOLE", 500, 64, 48))
        ids = []
        base = rng.integers(0, 255, (3, 200, 128)).astype(np.uint8)
        for i in range(6):
            iid = db.write_image(Img(name=f"i{i}.jpg", camera_id=cam_id))
            ids.append(iid)
            # images 0-2 share cluster 0; 3-5 share cluster 1
            cluster = base[0] if i < 3 else base[1]
            noise = rng.integers(-8, 8, cluster.shape)
            db.write_descriptors(
                iid, np.clip(cluster + noise, 0, 255).astype(np.uint8)
            )
        pairs = retrieve_pairs(db, ids, num_images=2)
        db.close()
        assert len(pairs) > 0


class TestLogging:
    def test_interface(self):
        from pycolmap_tpu import logging

        logging.info("test message")
        logging.minloglevel = 2
        assert logging.minloglevel == 2
        logging.minloglevel = 0
