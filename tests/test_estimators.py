"""Property tests: RANSAC estimators recover planted geometry under outliers
(test strategy per SURVEY.md §4.2)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pycolmap_tpu.estimators import (
    RANSACOptions,
    absolute_pose_estimation,
    estimate_calibrated_two_view_geometry,
    estimate_essential_matrix,
    estimate_fundamental_matrix,
    estimate_homography_matrix,
    estimate_triangulation,
    estimate_two_view_geometry_pose,
    pose_refinement,
)
from pycolmap_tpu.estimators.two_view_geometry import TwoViewGeometryConfiguration
from pycolmap_tpu.geometry import Rigid3d, Rotation3d
from pycolmap_tpu.scene import Camera


def make_camera(f=600.0, w=640, h=480):
    return Camera.create(1, "PINHOLE", f, w, h)


def synth_two_view(
    n=200, outlier_ratio=0.3, noise=0.5, seed=0, f=600.0, planar=False
):
    """Pixel-space correspondences from a known relative pose."""
    rng = np.random.default_rng(seed)
    cam = make_camera(f)
    if planar:
        X = np.concatenate(
            [rng.uniform(-2, 2, (n, 2)), np.zeros((n, 1))], axis=1
        ) + np.array([0, 0, 6.0])
    else:
        X = rng.uniform(-2, 2, (n, 3)) + np.array([0, 0, 6.0])
    rel = Rigid3d(
        Rotation3d(np.array([0.05, 0.3, -0.02])), np.array([1.0, 0.1, 0.05])
    )
    x1 = cam.img_from_cam(X[:, :2] / X[:, 2:])
    Xc2 = rel * X
    x2 = cam.img_from_cam(Xc2[:, :2] / Xc2[:, 2:])
    x1 += rng.normal(0, noise, x1.shape)
    x2 += rng.normal(0, noise, x2.shape)
    n_out = int(outlier_ratio * n)
    idx = rng.choice(n, n_out, replace=False)
    x2[idx] = rng.uniform(0, [cam.width, cam.height], (n_out, 2))
    inlier_gt = np.ones(n, dtype=bool)
    inlier_gt[idx] = False
    return cam, x1, x2, rel, inlier_gt


class TestFundamental:
    def test_recovers_inliers(self):
        cam, x1, x2, rel, gt = synth_two_view()
        res = estimate_fundamental_matrix(x1, x2)
        assert res is not None
        # recovered inliers should mostly be true inliers
        agreement = (res["inliers"] & gt).sum() / gt.sum()
        assert agreement > 0.9
        false_pos = (res["inliers"] & ~gt).sum()
        assert false_pos < 0.05 * len(x1)

    def test_too_few_points(self):
        res = estimate_fundamental_matrix(np.zeros((5, 2)), np.zeros((5, 2)))
        assert res is None

    def test_deterministic(self):
        cam, x1, x2, rel, gt = synth_two_view(seed=3)
        r1 = estimate_fundamental_matrix(x1, x2)
        r2 = estimate_fundamental_matrix(x1, x2)
        assert np.allclose(r1["F"], r2["F"])
        assert r1["num_inliers"] == r2["num_inliers"]


class TestEssential:
    def test_recovers_pose(self):
        cam, x1, x2, rel, gt = synth_two_view(outlier_ratio=0.2)
        res = estimate_essential_matrix(x1, x2, cam, cam)
        assert res is not None
        assert res["num_inliers"] > 0.8 * gt.sum()
        pose = res["cam2_from_cam1"]
        rot_err = np.rad2deg(pose.rotation.angle_to(rel.rotation))
        assert rot_err < 1.0
        t_est = pose.translation / np.linalg.norm(pose.translation)
        t_true = rel.translation / np.linalg.norm(rel.translation)
        # two-view translation direction is the least-stable quantity under
        # 0.5px noise + 20% outliers; 0.08 ~= 4.5deg direction error
        assert np.abs(t_est - t_true).max() < 0.08


class TestEssential5Point:
    def test_minimal_recovers_gt(self):
        """Noise-free 5-point samples: one of the 10 returned hypotheses is
        the ground-truth essential matrix (ops/solvers.essential_5pt)."""
        from pycolmap_tpu.ops import solvers

        rng = np.random.default_rng(0)
        hits = 0
        for trial in range(10):
            axis = rng.normal(size=3)
            axis /= np.linalg.norm(axis)
            ang = rng.uniform(0.1, 0.6)
            K_ = np.array(
                [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]],
                 [-axis[1], axis[0], 0]]
            )
            R = np.eye(3) + np.sin(ang) * K_ + (1 - np.cos(ang)) * K_ @ K_
            t = rng.normal(size=3)
            t /= np.linalg.norm(t)
            E_gt = np.array(
                [[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]]
            ) @ R
            E_gt /= np.linalg.norm(E_gt)
            X = rng.uniform(-1, 1, size=(5, 3)) + np.array([0, 0, 4.0])
            x1 = X[:, :2] / X[:, 2:]
            Xc2 = X @ R.T + t
            x2 = Xc2[:, :2] / Xc2[:, 2:]
            E, valid = solvers.essential_5pt(
                jnp.asarray(x1[None], jnp.float32),
                jnp.asarray(x2[None], jnp.float32),
            )
            E = np.asarray(E[0])
            valid = np.asarray(valid[0])
            best = min(
                (
                    min(
                        np.abs(E[k] / np.linalg.norm(E[k]) - E_gt).max(),
                        np.abs(E[k] / np.linalg.norm(E[k]) + E_gt).max(),
                    )
                    for k in range(10)
                    if valid[k]
                ),
                default=np.inf,
            )
            if best < 1e-2:
                hits += 1
        assert hits >= 8, hits

    def test_high_outlier_ratio(self):
        """5-point sample complexity: converges at 60% outliers."""
        cam, x1, x2, rel, gt = synth_two_view(outlier_ratio=0.6, seed=5)
        res = estimate_essential_matrix(x1, x2, cam, cam)
        assert res is not None
        assert res["num_inliers"] > 0.8 * gt.sum()
        pose = res["cam2_from_cam1"]
        rot_err = np.rad2deg(pose.rotation.angle_to(rel.rotation))
        assert rot_err < 1.5


class TestHomography:
    def test_planar_scene(self):
        cam, x1, x2, rel, gt = synth_two_view(planar=True, outlier_ratio=0.3)
        res = estimate_homography_matrix(x1, x2)
        assert res is not None
        assert res["num_inliers"] > 0.85 * gt.sum()


class TestAbsolutePose:
    def test_pnp(self):
        rng = np.random.default_rng(0)
        cam = make_camera()
        n = 100
        X = rng.uniform(-2, 2, (n, 3)) + np.array([0, 0, 6.0])
        pose = Rigid3d(
            Rotation3d(np.array([0.2, -0.1, 0.4])), np.array([0.3, -0.2, 0.5])
        )
        Xc = pose * X
        x = cam.img_from_cam(Xc[:, :2] / Xc[:, 2:]) + rng.normal(0, 0.5, (n, 2))
        n_out = 30
        idx = rng.choice(n, n_out, replace=False)
        x[idx] = rng.uniform(0, [cam.width, cam.height], (n_out, 2))
        res = absolute_pose_estimation(x, X, cam)
        assert res is not None
        assert res["num_inliers"] >= 0.9 * (n - n_out)
        est = res["cam_from_world"]
        assert np.rad2deg(est.rotation.angle_to(pose.rotation)) < 0.5
        assert np.abs(est.translation - pose.translation).max() < 0.05

    def test_refinement_improves(self):
        rng = np.random.default_rng(1)
        cam = make_camera()
        n = 50
        X = rng.uniform(-2, 2, (n, 3)) + np.array([0, 0, 6.0])
        pose = Rigid3d(Rotation3d(np.array([0.1, 0.0, 0.2])), np.array([0.1, 0.0, 0.3]))
        Xc = pose * X
        x = cam.img_from_cam(Xc[:, :2] / Xc[:, 2:])
        # perturb the pose
        bad = Rigid3d(
            Rotation3d(np.array([0.13, 0.01, 0.22])), pose.translation + 0.05
        )
        res = pose_refinement(bad, x, X, np.ones(n, dtype=bool), cam)
        refined = res["cam_from_world"]
        assert refined.rotation.angle_to(pose.rotation) < bad.rotation.angle_to(
            pose.rotation
        )
        assert np.abs(refined.translation - pose.translation).max() < 1e-3


class TestTriangulation:
    def test_multiview(self):
        rng = np.random.default_rng(0)
        cam = make_camera()
        X_true = np.array([0.5, -0.3, 8.0])
        poses = []
        obs = []
        for i in range(6):
            pose = Rigid3d(
                Rotation3d(np.array([0.0, 0.15 * i, 0.0])),
                np.array([1.0 * i - 2.5, 0.0, 0.0]),
            )
            Xc = pose * X_true
            obs.append(cam.img_from_cam(Xc[None, :2] / Xc[2])[0] + rng.normal(0, 0.3, 2))
            poses.append(pose)
        res = estimate_triangulation(obs, poses, [cam] * 6)
        assert res is not None
        assert np.abs(res["point3D"] - X_true).max() < 0.05


class TestTwoViewGeometry:
    def test_calibrated_decision(self):
        cam, x1, x2, rel, gt = synth_two_view(outlier_ratio=0.2)
        g = estimate_calibrated_two_view_geometry(cam, x1, cam, x2)
        assert g.config == int(TwoViewGeometryConfiguration.CALIBRATED)
        assert len(g.inlier_matches) > 0.8 * gt.sum()
        ok = estimate_two_view_geometry_pose(cam, x1, cam, x2, g)
        assert ok
        assert np.rad2deg(g.cam2_from_cam1.rotation.angle_to(rel.rotation)) < 1.0

    def test_planar_decision(self):
        cam, x1, x2, rel, gt = synth_two_view(planar=True, outlier_ratio=0.1)
        g = estimate_calibrated_two_view_geometry(cam, x1, cam, x2)
        assert g.config in (
            int(TwoViewGeometryConfiguration.PLANAR_OR_PANORAMIC),
            int(TwoViewGeometryConfiguration.PLANAR),
            int(TwoViewGeometryConfiguration.CALIBRATED),
        )

    def test_degenerate(self):
        cam = make_camera()
        g = estimate_calibrated_two_view_geometry(
            cam, np.zeros((5, 2)), cam, np.zeros((5, 2))
        )
        assert g.config == int(TwoViewGeometryConfiguration.DEGENERATE)

    def test_multiple_models(self):
        """Two independently-moving planes -> MULTIPLE config with inliers
        from both motions (ref two_view_geometry.h:67-77)."""
        from pycolmap_tpu.estimators.two_view_geometry import (
            TwoViewGeometryOptions,
        )

        rng = np.random.default_rng(3)
        cam = make_camera()
        sets = []
        for k, rel in enumerate(
            [
                Rigid3d(Rotation3d(np.array([0.02, 0.25, 0.0])),
                        np.array([0.8, 0.0, 0.0])),
                Rigid3d(Rotation3d(np.array([-0.3, -0.1, 0.2])),
                        np.array([-0.5, 0.6, 0.3])),
            ]
        ):
            X = np.concatenate(
                [rng.uniform(-2, 2, (120, 2)), np.zeros((120, 1))], axis=1
            ) + np.array([2.5 * k - 1, 0, 6.0])
            x1 = cam.img_from_cam(X[:, :2] / X[:, 2:])
            Xc2 = rel * X
            x2 = cam.img_from_cam(Xc2[:, :2] / Xc2[:, 2:])
            sets.append((x1, x2))
        x1 = np.concatenate([s[0] for s in sets])
        x2 = np.concatenate([s[1] for s in sets])
        x1 += rng.normal(0, 0.3, x1.shape)
        x2 += rng.normal(0, 0.3, x2.shape)
        opts = TwoViewGeometryOptions()
        opts.multiple_models = True
        opts.detect_watermark = False
        g = estimate_calibrated_two_view_geometry(
            cam, x1, cam, x2, options=opts
        )
        assert g.config == int(TwoViewGeometryConfiguration.MULTIPLE)
        assert len(g.inlier_matches) > 150  # both motions contribute
        # single-model estimation on the same data keeps a single config
        opts.multiple_models = False
        g1 = estimate_calibrated_two_view_geometry(
            cam, x1, cam, x2, options=opts
        )
        assert g1.config != int(TwoViewGeometryConfiguration.MULTIPLE)


class TestEPnP:
    """EPnP non-minimal solver (ref absolute_pose.h:148 EPNPEstimator)."""

    def _random_problem(self, rng, n=20, noise=0.0):
        from pycolmap_tpu.ops import quaternion as qops

        A = rng.normal(size=(3, 3))
        Q, _ = np.linalg.qr(A)
        if np.linalg.det(Q) < 0:
            Q[:, 0] *= -1
        t = rng.normal(size=3) * 0.5 + np.array([0, 0, 4.0])
        X = rng.uniform(-2, 2, (n, 3))
        pc = X @ Q.T + t
        pc[:, 2] = np.abs(pc[:, 2]) + 1.0
        X = (pc - t) @ Q  # world points with guaranteed positive depth
        x = pc[:, :2] / pc[:, 2:] + rng.normal(0, noise, (n, 2))
        return Q, t, x.astype(np.float32), X.astype(np.float32)

    def _rot_err_deg(self, q, R):
        from pycolmap_tpu.ops import quaternion as qops

        Rh = np.asarray(qops.quat_to_matrix(q))
        c = (np.trace(Rh @ R.T) - 1) / 2
        return np.rad2deg(np.arccos(np.clip(c, -1, 1)))

    def test_epnp_exact(self):
        from pycolmap_tpu.ops import solvers

        rng = np.random.default_rng(1)
        for _ in range(5):
            R, t, x, X = self._random_problem(rng)
            q, tt = solvers.epnp(jnp.asarray(x), jnp.asarray(X))
            assert self._rot_err_deg(q, R) < 0.1
            assert np.linalg.norm(np.asarray(tt) - t) < 1e-3

    def test_epnp_beats_dlt_under_noise(self):
        """The A/B justifying the r3->r4 solver switch (VERDICT missing #5)."""
        from pycolmap_tpu.ops import solvers

        rng = np.random.default_rng(2)
        e_ep, e_dlt = [], []
        for _ in range(20):
            R, t, x, X = self._random_problem(rng, noise=0.005)
            xj, Xj = jnp.asarray(x), jnp.asarray(X)
            q, _ = solvers.epnp(xj, Xj)
            e_ep.append(self._rot_err_deg(q, R))
            q2, _2 = solvers.pnp_dlt(xj[None], Xj[None])
            e_dlt.append(self._rot_err_deg(q2[0], R))
        assert np.median(e_ep) < np.median(e_dlt)

    def test_epnp_batched(self):
        from pycolmap_tpu.ops import solvers

        rng = np.random.default_rng(3)
        probs = [self._random_problem(rng) for _ in range(4)]
        x = jnp.stack([jnp.asarray(p[2]) for p in probs])
        X = jnp.stack([jnp.asarray(p[3]) for p in probs])
        q, t = solvers.epnp(x, X)
        for b, (R, tb, _, _) in enumerate(probs):
            assert self._rot_err_deg(q[b], R) < 0.1
            assert np.linalg.norm(np.asarray(t[b]) - tb) < 1e-3


class TestAlignToLocations:
    def _make_rec(self, rng, n_images=8):
        from pycolmap_tpu.geometry import Rigid3d, Rotation3d
        from pycolmap_tpu.scene import Camera, Image, Reconstruction

        rec = Reconstruction()
        cam = Camera.create(1, "SIMPLE_PINHOLE", 500.0, 640, 480)
        rec.add_camera(cam)
        centers = []
        for i in range(n_images):
            c = rng.uniform(-3, 3, 3)
            R = np.eye(3)
            img = Image(name=f"im{i}.jpg", camera_id=1, id=i + 1)
            img.cam_from_world = Rigid3d(Rotation3d(R), -R @ c)
            img.registered = True
            rec.add_image(img)
            centers.append(c)
        return rec, np.asarray(centers)

    def test_align_to_locations_recovers_sim3(self):
        from pycolmap_tpu.estimators import align_reconstruction_to_locations
        from pycolmap_tpu.estimators.ransac import RANSACOptions
        from pycolmap_tpu.geometry import Sim3d

        rng = np.random.default_rng(0)
        rec, centers = self._make_rec(rng)
        # ground-truth similarity: scale 2, rotation about z, shift
        ang = 0.3
        Rz = np.array(
            [[np.cos(ang), -np.sin(ang), 0],
             [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]]
        )
        locations = 2.0 * centers @ Rz.T + np.array([10.0, -5.0, 2.0])
        # one gross outlier
        locations[3] += np.array([50.0, 0, 0])
        opts = RANSACOptions()
        opts.max_error = 0.1
        names = [f"im{i}.jpg" for i in range(len(centers))]
        tform = align_reconstruction_to_locations(
            rec, names, locations, 3, opts
        )
        assert tform is not None
        pred = np.stack([tform * c for c in centers])
        err = np.linalg.norm(pred - locations, axis=1)
        assert (err < 0.05).sum() >= 7  # all but the planted outlier

    def test_align_to_locations_too_few(self):
        from pycolmap_tpu.estimators import align_reconstruction_to_locations
        from pycolmap_tpu.estimators.ransac import RANSACOptions

        rng = np.random.default_rng(1)
        rec, centers = self._make_rec(rng, n_images=2)
        names = [f"im{i}.jpg" for i in range(2)]
        assert (
            align_reconstruction_to_locations(
                rec, names, centers, 3, RANSACOptions()
            )
            is None
        )

    def test_reference_typo_alias(self):
        import pycolmap_tpu

        assert (
            pycolmap_tpu.align_reconstrution_to_locations
            is pycolmap_tpu.align_reconstruction_to_locations
        )
