"""Pose-graph relaxation (sfm/pose_graph.py): rotation averaging,
position solve, batched retriangulation, and the fold detector."""

import numpy as np
import pytest

from pycolmap_tpu.sfm import pose_graph as pg


def _ring_rotations(n):
    """Ground-truth cam_from_world rotations looking outward on a ring."""
    Rs = []
    for i in range(n):
        phi = 2 * np.pi * i / n
        fwd = np.array([np.cos(phi), 0.0, np.sin(phi)])
        up = np.array([0.0, -1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        Rs.append(np.stack([right, up2, fwd], axis=0))
    return np.stack(Rs)


def _fold(R_true, total_deg):
    """Apply progressively accumulating yaw drift (the incremental-mapping
    failure mode): the world around camera k is rotated by W_k = Ry(-ang_k),
    so cam_from_world becomes R_true W_k^T = R_true Ry(ang_k) — consistent
    with positions drifting to ring angle phi + ang (local rigidity, as in
    a real drifted reconstruction)."""
    n = len(R_true)
    out = []
    for k in range(n):
        ang = np.deg2rad(total_deg) * k / n
        c, s = np.cos(ang), np.sin(ang)
        Ry = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        out.append(R_true[k] @ Ry)
    return np.stack(out)


class TestRotationAveraging:
    def test_recovers_folded_ring(self):
        n = 60
        R_true = _ring_rotations(n)
        R_drift = _fold(R_true, total_deg=12.0)
        # keep the gauge camera exact
        R_drift[0] = R_true[0]
        # edges: sequential +1/+2 plus ONE closure pair, true relative rots
        edges = []
        for i in range(n - 1):
            edges.append((i, i + 1))
        for i in range(n - 2):
            edges.append((i, i + 2))
        edges.append((0, n - 1))
        edges.append((1, n - 2))
        edges = np.asarray(edges)
        R_rel = R_true[edges[:, 1]] @ np.swapaxes(R_true[edges[:, 0]], -1, -2)
        R_new = pg.rotation_averaging(R_drift, edges, R_rel, num_iters=40)
        # residual of every edge ~ 0 after averaging
        E = np.swapaxes(R_new[edges[:, 1]], -1, -2) @ R_rel @ R_new[edges[:, 0]]
        resid = np.degrees(np.linalg.norm(pg._log_so3(E), axis=-1))
        assert np.median(resid) < 0.1
        assert resid.max() < 0.5
        # absolute recovery up to the pinned gauge
        err = np.degrees(
            np.linalg.norm(
                pg._log_so3(np.swapaxes(R_new, -1, -2) @ R_true), axis=-1
            )
        )
        assert np.median(err) < 0.5

    def test_outlier_edges_downweighted(self):
        n = 30
        R_true = _ring_rotations(n)
        edges = [(i, i + 1) for i in range(n - 1)] + [
            (i, i + 2) for i in range(n - 2)
        ]
        edges = np.asarray(edges)
        R_rel = R_true[edges[:, 1]] @ np.swapaxes(R_true[edges[:, 0]], -1, -2)
        # corrupt 3 edges with gross 90-degree errors
        bad = np.array([5, 20, 33])
        D = pg._exp_so3(np.array([[np.pi / 2, 0, 0]] * 3))
        R_rel[bad] = D @ R_rel[bad]
        rng = np.random.default_rng(0)
        R_init = R_true @ pg._exp_so3(
            rng.normal(0, 0.02, (n, 3))
        )
        R_new = pg.rotation_averaging(R_init, edges, R_rel, num_iters=40)
        good = np.setdiff1d(np.arange(len(edges)), bad)
        E = (
            np.swapaxes(R_new[edges[good, 1]], -1, -2)
            @ R_rel[good]
            @ R_new[edges[good, 0]]
        )
        resid = np.degrees(np.linalg.norm(pg._log_so3(E), axis=-1))
        assert np.median(resid) < 0.2


class TestPositionSolve:
    def test_recovers_ring_centers(self):
        n = 40
        R_true = _ring_rotations(n)
        phi = 2 * np.pi * np.arange(n) / n
        c_true = np.stack(
            [3 * np.cos(phi), 0.1 * np.sin(3 * phi), 3 * np.sin(phi)], axis=1
        )
        # drifted centers: rotate the whole later arc progressively (fold)
        R_drift = _fold(R_true, 15.0)
        ang = np.deg2rad(15.0) * np.arange(n) / n
        c_drift = np.stack(
            [
                3 * np.cos(phi + ang),
                c_true[:, 1],
                3 * np.sin(phi + ang),
            ],
            axis=1,
        )
        S = np.swapaxes(R_true, -1, -2) @ R_drift  # R_new^T R_old
        disp_edges = np.asarray([(i, i + 1) for i in range(n - 1)])
        disp_vals = c_drift[disp_edges[:, 1]] - c_drift[disp_edges[:, 0]]
        # closure direction edge with the TRUE direction
        dir_edges = np.asarray([(0, n - 1), (1, n - 2)])
        u = c_true[dir_edges[:, 1]] - c_true[dir_edges[:, 0]]
        u = u / np.linalg.norm(u, axis=1, keepdims=True)
        c_new = pg.position_solve(
            c_drift, S, disp_edges, disp_vals, dir_edges, u, dir_weight=20.0
        )
        # gauge camera pinned
        np.testing.assert_allclose(c_new[0], c_drift[0], atol=1e-8)
        # ring unbends: the seam-gap error shrinks substantially (the
        # direction constraint fixes the seam's bearing; the exact gap
        # magnitude is left for bundle adjustment to polish)
        gap_before = np.linalg.norm(c_drift[-1] - c_drift[0])
        gap_after = np.linalg.norm(c_new[-1] - c_new[0])
        gap_true = np.linalg.norm(c_true[-1] - c_true[0])
        assert abs(gap_after - gap_true) < abs(gap_before - gap_true) / 1.3
        # and the seam direction now matches the true bearing
        u_after = (c_new[-1] - c_new[0]) / max(gap_after, 1e-12)
        u_true = (c_true[-1] - c_true[0]) / gap_true
        assert np.dot(u_after, u_true) > 0.99


def _toy_reconstruction(n_images=8, n_points=60, noise=0.0, seed=0):
    from pycolmap_tpu.geometry import Rigid3d, Rotation3d
    from pycolmap_tpu.scene import Camera, Image, Reconstruction
    from pycolmap_tpu.scene.track import Track, TrackElement

    rng = np.random.default_rng(seed)
    rec = Reconstruction()
    cam = Camera.create(1, "SIMPLE_PINHOLE", 500.0, 640, 480)
    rec.add_camera(cam)
    target = np.array([0.0, 0.0, 5.0])
    pts = rng.uniform(-1.2, 1.2, (n_points, 3)) + target
    poses = []
    for i in range(n_images):
        th = -0.5 + i / max(n_images - 1, 1)
        c = target + 5.0 * np.array([np.sin(th), 0.0, -np.cos(th)])
        fwd = target - c
        fwd /= np.linalg.norm(fwd)
        up = np.array([0.0, -1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        R = np.stack([right, np.cross(fwd, right), fwd], axis=0)
        poses.append(Rigid3d(Rotation3d(R), -R @ c))
    kp = []
    for i in range(n_images):
        p_cam = poses[i] * pts
        uv = p_cam[:, :2] / p_cam[:, 2:]
        xy = cam.img_from_cam(uv) + rng.normal(0, noise, (n_points, 2))
        kp.append(xy)
        img = Image(name=f"i{i}.jpg", camera_id=1, id=i + 1)
        img.cam_from_world = poses[i]
        img.set_keypoints(xy)
        rec.add_image(img)
        rec.register_image(i + 1)
    for p in range(n_points):
        track = Track(
            [TrackElement(i + 1, p) for i in range(n_images)]
        )
        rec.add_point3D(pts[p] + rng.normal(0, 0.05, 3), track)
    return rec, pts


class TestRetriangulateAll:
    def test_reestimates_points_under_current_poses(self):
        rec, pts_true = _toy_reconstruction(noise=0.0)
        n_re, n_drop = pg.retriangulate_all(rec)
        assert n_drop == 0 and n_re == len(pts_true)
        got = np.stack([rec.points3D[p].xyz for p in sorted(rec.points3D)])
        # noiseless projections triangulate back to the exact points
        assert np.abs(got - pts_true).max() < 1e-3


class TestFoldDetector:
    def test_healthy_scene_is_noop(self):
        rec, _ = _toy_reconstruction(noise=0.0)
        # pair poses consistent with the reconstruction
        pair_pose = {}
        for i in range(1, 8):
            rel = (
                rec.images[i + 1].cam_from_world
                * rec.images[i].cam_from_world.inverse()
            )
            q = rel.rotation.quat  # xyzw
            pair_pose[(i, i + 1)] = (
                np.array([q[3], q[0], q[1], q[2]]),
                np.asarray(rel.translation),
            )
        resid = pg.pose_graph_residuals_deg(rec, pair_pose)
        assert resid.max() < 0.01
        assert not pg.relax_pose_graph(rec, pair_pose, min_residual_deg=1.0)


class TestRelaxEndToEnd:
    def test_unfolds_drifted_reconstruction(self):
        """Full relax_pose_graph on a toy scene whose stored poses carry
        accumulated drift while the pair measurements are true: poses are
        restored and every track retriangulates near its true point."""
        from pycolmap_tpu.geometry import Rigid3d, Rotation3d

        rec, pts_true = _toy_reconstruction(n_images=12, noise=0.0)
        true_poses = {
            i: rec.images[i].cam_from_world for i in rec.reg_image_ids
        }
        # true pairwise measurements: sequential +1/+2 and two seam edges
        pair_pose = {}
        ids = sorted(rec.reg_image_ids)
        pairs = [(ids[a], ids[a + 1]) for a in range(len(ids) - 1)]
        pairs += [(ids[a], ids[a + 2]) for a in range(len(ids) - 2)]
        pairs += [(ids[0], ids[-1]), (ids[1], ids[-2])]
        for i, j in pairs:
            rel = true_poses[j] * true_poses[i].inverse()
            q = rel.rotation.quat
            pair_pose[(i, j)] = (
                np.array([q[3], q[0], q[1], q[2]]),
                np.asarray(rel.translation),
            )
        # corrupt stored poses with accumulating yaw drift (locally rigid)
        for k, i in enumerate(ids):
            ang = np.deg2rad(10.0) * k / len(ids)
            c, s = np.cos(ang), np.sin(ang)
            Ry = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
            R_old = true_poses[i].rotation.matrix()
            c_old = -R_old.T @ np.asarray(true_poses[i].translation)
            W = Ry.T  # world rotated
            R_new = R_old @ Ry
            c_new = W @ c_old
            rec.images[i].cam_from_world = Rigid3d(
                Rotation3d(R_new), -R_new @ c_new
            )
        resid = pg.pose_graph_residuals_deg(rec, pair_pose)
        assert resid.max() > 2.0  # the seam shows the fold
        assert pg.relax_pose_graph(rec, pair_pose, min_residual_deg=1.0)
        resid2 = pg.pose_graph_residuals_deg(rec, pair_pose)
        assert resid2.max() < 0.5
        # retriangulated points match the true scene near-exactly up to
        # the corrected (gauge-pinned) frame
        R0 = rec.images[ids[0]].cam_from_world.rotation.matrix()
        # camera 0 is the averaging gauge: its pose should be untouched
        got = np.stack(
            [rec.points3D[p].xyz for p in sorted(rec.points3D)]
        )
        assert len(got) == len(pts_true)
        assert np.isfinite(got).all()
