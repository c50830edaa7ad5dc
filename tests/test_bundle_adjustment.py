"""Bundle adjustment tests: convergence, gauge fixing, robust losses,
intrinsics refinement (validation strategy per SURVEY.md §7 M2)."""

import numpy as np
import pytest

from pycolmap_tpu.geometry import Rigid3d, Rotation3d
from pycolmap_tpu.sfm.bundle_adjustment import (
    BundleAdjustmentOptions,
    LossFunctionType,
    solve_bundle,
)
from pycolmap_tpu.sfm.problem import apply_bundle_solution, build_bundle_problem

from test_scene import build_synthetic_reconstruction


def perturb(rec, pose_noise=0.02, point_noise=0.02, seed=1, skip_first=2):
    rng = np.random.default_rng(seed)
    for pt in rec.points3D.values():
        pt.xyz = pt.xyz + rng.normal(0, point_noise, 3)
    ids = rec.reg_image_ids
    for iid in ids[skip_first:]:
        img = rec.images[iid]
        q = img.cam_from_world.rotation.quat + rng.normal(0, pose_noise / 4, 4)
        img.cam_from_world = Rigid3d(
            Rotation3d(q / np.linalg.norm(q)),
            img.cam_from_world.translation + rng.normal(0, pose_noise, 3),
        )
    return ids


def run_ba(rec, opts=None, **kwargs):
    if opts is None:
        opts = BundleAdjustmentOptions()
        opts.refine_focal_length = False
        opts.refine_extra_params = False
        opts.max_num_iterations = 50
    problem, mapping = build_bundle_problem(rec, opts, **kwargs)
    new_problem, summary = solve_bundle(problem, opts)
    apply_bundle_solution(rec, new_problem, mapping)
    return summary


class TestBundleAdjustment:
    def test_converges_to_noise_floor(self):
        rec = build_synthetic_reconstruction(num_images=6, num_points=150, seed=0)
        baseline_err = rec.compute_mean_reprojection_error()
        ids = perturb(rec)
        assert rec.compute_mean_reprojection_error() > 5.0
        summary = run_ba(
            rec, constant_pose_ids=[ids[0]], constant_tvec_x_ids=[ids[1]]
        )
        assert summary.final_cost < summary.initial_cost / 100
        # converged at (or below) the keypoint noise floor
        assert rec.compute_mean_reprojection_error() < baseline_err * 1.1

    def test_gauge_fixed_images_unchanged(self):
        rec = build_synthetic_reconstruction(num_images=5, num_points=100, seed=2)
        ids = perturb(rec)
        pose0 = rec.images[ids[0]].cam_from_world.matrix().copy()
        t1x = rec.images[ids[1]].cam_from_world.translation[0]
        run_ba(rec, constant_pose_ids=[ids[0]], constant_tvec_x_ids=[ids[1]])
        assert np.allclose(rec.images[ids[0]].cam_from_world.matrix(), pose0)
        assert np.isclose(rec.images[ids[1]].cam_from_world.translation[0], t1x)

    def test_robust_loss_with_outliers(self):
        rec = build_synthetic_reconstruction(num_images=6, num_points=150, seed=3)
        ids = perturb(rec, pose_noise=0.01, point_noise=0.01)
        # corrupt 5% of keypoints badly
        rng = np.random.default_rng(9)
        for iid in ids:
            img = rec.images[iid]
            n = img.num_points2D
            bad = rng.choice(n, max(1, n // 20), replace=False)
            img.points2D_xy[bad] += rng.uniform(30, 80, (len(bad), 2))
        opts = BundleAdjustmentOptions()
        opts.refine_focal_length = False
        opts.refine_extra_params = False
        opts.max_num_iterations = 50
        opts.loss_function_type = LossFunctionType.CAUCHY
        opts.loss_function_scale = 1.0
        run_ba(
            rec, opts, constant_pose_ids=[ids[0]], constant_tvec_x_ids=[ids[1]]
        )
        # robust loss should keep most reprojection errors small
        _, _, errors, _ = rec.compute_reprojection_errors()
        assert np.median(errors[np.isfinite(errors)]) < 1.0

    def test_refines_focal_length(self):
        rec = build_synthetic_reconstruction(num_images=8, num_points=200, seed=4)
        ids = rec.reg_image_ids
        true_f = rec.cameras[1].focal_length
        rec.cameras[1].focal_length = true_f * 1.05  # 5% focal error
        opts = BundleAdjustmentOptions()
        opts.refine_focal_length = True
        opts.refine_extra_params = True
        opts.max_num_iterations = 80
        run_ba(rec, opts, constant_pose_ids=[ids[0]], constant_tvec_x_ids=[ids[1]])
        assert abs(rec.cameras[1].focal_length - true_f) / true_f < 0.02

    def test_local_ba_subset(self):
        rec = build_synthetic_reconstruction(num_images=6, num_points=100, seed=5)
        ids = perturb(rec, skip_first=4)
        # local BA: only the last two images vary
        before_pose = rec.images[ids[0]].cam_from_world.matrix().copy()
        run_ba(
            rec,
            image_ids=ids[4:],
            constant_pose_ids=[],
        )
        # untouched image not in problem remains the same
        assert np.allclose(rec.images[ids[0]].cam_from_world.matrix(), before_pose)
