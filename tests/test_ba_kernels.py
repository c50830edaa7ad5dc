"""Cross-check: bucketed component-first BA kernels vs the flat reference
solver, plus mesh-sharded execution on the virtual device mesh."""

import numpy as np
import pytest

import jax

from pycolmap_tpu.parallel.synthetic import make_synthetic_bundle
from pycolmap_tpu.sfm.bundle_adjustment import (
    BundleAdjustmentOptions,
    LossFunctionType,
    solve_bundle_reference,
)
from pycolmap_tpu.sfm.ba_kernels import bucketize, solve_bundle_fast


def make_problem(**kw):
    defaults = dict(
        num_images=12, num_points=1500, obs_per_point=5,
        pose_noise=0.02, point_noise=0.05, refine_intrinsics=True, seed=0,
    )
    defaults.update(kw)
    return make_synthetic_bundle(**defaults)


class TestBucketize:
    def test_partitions_all_observations(self):
        problem = make_problem()
        buckets = bucketize(problem)
        total = sum(int(np.asarray(b.mask).sum()) for b in buckets)
        assert total == problem.num_obs
        rows = np.concatenate(
            [np.asarray(b.point_rows)[np.asarray(b.mask[0]) > 0] for b in buckets]
        )
        assert len(np.unique(rows)) == problem.num_points

    def test_mixed_track_lengths(self):
        # build a problem then knock out some observations via mask
        problem = make_problem(obs_per_point=6)
        mask = np.asarray(problem.obs_mask).copy()
        rng = np.random.default_rng(0)
        mask[rng.choice(len(mask), len(mask) // 3, replace=False)] = 0.0
        import jax.numpy as jnp

        problem = problem._replace(obs_mask=jnp.asarray(mask))
        buckets = bucketize(problem)
        total = sum(int(np.asarray(b.mask).sum()) for b in buckets)
        assert total == int(mask.sum())


class TestFastSolverMatchesReference:
    def test_trivial_loss(self):
        problem = make_problem()
        opts = BundleAdjustmentOptions()
        opts.max_num_iterations = 25
        p_ref, s_ref = solve_bundle_reference(problem, opts, cg_iters=20)
        p_fast, s_fast = solve_bundle_fast(problem, opts, cg_iters=20)
        assert s_fast.final_cost < 1.02 * s_ref.final_cost
        assert (
            np.abs(np.asarray(p_ref.cam_trans) - np.asarray(p_fast.cam_trans)).max()
            < 1e-2
        )

    def test_robust_loss(self):
        problem = make_problem(seed=2)
        opts = BundleAdjustmentOptions()
        opts.max_num_iterations = 25
        opts.loss_function_type = LossFunctionType.CAUCHY
        opts.loss_function_scale = 2.0
        p_ref, s_ref = solve_bundle_reference(problem, opts, cg_iters=20)
        p_fast, s_fast = solve_bundle_fast(problem, opts, cg_iters=20)
        assert s_fast.final_cost < 1.05 * s_ref.final_cost

    def test_gauge_respected(self):
        problem = make_problem(seed=3)
        opts = BundleAdjustmentOptions()
        opts.max_num_iterations = 10
        p_fast, _ = solve_bundle_fast(problem, opts)
        # image 0 pose fully fixed; image 1 tvec.x fixed (synthetic gauge)
        assert np.allclose(
            np.asarray(p_fast.cam_quat)[0], np.asarray(problem.cam_quat)[0]
        )
        assert np.allclose(
            np.asarray(p_fast.cam_trans)[0], np.asarray(problem.cam_trans)[0]
        )

    def test_converges_to_noise_floor(self):
        problem = make_problem(seed=4)
        opts = BundleAdjustmentOptions()
        opts.max_num_iterations = 40
        _, s = solve_bundle_fast(problem, opts, cg_iters=25)
        assert s.final_cost < s.initial_cost / 50


class TestShardedFastSolver:
    def test_mesh_solve_matches_single(self):
        from pycolmap_tpu.parallel.sharded_ba import make_obs_mesh

        problem = make_problem(num_points=1024, seed=5)
        opts = BundleAdjustmentOptions()
        opts.max_num_iterations = 10
        p1, s1 = solve_bundle_fast(problem, opts, cg_iters=10)
        mesh = make_obs_mesh(jax.devices()[:8])
        p8, s8 = solve_bundle_fast(problem, opts, cg_iters=10, mesh=mesh)
        assert np.isclose(s1.final_cost, s8.final_cost, rtol=1e-3)
        assert (
            np.abs(np.asarray(p1.cam_trans) - np.asarray(p8.cam_trans)).max() < 1e-3
        )
