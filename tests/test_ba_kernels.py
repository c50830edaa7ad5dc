"""Cross-check: bucketed component-first BA kernels vs the flat reference
solver, plus mesh-sharded execution on the virtual device mesh."""

import os

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


class TestAnalyticJacobians:
    @pytest.mark.parametrize("model_id", list(range(11)))
    def test_matches_jvp(self, model_id):
        """Analytic component-first Jacobians == the 21-jvp reference for
        every camera model."""
        import jax.numpy as jnp

        from pycolmap_tpu.ops.camera_models import CAMERA_MODEL_BY_ID
        from pycolmap_tpu.sfm import ba_kernels as bk

        rng = np.random.default_rng(model_id)
        T, P = 4, 8
        info = CAMERA_MODEL_BY_ID[model_id]
        params = np.zeros(bk.MAX_PARAMS, dtype=np.float32)
        for i in info.focal_idxs:
            params[i] = 400.0
        params[info.principal_idxs[0]] = 320.0
        params[info.principal_idxs[1]] = 240.0
        for i in info.extra_idxs:
            params[i] = rng.uniform(-0.05, 0.05)
        if info.name == "FOV":
            params[info.extra_idxs[0]] = 0.8

        q = rng.normal(size=(T, P, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        q_obs = tuple(jnp.asarray(q[..., i]) for i in range(4))
        t_obs = tuple(
            jnp.asarray(rng.uniform(-0.5, 0.5, (T, P)).astype(np.float32))
            for _ in range(3)
        )
        k_obs = tuple(
            jnp.full((T, P), params[i], jnp.float32)
            for i in range(bk.MAX_PARAMS)
        )
        pts = rng.uniform(-1, 1, (3, P)).astype(np.float32)
        pts[2] += 6.0
        mask = (rng.uniform(size=(T, P)) > 0.2).astype(np.float32)
        bucket = bk.Bucket(
            img_idx=jnp.zeros((T, P), jnp.int32),
            cam_idx=jnp.zeros((T, P), jnp.int32),
            xy=jnp.asarray(rng.uniform(0, 600, (2, T, P)).astype(np.float32)),
            mask=jnp.asarray(mask),
            points=jnp.asarray(pts),
            point_free=jnp.asarray(
                (rng.uniform(size=P) > 0.3).astype(np.float32)
            ),
            point_rows=jnp.arange(P, dtype=jnp.int32),
        )
        ifree = tuple(
            jnp.full((T, P), 1.0 if i in set(
                list(info.focal_idxs) + list(info.extra_idxs)
            ) else 0.0, jnp.float32)
            for i in range(bk.MAX_PARAMS)
        )
        res_a, J_a = bk._bucket_res_and_jac(
            model_id, bucket, q_obs, t_obs, k_obs, ifree
        )
        res_j, J_j = bk._bucket_res_and_jac_jvp(
            model_id, bucket, q_obs, t_obs, k_obs, ifree
        )
        np.testing.assert_allclose(
            np.asarray(res_a), np.asarray(res_j), atol=1e-4, rtol=1e-4
        )
        scale = np.abs(np.asarray(J_j)).max() + 1.0
        np.testing.assert_allclose(
            np.asarray(J_a) / scale, np.asarray(J_j) / scale,
            atol=1e-4,  # f32 op-ordering noise between the two chain rules
        )


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


def _run_mesh_solve_check():
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


class TestShardedFastSolver:
    def test_mesh_solve_matches_single(self):
        # The mesh-sharded solver is the largest XLA:CPU program in the
        # suite; the CPU LLVM JIT segfaults on it once the worker process
        # has accumulated many compiled executables (green standalone —
        # see pytest.ini). Run it isolated in a fresh subprocess.
        import os
        import subprocess
        import sys

        env = dict(os.environ)
        env["PYCOLMAP_TPU_MESH_SOLVE_WORKER"] = "1"
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env["PYTHONPATH"] = os.pathsep.join(
            [repo] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
                      if p]
        )
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=1200,
        )
        assert r.returncode == 0, (r.stdout or "") + (r.stderr or "")


if __name__ == "__main__" and os.environ.get(
    "PYCOLMAP_TPU_MESH_SOLVE_WORKER"
) == "1":
    import os as _os

    _flags = _os.environ.get("XLA_FLAGS", "")
    # replicate conftest's virtual-mesh setup (conftest does not run here)
    for _f in ("--xla_force_host_platform_device_count=8",
               "--xla_cpu_parallel_codegen_split_count=1"):
        if _f.split("=")[0] not in _flags:
            _flags = (_flags + " " + _f).strip()
    _os.environ["XLA_FLAGS"] = _flags
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_compilation_cache", False)
    _run_mesh_solve_check()
    print("mesh solve check OK")


class TestBucketCache:
    def test_structure_cached_and_content_keyed(self):
        from pycolmap_tpu.sfm import ba_kernels as bk

        p1 = make_problem(num_points=300, seed=11)
        b1, pts1, rows1, sel1 = bk._bucketize_cached(p1, None)
        # same graph, different point values -> same cached structure
        p2 = p1._replace(points=p1.points + 0.25)
        b2, pts2, rows2, sel2 = bk._bucketize_cached(p2, None)
        assert b1 is b2 and rows1 is rows2
        assert not np.allclose(pts1[0], pts2[0])
        # different observation graph -> different cache entry
        xy = np.asarray(p1.obs_xy).copy()
        xy[0, 0] += 1.0
        import jax.numpy as jnp

        p3 = p1._replace(obs_xy=jnp.asarray(xy))
        b3, *_ = bk._bucketize_cached(p3, None)
        assert b3 is not b1

    def test_cached_solve_matches_fresh(self):
        from pycolmap_tpu.sfm import ba_kernels as bk

        p = make_problem(num_points=200, seed=12)
        opts = BundleAdjustmentOptions()
        opts.max_num_iterations = 4
        _, s1 = bk.solve_bundle_fast(p, opts, cg_iters=8)
        # second solve hits the device-resident structure cache
        _, s2 = bk.solve_bundle_fast(p, opts, cg_iters=8)
        assert np.isclose(s1.final_cost, s2.final_cost, rtol=1e-5)
