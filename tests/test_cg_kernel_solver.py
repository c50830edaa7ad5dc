"""Full bucketed LM solve with the fused Pallas matvec + preparation
kernels (interpret mode). Env is set at import time (before any solve
traces) so the jit-cached solver picks up the forced kernels + forced
implicit-CG path; pytest.ini's --dist loadfile gives this file its own
worker process. Numerical parity of each kernel vs references is covered
cheaply in test_cg_kernel.py — this test only checks the solver converges
end-to-end through the Pallas path.
"""

import os

os.environ["PYCOLMAP_TPU_BA_PALLAS"] = "1"
os.environ["PYCOLMAP_TPU_DENSE_SCHUR_MAX_D"] = "0"
# force every bucket through the Pallas kernels regardless of size (the
# hybrid router would otherwise send these tiny test buckets to XLA)
os.environ["PYCOLMAP_TPU_BA_PALLAS_MIN_SLOTS"] = "0"


def test_solver_with_pallas_matvec_converges():
    from pycolmap_tpu.parallel.synthetic import make_synthetic_bundle
    from pycolmap_tpu.sfm.bundle_adjustment import (
        BundleAdjustmentOptions,
        solve_bundle,
    )

    problem = make_synthetic_bundle(
        num_images=7,
        num_points=120,
        obs_per_point=4,
        pose_noise=0.03,
        point_noise=0.05,
        refine_intrinsics=True,
        seed=3,
    )
    options = BundleAdjustmentOptions()
    options.max_num_iterations = 5
    options.function_tolerance = 0.0
    _, summary = solve_bundle(problem, options, cg_iters=15)
    assert summary.final_cost < 0.1 * summary.initial_cost
