"""Honest perf accounting for the BA fast path: achieved bandwidth vs the
v5e roofline (VERDICT r2 item 6 — replaces the self-referential "NNNx vs
2-core CPU" as the quality judgment of the solver).

Model: the bucketed LM step is HBM-bandwidth-bound. Per LM iteration the
unavoidable J traffic (J = [2, 9+NP, T, P] f32 per bucket) is

    write J once        (res+jac kernel)
  + read J once         (schur_prepare)
  + read J bf16 x k_cg  (CG matvecs; bf16 packing halves bytes)
  + read J once         (back-substitution)

plus the residual/point planes (small) and camera tables (tiny). Everything
else (one-hot matmuls) was eliminated by the fused kernels. The script
counts those bytes from the actual bucket shapes, measures a long warm
solve, and prints achieved GB/s against the v5e HBM roofline (819 GB/s).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ba_roofline.py
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("PYCOLMAP_TPU_BA_PREWARM_NEXT", "0")

import numpy as np

V5E_HBM_GBPS = 819.0
V5E_BF16_TFLOPS = 197.0


def main():
    import jax
    import jax.numpy as jnp

    from pycolmap_tpu.ops.camera_models import CAMERA_MODEL_BY_ID
    from pycolmap_tpu.parallel.synthetic import make_synthetic_bundle
    from pycolmap_tpu.sfm import ba_kernels as bk
    from pycolmap_tpu.sfm.bundle_adjustment import BundleAdjustmentOptions

    CG_ITERS = 20
    problem = make_synthetic_bundle(
        num_images=128, num_points=100_000, obs_per_point=6,
        pose_noise=0.05, point_noise=0.10, refine_intrinsics=True, seed=0,
    )
    NP = CAMERA_MODEL_BY_ID[problem.model_id].num_params
    nj = 9 + NP
    buckets = bk.bucketize(problem)
    slots = sum(b.mask.shape[0] * b.mask.shape[1] for b in buckets)
    obs = int(sum(np.asarray(b.mask).sum() for b in buckets))
    print(f"C3 problem: 128 imgs, 100k pts, {obs} obs, NP={NP}, "
          f"{slots} padded slots over {len(buckets)} buckets")

    # -- bytes per LM iteration (J-stream model) --------------------------
    j_bytes = 2 * nj * slots * 4.0
    res_bytes = 2 * slots * 4.0
    # measure actual average CG iterations with the forcing sequence by
    # comparing iteration counts — conservatively assume the cap
    per_iter_bytes = (
        j_bytes          # write (res+jac)
        + j_bytes        # read (schur_prepare)
        + j_bytes        # read (backsub)
        + res_bytes * 4  # residual planes through the stages
    )
    cg_bytes_per_iter = j_bytes / 2  # bf16-packed J stream per matvec

    # -- measure (resident solver, unique device-side inputs per timed
    # solve: the remote tunnel's result cache serves identical
    # (executable, input) pairs without running) ---------------------------
    from pycolmap_tpu.sfm.resident import ResidentBundleSolver

    options = BundleAdjustmentOptions()
    options.max_num_iterations = 20
    options.function_tolerance = 0.0
    solver = ResidentBundleSolver(problem, options, cg_iters=CG_ITERS)
    solver.solve()  # warm/compile
    best = None
    for eps in (2e-6, 3e-6):
        solver.perturb_points(eps)
        t0 = time.perf_counter()
        s = solver.solve()
        dt = time.perf_counter() - t0
        if best is None or dt < best[0]:
            best = (dt, s)
    dt, s = best
    iters = max(s.num_iterations, 1)
    per_iter = dt / iters
    print(f"warm solve: {iters} LM iters in {dt:.2f}s -> "
          f"{per_iter*1e3:.1f} ms/LM-iter ({iters/dt:.1f} iters/s)")

    # bound the CG iteration count both ways
    for k_cg, label in ((CG_ITERS, f"cap ({CG_ITERS} CG iters/LM)"),
                        (8, "typical adaptive (~8 CG iters/LM)")):
        total = per_iter_bytes + k_cg * cg_bytes_per_iter
        gbps = total / per_iter / 1e9
        print(f"  J-stream model @ {label}: {total/1e6:.0f} MB/LM-iter -> "
              f"achieved {gbps:.0f} GB/s = {100*gbps/V5E_HBM_GBPS:.0f}% of "
              f"v5e HBM roofline ({V5E_HBM_GBPS:.0f} GB/s)")
    print("(>100% of the smaller model means CG exited well before the cap;"
          " <~50% means fixed overheads — dispatch, transfers, camera-side"
          " reductions — still dominate; see ROADMAP Performance #1.)")
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
