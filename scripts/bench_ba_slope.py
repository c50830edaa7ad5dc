"""Per-LM-iteration cost via two-point slope (removes prologue/compile bias).

Runs the bench.py problem with two LM iteration caps and reports
slope = (t_hi - t_lo) / (iters_hi - iters_lo): the steady-state marginal
cost per LM iteration, independent of fixed setup/transfer costs.

Usage: python scripts/bench_ba_slope.py [--lo 5] [--hi 15]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run(lm_iters: int, cg_iters: int):
    from pycolmap_tpu.parallel.synthetic import make_synthetic_bundle
    from pycolmap_tpu.sfm.bundle_adjustment import (
        BundleAdjustmentOptions,
        solve_bundle,
    )

    problem = make_synthetic_bundle(
        num_images=128,
        num_points=100_000,
        obs_per_point=6,
        pose_noise=0.05,
        point_noise=0.10,
        refine_intrinsics=True,
        seed=0,
    )
    options = BundleAdjustmentOptions()
    options.max_num_iterations = lm_iters
    options.function_tolerance = 0.0

    # compile + warmup
    warm = BundleAdjustmentOptions()
    warm.max_num_iterations = lm_iters
    warm.function_tolerance = 0.0
    solve_bundle(problem, warm, cg_iters=cg_iters)

    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        _, summary = solve_bundle(problem, options, cg_iters=cg_iters)
        dt = time.perf_counter() - t0
        if best is None or dt < best[0]:
            best = (dt, summary.num_iterations)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--lo", type=int, default=5)
    p.add_argument("--hi", type=int, default=15)
    p.add_argument("--cg", type=int, default=20)
    args = p.parse_args()

    t_lo, i_lo = run(args.lo, args.cg)
    t_hi, i_hi = run(args.hi, args.cg)
    print(f"lo: {i_lo} iters in {t_lo:.3f}s   hi: {i_hi} iters in {t_hi:.3f}s")
    if i_hi > i_lo:
        slope = (t_hi - t_lo) / (i_hi - i_lo)
        print(f"slope: {slope*1e3:.1f} ms/LM-iter "
              f"({1.0/slope:.2f} iters/s marginal)")
        print(f"intercept (prologue): {t_lo - slope*i_lo:.3f}s")
    else:
        print("iteration counts equal; raise --hi")


if __name__ == "__main__":
    main()
