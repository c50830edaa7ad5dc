"""Benchmark: bundle-adjustment LM iterations/sec on a C3-scale problem.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Problem scale mirrors BASELINE.md C3 (south-building full, 128 images):
128 cameras, 100k points, ~600k observations. The metric is steady-state
Levenberg-Marquardt iterations/sec of the Schur-eliminated PCG solver
(each LM iteration = residuals + 21-tangent fwd-mode Jacobians + point-block
factorization + 20 PCG iterations on the reduced camera system + back-subst),
measured whole-solve through the device-resident re-solve API
(sfm/resident.py: structure and parameters stay on device between solves;
each timed solve dispatches the packed executable and fetches the summary
scalars). Inputs are uniquely perturbed per timed solve on device, so the
remote tunnel's result cache cannot serve a stored answer.

vs_baseline: the reference (pycolmap/COLMAP+Ceres) is not installable in this
environment (no pip; COLMAP C++ not vendored), so the baseline is the same
solver pinned to single-host CPU — the hardware class the reference runs on
for this scene scale (BASELINE.md: reference has no GPU BA; Ceres BA is
CPU-only). vs_baseline = tpu_iters_per_sec / cpu_iters_per_sec.
"""

import json
import os
import subprocess
import sys
import time

# Bench shapes are fixed: the next-signature compile prewarm
# (sfm/ba_kernels._prewarm_next_signatures) would only spawn daemon
# threads whose in-flight remote compiles abort interpreter teardown
# (RC=134) when the process exits right after printing.
os.environ.setdefault("PYCOLMAP_TPU_BA_PREWARM_NEXT", "0")

NUM_IMAGES = 128
NUM_POINTS = 100_000
OBS_PER_POINT = 6
CG_ITERS = 20
LM_ITERS = 20


def run_ba(lm_iters: int):
    from pycolmap_tpu.parallel.synthetic import make_synthetic_bundle
    from pycolmap_tpu.sfm.bundle_adjustment import BundleAdjustmentOptions
    from pycolmap_tpu.sfm.resident import ResidentBundleSolver

    problem = make_synthetic_bundle(
        num_images=NUM_IMAGES,
        num_points=NUM_POINTS,
        obs_per_point=OBS_PER_POINT,
        pose_noise=0.05,
        point_noise=0.10,
        refine_intrinsics=True,
        seed=0,
    )
    options = BundleAdjustmentOptions()
    options.max_num_iterations = lm_iters
    options.function_tolerance = 0.0

    # resident solver (sfm/resident.py): bucket structure AND parameters
    # stay on device across re-solves — the production posture for repeated
    # solves on one graph (iterative global refinement) and the r3-verdict
    # methodology for the headline number. Warm both iteration variants.
    solver = ResidentBundleSolver(problem, options, cg_iters=CG_ITERS)
    solver.solve()
    solver.solve(max_iterations=1)

    # every timed solve still gets a UNIQUE input (device-side point
    # perturbation): the remote tunnel serves content-identical
    # (executable, input) pairs from a result cache, which would time the
    # transfer instead of the solve
    def timed(iters, eps):
        solver.perturb_points(eps)
        t0 = time.perf_counter()
        s = solver.solve(max_iterations=iters)
        return time.perf_counter() - t0, s

    dt, summary = min(
        (timed(lm_iters, 2e-6), timed(lm_iters, 3e-6)), key=lambda x: x[0]
    )
    # marginal rate: subtract the remaining per-solve fixed cost (dispatch
    # round trip + stats fetch), measured via 1-iteration solves on
    # further-perturbed inputs
    dt1 = min(timed(1, 4e-6)[0], timed(1, 5e-6)[0])
    iters = max(summary.num_iterations, 1)
    marginal = (
        (iters - 1) / max(dt - dt1, 1e-9)
        if iters > 1 and dt > dt1
        else None
    )
    return iters / dt, marginal, summary


def run_mapping():
    """C1-scale incremental mapping: registered images/sec (fresh graph).

    30 synthetic images / 2000 points with verified matches — the mapper,
    triangulator and local/global BA scheduling end-to-end (the second
    headline metric of BASELINE.json). Wall-clock includes any compiles not
    yet in the persistent executable cache (utils/aot_cache.py), matching
    how a user experiences a fresh process."""
    import sys as _sys
    import tempfile
    from pathlib import Path

    _sys.path.insert(0, str(Path(__file__).resolve().parent / "tests"))
    from test_incremental_mapping import make_synthetic_database

    from pycolmap_tpu.pipeline.sfm import (
        IncrementalPipelineOptions,
        incremental_mapping,
    )

    with tempfile.TemporaryDirectory() as td:
        out = Path(td)
        make_synthetic_database(
            out / "db.db", num_images=30, num_points=2000, pixel_noise=0.4
        )
        options = IncrementalPipelineOptions()
        options.min_model_size = 6
        options.extract_colors = False
        t0 = time.perf_counter()
        recs = incremental_mapping(out / "db.db", out, out / "sparse", options)
        dt = time.perf_counter() - t0
        n_reg = recs[0].num_reg_images if recs else 0
    return n_reg / dt, n_reg


def run_sift():
    """Whole-extract SIFT ms at 960x1280 (pipelined unique inputs, hard
    sync at end — the r4 methodology; BASELINE.md SIFT row)."""
    import numpy as np

    import jax

    from pycolmap_tpu.features.sift import Sift, SiftExtractionOptions

    H, W = 960, 1280

    def make_u8(seed):
        r = np.random.default_rng(seed)
        base = r.normal(0.5, 0.15, (H // 8, W // 8))
        img = np.kron(base, np.ones((8, 8))) + r.normal(0, 0.05, (H, W))
        return (np.clip(img, 0, 1) * 255).astype(np.uint8)

    s = Sift(SiftExtractionOptions())
    imgs = [make_u8(i) for i in range(8)]
    s.extract(imgs[0])  # warm

    from pycolmap_tpu.features.sift import _cached_extract, _extract_jit

    def run(idxs):
        t0 = time.perf_counter()
        outs = [
            _cached_extract(
                _extract_jit, "sift1", s._to_device_input(imgs[i]),
                s._static_params(H, W),
            )
            for i in idxs
        ]
        for o in outs:
            jax.block_until_ready(o)
        return (time.perf_counter() - t0) / len(idxs)

    single_ms = min(run([1, 2, 3, 4, 5, 6]), run([7, 2, 4, 6, 1, 3])) * 1000.0

    # production path: pipeline/extract_features batches 4 images per
    # dispatch (amortizes the dispatch + sync overhead the single-extract
    # number pays per image)
    try:
        s.extract_batch(imgs[0:4])  # warm
        t0 = time.perf_counter()
        s.extract_batch(imgs[4:8])
        b1 = (time.perf_counter() - t0) / 4
        t0 = time.perf_counter()
        s.extract_batch([imgs[2], imgs[5], imgs[1], imgs[7]])
        b2 = (time.perf_counter() - t0) / 4
        batch_ms = min(b1, b2) * 1000.0
    except Exception:
        batch_ms = None
    return single_ms, batch_ms


def main():
    if os.environ.get("BENCH_CPU_WORKER"):
        import jax

        jax.config.update("jax_platforms", "cpu")
        rate, _, _ = run_ba(lm_iters=3)
        print(json.dumps({"cpu_rate": rate}))
        return

    rate, marginal, summary = run_ba(lm_iters=LM_ITERS)

    try:
        reg_per_sec, n_reg = run_mapping()
    except Exception:
        reg_per_sec, n_reg = None, 0

    try:
        sift_ms, sift_batch_ms = run_sift()
    except Exception:
        sift_ms, sift_batch_ms = None, None

    # CPU baseline in a subprocess (fresh backend selection)
    cpu_rate = None
    try:
        env = dict(os.environ)
        env["BENCH_CPU_WORKER"] = "1"
        # the CPU baseline must use the XLA paths: interpret-mode Pallas
        # (the CPU fallback of PYCOLMAP_TPU_BA_PALLAS=1) is not a baseline
        env["PYCOLMAP_TPU_BA_PALLAS"] = "0"
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            timeout=1800,
        )
        for line in out.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                cpu_rate = json.loads(line).get("cpu_rate")
    except Exception:
        cpu_rate = None

    vs_baseline = (rate / cpu_rate) if cpu_rate else None
    print(
        json.dumps(
            {
                "metric": "ba_lm_iterations_per_sec_128img_600kobs",
                "value": round(rate, 3),
                "unit": "iters/s",
                "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
                "marginal_iters_per_sec": (
                    round(marginal, 2) if marginal else None
                ),
                "registered_images_per_sec_30img_fresh": (
                    round(reg_per_sec, 3) if reg_per_sec else None
                ),
                "registered_images": n_reg,
                "sift_extract_ms_960x1280": (
                    round(sift_ms, 1) if sift_ms else None
                ),
                "sift_extract_batch4_ms_per_image": (
                    round(sift_batch_ms, 1) if sift_batch_ms else None
                ),
            }
        )
    )
    # skip interpreter teardown: any background thread blocked in a remote
    # tunnel RPC at exit aborts the process (observed "FATAL: exception not
    # rethrown" -> RC 134) after the result line has already been printed
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
