"""TPU-compiled kernel regression gate (VERDICT r2 item 8).

Runs each Pallas kernel family COMPILED on the real chip with fixed seeds
and asserts numerics against its XLA/interpret twin:

  1. SIFT window sampler (f32 exact + bf16 loose) vs bilinear-gather twin
  2. fused matcher top-2 vs the jnp matcher kernel
  3. bucketed BA solver, Pallas kernels vs pure-XLA path (final cost)
  4. PatchMatch banded cost kernel vs the XLA roll-window formulation

One command:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_kernel_gate.py
First-ever run pays remote compiles for signatures not in the executable
cache; warm runs complete in ~1-2 min. Exits 0 on pass, 1 on any mismatch.

The whole suite otherwise exercises Pallas only in interpret mode on CPU
(tests/conftest.py forces the cpu backend), so Mosaic-compiled behavior —
the thing that has actually bitten us (CLAUDE.md) — regressed silently
before this gate existed.
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import numpy as np

FAILURES = []


def check(name, fn):
    t0 = time.perf_counter()
    try:
        fn()
        print(f"[gate] {name}: OK ({time.perf_counter()-t0:.1f}s)", flush=True)
    except Exception as e:  # noqa: BLE001 — report every family
        FAILURES.append(name)
        print(f"[gate] {name}: FAIL ({time.perf_counter()-t0:.1f}s): {e!r}",
              flush=True)


def gate_sampler():
    import jax.numpy as jnp

    from pycolmap_tpu.features import window_sampler as ws
    from test_window_sampler import _make_case

    rng = np.random.default_rng(3)
    volp, ch0, ys, xs = _make_case(rng)
    wins = ws.window_sizes(28.0)
    args = (jnp.asarray(volp), jnp.asarray(ch0), jnp.asarray(ys),
            jnp.asarray(xs))
    ref0, ref1 = ws.sample_windows_reference(*args)
    out0, out1 = ws.sample_windows(*args, *wins, bf16=False)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(ref0), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(ref1), atol=2e-4)
    b0, b1 = ws.sample_windows(*args, *wins, bf16=True)
    np.testing.assert_allclose(np.asarray(b0), np.asarray(ref0), atol=0.05)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(ref1), atol=0.05)


def gate_matcher():
    import jax.numpy as jnp

    from pycolmap_tpu.features import pallas_kernels as pk
    from pycolmap_tpu.features.matcher import _match_kernel

    rng = np.random.default_rng(0)
    d1 = rng.normal(size=(700, 128)).astype(np.float32)
    d2 = rng.normal(size=(900, 128)).astype(np.float32)
    k = 250
    d2[:k] = d1[:k] + rng.normal(0, 0.05, (k, 128)).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    d1p = np.concatenate([d1, np.zeros((68, 128), np.float32)])
    d2p = np.concatenate([d2, np.zeros((124, 128), np.float32)])
    best, second, idx = pk.match_top2(d1p, d2p, len(d1), len(d2))
    ref_idx = np.asarray(
        _match_kernel(
            jnp.asarray(d1p), jnp.asarray(d2p), len(d1), len(d2),
            jnp.float32(2.0), jnp.float32(4.0), False,
        )
    )[: len(d1)]
    # every row has some best column; compare argmax choices
    mism = np.mean(idx != ref_idx)
    assert mism < 1e-3, f"top-1 mismatch rate {mism}"
    # batch twin equals single
    bb, ss, ii = pk.pallas_top2_batch(
        jnp.asarray(np.stack([d1p, d1p])), jnp.asarray(np.stack([d2p, d2p])),
        jnp.asarray([len(d2), len(d2)], np.int32),
    )
    assert np.array_equal(np.asarray(ii)[0][: len(d1)], idx)


def gate_ba():
    from pycolmap_tpu.parallel.synthetic import make_synthetic_bundle
    from pycolmap_tpu.sfm.bundle_adjustment import (
        BundleAdjustmentOptions,
        solve_bundle,
    )

    problem = make_synthetic_bundle(
        num_images=20, num_points=9000, obs_per_point=3, pose_noise=0.02,
        point_noise=0.05, refine_intrinsics=True, seed=1,
    )
    opts = BundleAdjustmentOptions()
    opts.max_num_iterations = 4
    os.environ["PYCOLMAP_TPU_BA_PREWARM_NEXT"] = "0"
    os.environ.pop("PYCOLMAP_TPU_BA_PALLAS", None)
    _, s_pal = solve_bundle(problem, opts, cg_iters=18)
    os.environ["PYCOLMAP_TPU_BA_PALLAS"] = "0"
    try:
        _, s_xla = solve_bundle(problem, opts, cg_iters=18)
    finally:
        os.environ.pop("PYCOLMAP_TPU_BA_PALLAS", None)
    rel = abs(s_pal.final_cost - s_xla.final_cost) / max(s_xla.final_cost, 1e-9)
    assert rel < 1e-2, (
        f"Pallas vs XLA final cost rel diff {rel:.2e} "
        f"({s_pal.final_cost} vs {s_xla.final_cost})"
    )
    assert s_pal.num_iterations == s_xla.num_iterations


def gate_patch_match():
    import jax.numpy as jnp

    from pycolmap_tpu.mvs import patch_match as pm
    from test_pm_kernels import _scene, _window_stats

    H, W, K = 40, 60, 2
    ref, srcs, rays, Kmat, R_rel, t_rel = _scene(H, W, K)
    radius, step = 2, 2
    offsets = pm._window_offsets(radius, step)
    sg = (max(radius, 1) / 1.5) ** 2
    sigma_color = jnp.float32(0.2)
    ref_j = jnp.asarray(ref)
    ref_off, w_off, w_sum, ref_mean, ref_var = _window_stats(
        ref_j, offsets, sg, sigma_color
    )
    rays_j = jnp.asarray(rays)
    rays_off = jnp.stack(
        [jnp.roll(rays_j, (-dy, -dx), axis=(1, 2)) for dy, dx in offsets]
    )
    rng = np.random.default_rng(11)
    depth = jnp.asarray(
        (5.0 + rng.uniform(-0.5, 0.5, (H, W))).astype(np.float32)
    )
    normal = jnp.asarray(
        np.broadcast_to(
            np.array([0, 0, -1.0], np.float32), rays.shape[1:] + (3,)
        ).transpose(2, 0, 1).copy()
    )
    src_depths = jnp.asarray(
        np.broadcast_to(np.asarray(depth)[None], (K, H, W)).copy()
    )
    Ks = jnp.asarray(np.stack([Kmat] * K))
    Ks_inv = jnp.asarray(np.stack([np.linalg.inv(Kmat)] * K))
    geom_w, geom_max = jnp.float32(0.3), jnp.float32(3.0)

    c_xla = pm.view_costs_xla(
        depth, normal, jnp.asarray(srcs), rays_j, jnp.asarray(R_rel),
        jnp.asarray(t_rel), Ks, rays_off, ref_off, w_off, w_sum, ref_mean,
        ref_var, False, jnp.asarray(Kmat), Ks_inv, src_depths, geom_w,
        geom_max,
    )
    vc = pm.make_pallas_view_costs(
        ref_j, jnp.asarray(srcs), rays_j, Ks, jnp.asarray(R_rel),
        jnp.asarray(t_rel), jnp.asarray(Kmat), w_off, ref_off, w_sum,
        ref_mean, ref_var, offsets, sigma_color, False, src_depths, geom_w,
        geom_max, radius, interpret=False,  # COMPILED on the chip
    )
    c_pal = vc(depth, normal)
    m = radius + 1
    a = np.asarray(c_xla)[:, m:-m, m:-m]
    b = np.asarray(c_pal)[:, m:-m, m:-m]
    valid = a < 1.99
    assert valid.mean() > 0.7
    np.testing.assert_allclose(b[valid], a[valid], atol=1e-2, rtol=0)


def main():
    import jax

    backend = jax.default_backend()
    print(f"[gate] backend: {backend} devices: {jax.devices()}", flush=True)
    if backend == "cpu":
        print("[gate] WARNING: running on CPU — this gate is meant for the "
              "real chip", flush=True)
    t0 = time.perf_counter()
    check("sampler", gate_sampler)
    check("matcher_top2", gate_matcher)
    check("patch_match_cost", gate_patch_match)
    check("ba_solver", gate_ba)
    print(f"[gate] total {time.perf_counter()-t0:.1f}s; "
          f"{'FAIL: ' + ','.join(FAILURES) if FAILURES else 'ALL OK'}",
          flush=True)
    sys.stdout.flush()
    os._exit(1 if FAILURES else 0)


if __name__ == "__main__":
    main()
