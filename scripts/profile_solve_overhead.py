"""Decompose solve_bundle_fast wall time: bucketize / H2D / jit-call(iters) /
D2H / write-back, at bench (C3) scale. Run on TPU."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from pycolmap_tpu.parallel.synthetic import make_synthetic_bundle
from pycolmap_tpu.sfm import ba_kernels as bk
from pycolmap_tpu.sfm.bundle_adjustment import BundleAdjustmentOptions

problem = make_synthetic_bundle(
    num_images=128, num_points=100_000, obs_per_point=6,
    pose_noise=0.05, point_noise=0.10, refine_intrinsics=True, seed=0,
)

t0 = time.perf_counter()
buckets = bk.bucketize(problem)
t_bucket = time.perf_counter() - t0
print(f"bucketize (host):        {t_bucket*1e3:7.1f} ms")

nbytes = sum(sum(np.asarray(a).nbytes for a in b) for b in buckets)
t0 = time.perf_counter()
dbuckets = jax.block_until_ready(jax.device_put(buckets))
t_h2d = time.perf_counter() - t0
print(f"H2D buckets ({nbytes/1e6:.0f} MB):   {t_h2d*1e3:7.1f} ms")

I = bk._pad_4x(problem.num_images, 8)
C = bk._pad_4x(problem.num_cameras, 1)
quat = np.pad(np.asarray(problem.cam_quat, np.float32),
              ((0, I - problem.num_images), (0, 0)))
quat[problem.num_images:, 0] = 1.0
trans = np.pad(np.asarray(problem.cam_trans, np.float32),
               ((0, I - problem.num_images), (0, 0)))
pose_free = np.pad(np.asarray(problem.pose_free, np.float32),
                   ((0, I - problem.num_images), (0, 0)))
intr = np.asarray(problem.intrinsics, np.float32)
intr_free = np.asarray(problem.intr_free, np.float32)
img2cam = np.zeros(I, np.int32)

for iters in (1, 2, 5, 10, 20):
    # warm
    out = bk._solve_bucketed_jit(
        dbuckets, quat, trans, intr, pose_free, intr_free, I, C,
        problem.model_id, 0, jnp.float32(1.0), 20, iters, img2cam=img2cam)
    jax.block_until_ready(out)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = bk._solve_bucketed_jit(
            dbuckets, quat, trans, intr, pose_free, intr_free, I, C,
            problem.model_id, 0, jnp.float32(1.0), 20, iters, img2cam=img2cam)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"jit solve, {iters:2d} LM iters (device-res buckets): "
          f"{dt*1e3:7.1f} ms  ({dt/iters*1e3:6.1f} ms/iter)  "
          f"it_done={int(out[-1])}")

# with host buckets (per-call transfer, as solve_bundle_fast does)
for iters in (5,):
    out = bk._solve_bucketed_jit(
        buckets, quat, trans, intr, pose_free, intr_free, I, C,
        problem.model_id, 0, jnp.float32(1.0), 20, iters, img2cam=img2cam)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = bk._solve_bucketed_jit(
        buckets, quat, trans, intr, pose_free, intr_free, I, C,
        problem.model_id, 0, jnp.float32(1.0), 20, iters, img2cam=img2cam)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"jit solve, {iters:2d} LM iters (HOST buckets):       "
          f"{dt*1e3:7.1f} ms")

t0 = time.perf_counter()
res = jax.device_get(out)
t_d2h = time.perf_counter() - t0
print(f"D2H results:             {t_d2h*1e3:7.1f} ms")

options = BundleAdjustmentOptions()
options.max_num_iterations = 20
options.function_tolerance = 0.0
t0 = time.perf_counter()
_, summary = bk.solve_bundle_fast(problem, options, cg_iters=20)
dt = time.perf_counter() - t0
print(f"solve_bundle_fast e2e ({summary.num_iterations} iters): "
      f"{dt*1e3:7.1f} ms -> {summary.num_iterations/dt:5.1f} iters/s")
