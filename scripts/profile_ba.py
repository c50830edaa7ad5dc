"""Profile BA components on the current backend (TPU by default)."""

import time

import jax
import jax.numpy as jnp

from pycolmap_tpu.parallel.synthetic import make_synthetic_bundle
from pycolmap_tpu.sfm import bundle_adjustment as ba


def timeit(fn, *args, n=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    problem = make_synthetic_bundle(
        num_images=128, num_points=100_000, obs_per_point=6,
        pose_noise=0.05, point_noise=0.10, refine_intrinsics=True,
    )
    I, C, P, M = (
        problem.num_images, problem.num_cameras, problem.num_points, problem.num_obs,
    )
    print(f"problem: {I} images, {P} points, {M} obs, backend={jax.devices()[0]}")

    rj = jax.jit(
        lambda q, t, k, x: ba._residuals_and_jacobians(problem, q, t, k, x)
    )
    t = timeit(
        rj, problem.cam_quat, problem.cam_trans, problem.intrinsics, problem.points
    )
    print(f"residuals+jacobians: {t*1e3:.1f} ms")

    res, J_pose, J_intr, J_pt = rj(
        problem.cam_quat, problem.cam_trans, problem.intrinsics, problem.points
    )

    def build_V(J_pt):
        return jax.ops.segment_sum(
            jnp.einsum("mri,mrj->mij", J_pt, J_pt), problem.obs_point_idx,
            num_segments=P,
        )

    t = timeit(jax.jit(build_V), J_pt)
    print(f"V build (einsum+segsum points): {t*1e3:.1f} ms")

    V = build_V(J_pt)
    V_inv = jnp.linalg.inv(V + 1e-3 * jnp.eye(3))

    def inv_V(V):
        return jnp.linalg.inv(V + 1e-3 * jnp.eye(3))

    t = timeit(jax.jit(inv_V), V)
    print(f"V inverse [P,3,3]: {t*1e3:.1f} ms")

    def matvec(x_pose, x_intr):
        Jx_cam = jnp.einsum(
            "mri,mi->mr", J_pose, x_pose[problem.obs_image_idx]
        ) + jnp.einsum("mri,mi->mr", J_intr, x_intr[problem.obs_camera_idx])
        y_p = jax.ops.segment_sum(
            jnp.einsum("mri,mr->mi", J_pt, Jx_cam), problem.obs_point_idx, num_segments=P
        )
        z_p = jnp.einsum("pij,pj->pi", V_inv, y_p)
        Jz = jnp.einsum("mri,mi->mr", J_pt, z_p[problem.obs_point_idx])
        d = Jx_cam - Jz
        out_pose = jax.ops.segment_sum(
            jnp.einsum("mri,mr->mi", J_pose, d), problem.obs_image_idx, num_segments=I
        )
        out_intr = jax.ops.segment_sum(
            jnp.einsum("mri,mr->mi", J_intr, d), problem.obs_camera_idx, num_segments=C
        )
        return out_pose, out_intr

    xp = jnp.ones((I, 6))
    xi = jnp.ones((C, 12))
    t = timeit(jax.jit(matvec), xp, xi)
    print(f"CG matvec: {t*1e3:.1f} ms  (x20 = {t*20*1e3:.1f} ms)")

    # isolate the segment_sums
    vals = jnp.einsum("mri,mr->mi", J_pose, res)

    def seg_img(v):
        return jax.ops.segment_sum(v, problem.obs_image_idx, num_segments=I)

    t = timeit(jax.jit(seg_img), vals)
    print(f"segment_sum to images [M,6]->[I,6]: {t*1e3:.1f} ms")

    vals3 = jnp.einsum("mri,mr->mi", J_pt, res)

    def seg_pt(v):
        return jax.ops.segment_sum(v, problem.obs_point_idx, num_segments=P)

    t = timeit(jax.jit(seg_pt), vals3)
    print(f"segment_sum to points [M,3]->[P,3]: {t*1e3:.1f} ms")

    def seg_pt_sorted(v):
        return jax.ops.segment_sum(
            v, problem.obs_point_idx, num_segments=P, indices_are_sorted=True
        )

    t = timeit(jax.jit(seg_pt_sorted), vals3)
    print(f"segment_sum to points (sorted hint): {t*1e3:.1f} ms")

    # one-hot matmul alternative for image reduction
    onehot = jax.nn.one_hot(problem.obs_image_idx, I, dtype=jnp.bfloat16)

    def seg_img_mm(v):
        return jax.lax.dot_general(
            onehot.astype(jnp.bfloat16).T, v.astype(jnp.bfloat16),
            ((((1,), (0,))), ((), ())),
            preferred_element_type=jnp.float32,
        )

    t = timeit(jax.jit(seg_img_mm), vals)
    print(f"one-hot bf16 matmul to images: {t*1e3:.1f} ms")

    # gather cost
    def gather_pts(points):
        return points[problem.obs_point_idx]

    t = timeit(jax.jit(gather_pts), problem.points)
    print(f"gather points [P,3]->[M,3]: {t*1e3:.1f} ms")


if __name__ == "__main__":
    main()
