"""Stage-level profiling of the bucketed BA path on TPU."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from pycolmap_tpu.ops.camera_models import MAX_PARAMS
from pycolmap_tpu.parallel.synthetic import make_synthetic_bundle
from pycolmap_tpu.sfm import ba_kernels as bk


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


problem = make_synthetic_bundle(
    num_images=128, num_points=100_000, obs_per_point=6,
    pose_noise=0.05, point_noise=0.10, refine_intrinsics=True,
)
buckets = bk.bucketize(problem)
b = buckets[0]
T, P = b.mask.shape
I = problem.num_images
C = 1
print(f"bucket: T={T} P={P}  backend={jax.devices()[0]}")

quat = problem.cam_quat
trans = problem.cam_trans
intr = problem.intrinsics
intr_free = problem.intr_free

f_rj = jax.jit(
    lambda q, t, k: bk._bucket_res_and_jac(problem.model_id, b, q, t, k, intr_free)
)
t = timeit(f_rj, quat, trans, intr, n=5)
print(f"res+jac (21 jvps): {t*1e3:7.1f} ms")
res, J = f_rj(quat, trans, intr)

onehot_i = jax.nn.one_hot(b.img_idx.reshape(-1), I, dtype=jnp.bfloat16)
onehot_c = jax.nn.one_hot(b.cam_idx.reshape(-1), C, dtype=jnp.bfloat16)

def build_V(J):
    Jp = J[:, 18:21]
    pairs = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
    V = jnp.stack([jnp.sum(Jp[:, i] * Jp[:, j], axis=(0, 1)) for i, j in pairs])
    return bk._inv3x3_planes(V + 1e-3)

t = timeit(jax.jit(build_V), J, n=5)
print(f"V build + inv: {t*1e3:7.1f} ms")
Vinv = build_V(J)

def scatter(vals):
    return bk._scatter_cam(vals, onehot_i, b.img_idx, I)

gp = jnp.ones((6, T, P))
t = timeit(jax.jit(scatter), gp)
print(f"scatter [6,T,P]->[I,6] (onehot mm): {t*1e3:7.1f} ms")

def einsum_rk(J, d):
    return jnp.einsum("rkts,rts->kts", J[:, :6], d)

d = jnp.ones((2, T, P))
t = timeit(jax.jit(einsum_rk), J, d)
print(f"einsum rkts,rts->kts [2,6]: {t*1e3:7.1f} ms")

def manual_rk(J, d):
    return jnp.stack([J[0, k] * d[0] + J[1, k] * d[1] for k in range(6)])

t = timeit(jax.jit(manual_rk), J, d)
print(f"manual rk contraction: {t*1e3:7.1f} ms")

def einsum_yp(J, a):
    return jnp.einsum("rkts,rts->ks", J[:, 18:21], a)

t = timeit(jax.jit(einsum_yp), J, d)
print(f"einsum rkts,rts->ks (y_p): {t*1e3:7.1f} ms")

def manual_yp(J, a):
    return jnp.stack(
        [jnp.sum(J[0, 18 + k] * a[0] + J[1, 18 + k] * a[1], axis=0) for k in range(3)]
    )

t = timeit(jax.jit(manual_yp), J, d)
print(f"manual y_p: {t*1e3:7.1f} ms")

x_pose = jnp.ones((I, 6))
x_intr = jnp.ones((C, MAX_PARAMS))

def gather6(x):
    return bk._gather_table(x, b.img_idx)

t = timeit(jax.jit(gather6), x_pose)
print(f"gather pose 6x[T,P]: {t*1e3:7.1f} ms")

def a_obs_fn(x_pose, x_intr, J):
    xp = bk._gather_table(x_pose, b.img_idx)
    xi = bk._gather_table(x_intr, b.cam_idx)
    return sum(J[:, k] * xp[k][None] for k in range(6)) + sum(
        J[:, 6 + k] * xi[k][None] for k in range(MAX_PARAMS)
    )

t = timeit(jax.jit(a_obs_fn), x_pose, x_intr, J)
print(f"a_obs (18-term J.x): {t*1e3:7.1f} ms")
