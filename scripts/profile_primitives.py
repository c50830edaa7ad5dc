"""Microbenchmarks of gather/scatter formulations on TPU for the BA datapath."""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=10, warmup=3):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


M = 600_000
P = 100_000
I = 128
rng = np.random.default_rng(0)
pt_idx_sorted = jnp.asarray(np.repeat(np.arange(P), 6).astype(np.int32))
img_idx = jnp.asarray(rng.integers(0, I, M).astype(np.int32))
img_idx_sorted = jnp.asarray(np.sort(rng.integers(0, I, M)).astype(np.int32))

for k in (3, 6, 8, 16, 128):
    x = jnp.asarray(rng.normal(size=(P, k)).astype(np.float32))
    t = timeit(jax.jit(lambda x, i: x[i]), x, pt_idx_sorted)
    print(f"gather [P,{k}] -> [M,{k}]: {t*1e3:6.1f} ms  ({M*k*4/t/1e9:.1f} GB/s out)")

for k in (6, 8, 16):
    xi = jnp.asarray(rng.normal(size=(I, k)).astype(np.float32))
    t = timeit(jax.jit(lambda x, i: x[i]), xi, img_idx)
    print(f"gather [I,{k}] -> [M,{k}]: {t*1e3:6.1f} ms")

onehot_bf = jax.nn.one_hot(img_idx, I, dtype=jnp.bfloat16)

def gather_mm(x):
    return jax.lax.dot_general(
        onehot_bf, x.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

xi8 = jnp.asarray(rng.normal(size=(I, 8)).astype(np.float32))
t = timeit(jax.jit(gather_mm), xi8)
print(f"gather via onehot-matmul [I,8]->[M,8]: {t*1e3:6.1f} ms")

vals = jnp.asarray(rng.normal(size=(M, 8)).astype(np.float32))

t = timeit(jax.jit(lambda v: jax.ops.segment_sum(v, img_idx, num_segments=I)), vals)
print(f"segment_sum img unsorted [M,8]->[I,8]: {t*1e3:6.1f} ms")
t = timeit(jax.jit(lambda v: jax.ops.segment_sum(v, img_idx_sorted, num_segments=I, indices_are_sorted=True)), vals)
print(f"segment_sum img sorted   [M,8]->[I,8]: {t*1e3:6.1f} ms")

def scatter_mm(v):
    return jax.lax.dot_general(
        onehot_bf, v.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
t = timeit(jax.jit(scatter_mm), vals)
print(f"scatter via onehot-matmul [M,8]->[I,8]: {t*1e3:6.1f} ms")

# point-side scatter: segment_sum sorted vs reshape-sum (bucketed layout)
vals3 = jnp.asarray(rng.normal(size=(M, 3)).astype(np.float32))
t = timeit(jax.jit(lambda v: jax.ops.segment_sum(v, pt_idx_sorted, num_segments=P, indices_are_sorted=True)), vals3)
print(f"segment_sum pts sorted [M,3]->[P,3]: {t*1e3:6.1f} ms")

vals_b = vals3.reshape(P, 6, 3)
t = timeit(jax.jit(lambda v: jnp.sum(v, axis=1)), vals_b)
print(f"bucketed sum [P,6,3]->[P,3]:        {t*1e3:6.1f} ms")

# bucketed broadcast (replaces point gather)
zp = jnp.asarray(rng.normal(size=(P, 3)).astype(np.float32))
t = timeit(jax.jit(lambda z: jnp.broadcast_to(z[:, None, :], (P, 6, 3)) * vals_b), zp)
print(f"bucketed broadcast mult [P,3]x[P,6,3]: {t*1e3:6.1f} ms")

# einsum costs
J = jnp.asarray(rng.normal(size=(M, 2, 6)).astype(np.float32))
x6 = jnp.asarray(rng.normal(size=(M, 6)).astype(np.float32))
t = timeit(jax.jit(lambda J, x: jnp.einsum("mri,mi->mr", J, x)), J, x6)
print(f"einsum mri,mi->mr [M,2,6]: {t*1e3:6.1f} ms")
Jp = jnp.asarray(rng.normal(size=(M, 2, 3)).astype(np.float32))
t = timeit(jax.jit(lambda J: jnp.einsum("mri,mrj->mij", J, J)), Jp)
print(f"einsum mri,mrj->mij [M,2,3]: {t*1e3:6.1f} ms")

# V inverse alternatives
V = jnp.asarray(rng.normal(size=(P, 3, 3)).astype(np.float32))
V = V @ V.transpose(0, 2, 1) + 3 * jnp.eye(3)
t = timeit(jax.jit(lambda V: jnp.linalg.inv(V)), V)
print(f"linalg.inv [P,3,3]: {t*1e3:6.1f} ms")

def inv3x3(V):
    a, b, c = V[:, 0, 0], V[:, 0, 1], V[:, 0, 2]
    d, e, f = V[:, 1, 1], V[:, 1, 2], V[:, 2, 2]
    A = d * f - e * e
    B = c * e - b * f
    C = b * e - c * d
    det = a * A + b * B + c * C
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    D = a * f - c * c
    E = b * c - a * e
    F = a * d - b * b
    rows = jnp.stack([A, B, C, B, D, E, C, E, F], axis=-1) / det[:, None]
    return rows.reshape(-1, 3, 3)

t = timeit(jax.jit(inv3x3), V)
print(f"closed-form inv [P,3,3]: {t*1e3:6.1f} ms")
