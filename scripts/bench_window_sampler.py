"""Micro-bench of the SIFT window sampler (f32 vs bf16 tents) on TPU.

Scan-amplified timing: N sampler calls inside one jit to beat the tunnel
dispatch noise. Shapes mirror the descriptor stage at 1280x960 (K=4096
keypoints padded to 8192 slots, 16x16 sample grid, WIN 72x256)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from pycolmap_tpu.features import window_sampler as ws

K = 4096
WIN_Y, WIN_X = 72, 256
LHP, WP = 4096, 1408
REPS = 20

rng = np.random.default_rng(0)
vol = jnp.asarray(rng.normal(size=(2, LHP, WP)).astype(np.float32))
ch0 = jnp.zeros(K, jnp.int32)
base_y = rng.uniform(0, LHP - WIN_Y - 16, K).astype(np.float32)
base_x = rng.uniform(0, WP - WIN_X - 140, K).astype(np.float32)
off = rng.uniform(0, 40, (K, 16, 16)).astype(np.float32)
ys = jnp.asarray(base_y[:, None, None] + off)
xs = jnp.asarray(base_x[:, None, None] + off)


def run(bf16):
    @jax.jit
    def many(vol, ys, xs):
        acc = jnp.float32(0.0)
        for r in range(REPS):
            v0, v1 = ws.sample_windows(
                vol, ch0, ys + r * 1e-3, xs, WIN_Y, WIN_X, bf16=bf16
            )
            acc = acc + jnp.sum(v0) + jnp.sum(v1)
        return acc

    jax.block_until_ready(many(vol, ys, xs))
    t0 = time.perf_counter()
    jax.block_until_ready(many(vol, ys, xs))
    dt = (time.perf_counter() - t0) / REPS
    print(f"sampler bf16={bf16}: {dt*1e3:7.2f} ms/call (K={K})")
    return dt


d32 = run(False)
d16 = run(True)
print(f"speedup: {d32/d16:.2f}x")
