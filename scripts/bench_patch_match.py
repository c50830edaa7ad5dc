"""PatchMatch kernel wall-clock on TPU (per-image, photometric pass)."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from pycolmap_tpu.mvs.patch_match import patch_match_kernel


def main(H=480, W=640, K=4, iters=5, radius=5, step=2):
    rng = np.random.default_rng(0)
    ref = rng.uniform(0, 1, (H, W)).astype(np.float32)
    srcs = rng.uniform(0, 1, (K, H, W)).astype(np.float32)
    Kmat = np.array([[500.0, 0, W / 2], [0, 500.0, H / 2], [0, 0, 1]], np.float32)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    pix = np.stack([xx + 0.5, yy + 0.5, np.ones_like(xx)])
    rays = np.einsum("ij,jhw->ihw", np.linalg.inv(Kmat), pix).astype(np.float32)
    R_rel = np.stack([np.eye(3, dtype=np.float32)] * K)
    t_rel = (0.1 * rng.normal(size=(K, 3))).astype(np.float32)
    depth0 = rng.uniform(2, 10, (H, W)).astype(np.float32)
    n0 = (-rays / np.linalg.norm(rays, axis=0)).astype(np.float32)

    args = (
        jax.random.PRNGKey(0), jnp.asarray(ref), jnp.asarray(srcs),
        jnp.asarray(rays), jnp.asarray(np.stack([Kmat] * K)),
        jnp.asarray(R_rel), jnp.asarray(t_rel), jnp.asarray(depth0),
        jnp.asarray(n0), jnp.float32(2.0), jnp.float32(10.0),
        jnp.float32(0.2), jnp.float32(0.6), iters, radius, step,
    )
    t0 = time.perf_counter()
    out = patch_match_kernel(*args)
    s = float(jnp.sum(out[0]))
    print(f"compile+run: {time.perf_counter() - t0:.1f} s")
    t0 = time.perf_counter()
    out = patch_match_kernel(*args)
    s = float(jnp.sum(out[0]))
    dt = time.perf_counter() - t0
    print(f"warm run {W}x{H} K={K} iters={iters}: {dt:.2f} s  checksum={s:.3f}")


if __name__ == "__main__":
    main()
