"""PatchMatch kernel throughput on the device: XLA vs Pallas cost path.

Usage: python scripts/bench_patch_match.py [--sizes 240x320,480x640]
       [--views 8] [--iters 5] [--paths xla,pallas] [--geom]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="240x320")
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--paths", default="xla,pallas")
    ap.add_argument("--geom", action="store_true")
    ap.add_argument("--radius", type=int, default=5)
    ap.add_argument("--step", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pycolmap_tpu.mvs.patch_match import patch_match_kernel

    print("backend:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)

    for size in args.sizes.split(","):
        H, W = (int(x) for x in size.split("x"))
        K = args.views
        f = 1.2 * max(H, W)
        Kmat = np.array(
            [[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32
        )
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
        pix = np.stack([xx + 0.5, yy + 0.5, np.ones_like(xx)])
        rays = np.einsum(
            "ij,jhw->ihw", np.linalg.inv(Kmat), pix
        ).astype(np.float32)
        ref = rng.uniform(0, 1, (H, W)).astype(np.float32)
        srcs = rng.uniform(0, 1, (K, H, W)).astype(np.float32)
        R_rel = np.stack([np.eye(3, dtype=np.float32)] * K)
        t_rel = (0.1 * rng.normal(size=(K, 3))).astype(np.float32)
        base = rng.uniform(2.0, 8.0, (-(-H // 8), -(-W // 128)))
        depth0 = np.repeat(np.repeat(base, 8, 0), 128, 1)[:H, :W].astype(
            np.float32
        )
        normal0 = (-rays / np.linalg.norm(rays, axis=0)).astype(np.float32)
        kwargs = {}
        if args.geom:
            kwargs = dict(
                geom_consistency=True,
                Ks_inv=jnp.asarray(np.stack([np.linalg.inv(Kmat)] * K)),
                src_depths=jnp.asarray(
                    np.full((K, H, W), 5.0, np.float32)
                ),
                geom_w=jnp.float32(0.3),
                geom_max_cost=jnp.float32(3.0),
            )

        for path in args.paths.split(","):
            use_pallas = path == "pallas"
            t0 = time.perf_counter()
            out = patch_match_kernel(
                jax.random.PRNGKey(0),
                jnp.asarray(ref), jnp.asarray(srcs), jnp.asarray(rays),
                jnp.asarray(np.stack([Kmat] * K)), jnp.asarray(R_rel),
                jnp.asarray(t_rel),
                jnp.asarray(depth0), jnp.asarray(normal0),
                jnp.float32(2.0), jnp.float32(8.0),
                jnp.float32(0.2), jnp.float32(0.6),
                args.iters, args.radius, args.step,
                Kr=jnp.asarray(Kmat), pallas=use_pallas, **kwargs,
            )
            jax.block_until_ready(out)
            t_compile = time.perf_counter() - t0
            n = 3
            t0 = time.perf_counter()
            for i in range(n):
                # vary inputs per rep and fetch to host: defeats any
                # remote-side result caching in the device tunnel
                out = patch_match_kernel(
                    jax.random.PRNGKey(i + 1),
                    jnp.asarray(ref), jnp.asarray(srcs), jnp.asarray(rays),
                    jnp.asarray(np.stack([Kmat] * K)), jnp.asarray(R_rel),
                    jnp.asarray(t_rel),
                    jnp.asarray(depth0 + np.float32(0.01 * i)),
                    jnp.asarray(normal0),
                    jnp.float32(2.0), jnp.float32(8.0),
                    jnp.float32(0.2), jnp.float32(0.6),
                    args.iters, args.radius, args.step,
                    Kr=jnp.asarray(Kmat), pallas=use_pallas, **kwargs,
                )
                np.asarray(out[0])
            dt = (time.perf_counter() - t0) / n
            geo = "geom" if args.geom else "photo"
            print(
                f"patch_match[{path},{geo}] {W}x{H} K={K} "
                f"iters={args.iters}: {dt*1e3:.0f} ms/image "
                f"(compile+1st {t_compile:.1f}s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
