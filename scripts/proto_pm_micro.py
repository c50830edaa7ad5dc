"""Micro-bench: one pm_view_costs_pallas eval (isolated from patch_match)."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pycolmap_tpu.mvs import pm_kernels as pmk
    from pycolmap_tpu.mvs import patch_match as pm

    print("backend:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    H, W, K = 240, 320, 8
    radius, step = 5, 2
    Hp = max(-(-H // 8) * 8, pmk.BAND_Y)
    Wp = max(-(-W // 128) * 128, pmk.BAND_X)
    offsets = pm._window_offsets(radius, step)
    nw = len(offsets)
    offs = jnp.asarray(np.asarray(offsets), jnp.float32)
    nty, ntx = Hp // 8, Wp // 128
    T = nty * ntx
    src_pad = jnp.asarray(rng.uniform(0, 1, (K, Hp, Wp)).astype(np.float32))
    w_pad = jnp.asarray(rng.uniform(0, 1, (nw, Hp, Wp)).astype(np.float32))
    wr_pad = jnp.asarray(rng.uniform(0, 1, (nw, Hp, Wp)).astype(np.float32))
    d_pad = jnp.asarray(rng.uniform(2, 8, (Hp, Wp)).astype(np.float32))
    n_pad = jnp.asarray(
        np.broadcast_to(
            np.array([0.0, 0.0, -1.0], np.float32)[:, None, None],
            (3, Hp, Wp),
        ).copy()
    )
    stats_pad = jnp.asarray(
        rng.uniform(0.1, 1, (3, Hp, Wp)).astype(np.float32)
    )
    Kmat = np.array(
        [[300.0, 0, W / 2], [0, 300.0, H / 2], [0, 0, 1]], np.float32
    )
    params = pm._pm_view_params(
        jnp.asarray(np.stack([np.eye(3, dtype=np.float32)] * K)),
        jnp.asarray(0.1 * rng.normal(size=(K, 3)).astype(np.float32)),
        jnp.asarray(np.stack([Kmat] * K)),
        jnp.asarray(Kmat),
        jnp.float32(0.2), jnp.float32(0.3), jnp.float32(3.0),
    )
    y0 = jnp.zeros((K, T), jnp.int32)
    x0 = jnp.zeros((K, T), jnp.int32)

    samples = K * T * nw * 8 * 128  # bilinear fetches per eval

    for geom in (False, True):
        t0 = time.perf_counter()
        out = pmk.pm_view_costs_pallas(
            src_pad, src_pad, w_pad, wr_pad, d_pad, n_pad, stats_pad,
            params, offs, y0, x0, H, W, geom=geom, interpret=False,
        )
        np.asarray(out)
        t_compile = time.perf_counter() - t0
        n = 5
        t0 = time.perf_counter()
        for i in range(n):
            out = pmk.pm_view_costs_pallas(
                src_pad, src_pad, w_pad, wr_pad,
                d_pad + np.float32(0.001 * i), n_pad, stats_pad,
                params, offs, y0, x0, H, W, geom=geom, interpret=False,
            )
            np.asarray(out)
        dt_s = (time.perf_counter() - t0) / n
        print(
            f"pm_view_costs[geom={geom}] {W}x{H} K={K}: "
            f"{dt_s*1e3:.1f} ms/eval ({samples/dt_s/1e9:.2f} G samples/s, "
            f"compile+1st {t_compile:.1f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
