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
    sg = (max(radius, 1) / 1.5) ** 2
    offs_t = tuple((int(dy), int(dx)) for dy, dx in offsets)
    wsp_t = tuple(
        float(x)
        for x in np.exp(-(offsets[:, 0] ** 2 + offsets[:, 1] ** 2) / (2 * sg))
    )
    nty, ntx = Hp // 8, Wp // 128
    T = nty * ntx
    src_pad = jnp.asarray(rng.uniform(0, 1, (K, Hp, Wp)).astype(np.float32))
    halo_pad = jnp.asarray(
        rng.uniform(0, 1, (Hp + 16, Wp + 256)).astype(np.float32)
    )
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

    flops = K * T * len(offs_t) * 8 * 2 * 128 * pmk.BAND_Y * pmk.BAND_X

    for dt_name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        out = pmk.pm_view_costs_pallas(
            src_pad, src_pad, halo_pad, d_pad, n_pad, stats_pad,
            params, y0, x0, H, W, offs_t, wsp_t,
            geom=False, interpret=False, sample_dtype=dt,
        )
        np.asarray(out)
        n = 5
        t0 = time.perf_counter()
        for i in range(n):
            out = pmk.pm_view_costs_pallas(
                src_pad, src_pad, halo_pad,
                d_pad + np.float32(0.001 * i), n_pad, stats_pad,
                params, y0, x0, H, W, offs_t, wsp_t,
                geom=False, interpret=False, sample_dtype=dt,
            )
            np.asarray(out)
        dt_s = (time.perf_counter() - t0) / n
        print(
            f"pm_view_costs[{dt_name}] {W}x{H} K={K}: {dt_s*1e3:.1f} ms/eval"
            f"  ({flops/dt_s/1e12:.1f} TFLOP/s tent-matmul)",
            flush=True,
        )


if __name__ == "__main__":
    main()
