"""Stage-level profiling of the SIFT extraction kernel on TPU.

Through the axon tunnel block_until_ready may return before remote
execution completes; every timing here forces a scalar device_get.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from pycolmap_tpu.features import sift as S


def tree_checksum(out):
    leaves = jax.tree_util.tree_leaves(out)
    return sum(
        jnp.sum(l.astype(jnp.float32)) for l in leaves if hasattr(l, "astype")
    )


def timeit(fn, *args, n=5, warmup=2):
    chk = jax.jit(lambda *a: tree_checksum(fn(*a)))
    for _ in range(warmup):
        float(chk(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        v = float(chk(*args))
    return (time.perf_counter() - t0) / n


def main():
    H, W = 480, 640
    rng = np.random.default_rng(0)
    from scipy.ndimage import gaussian_filter

    img = gaussian_filter(rng.uniform(0, 1, (H, W)).astype(np.float32), 2.0)
    base = jnp.asarray(np.repeat(np.repeat(img, 2, 0), 2, 1))
    Ssc = 3
    per_octave = 2048

    print(f"build_octave {base.shape}: "
          f"{timeit(lambda b: S._build_octave(b, Ssc), base)*1e3:.1f} ms")

    build = jax.jit(lambda b: S._build_octave(b, Ssc))
    gauss = jax.device_get(build(base))
    gauss = jnp.asarray(gauss)

    def detect(g):
        dog = g[1:] - g[:-1]
        return S._detect_octave(g, dog, Ssc, 0.0066, 10.0, per_octave)

    print(f"detect_octave: {timeit(detect, gauss)*1e3:.1f} ms")

    x, y, lev_f, level_idx, scale_rel, resp, mask = jax.jit(detect)(gauss)
    print(f"gradients: {timeit(S._octave_gradients, gauss)*1e3:.1f} ms")
    grad = jax.jit(S._octave_gradients)(gauss)
    oh, ow = gauss.shape[1], gauss.shape[2]

    ori = lambda g, *a: S._orientations(g, oh, ow, Ssc, *a, 2)
    print(
        "orientations: "
        f"{timeit(ori, grad, x, y, level_idx, scale_rel, mask)*1e3:.1f} ms"
    )
    theta, omask = jax.jit(ori)(grad, x, y, level_idx, scale_rel, mask)

    O = theta.shape[1]
    xe = jnp.repeat(x[:, None], O, 1).reshape(-1)
    ye = jnp.repeat(y[:, None], O, 1).reshape(-1)
    le = jnp.repeat(level_idx[:, None], O, 1).reshape(-1)
    se = jnp.repeat(scale_rel[:, None], O, 1).reshape(-1)
    th = theta.reshape(-1)
    desc = lambda g, *a: S._descriptors(g, oh, ow, Ssc, *a, 0)
    print(
        f"descriptors ({xe.shape[0]} kps): "
        f"{timeit(desc, grad, xe, ye, le, se, th)*1e3:.1f} ms"
    )

    # full extract end-to-end for reference (includes D2H of results)
    opts = S.SiftExtractionOptions()
    opts.max_num_features = 4096
    sift = S.Sift(opts)
    sift.extract(img)
    t0 = time.perf_counter()
    for _ in range(3):
        sift.extract(img)
    print(f"full extract: {(time.perf_counter()-t0)/3*1e3:.0f} ms")

    # isolate D2H: jit call without fetching
    params = sift._static_params(H, W)
    out = S._extract_jit(jnp.asarray(img), *params)
    t0 = time.perf_counter()
    for _ in range(3):
        out = S._extract_jit(jnp.asarray(img), *params)
        v = float(jnp.sum(out[0]))  # sync on one small array only
    print(f"extract (scalar sync only): {(time.perf_counter()-t0)/3*1e3:.0f} ms")
    t0 = time.perf_counter()
    for _ in range(3):
        out = S._extract_jit(jnp.asarray(img), *params)
        jax.device_get(out)
    print(f"extract (full D2H): {(time.perf_counter()-t0)/3*1e3:.0f} ms")
    sizes = {i: tuple(o.shape) for i, o in enumerate(out)}
    print("output shapes:", sizes)


if __name__ == "__main__":
    main()
