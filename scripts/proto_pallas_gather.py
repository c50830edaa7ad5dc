"""Prototype: which gather shapes does Mosaic (Pallas TPU) actually support,
and how fast are they vs XLA's gather?

ROADMAP.md perf items 2-3 (PatchMatch, SIFT descriptor windows) both bottleneck
on ~1M-element bilinear fetches. This script probes, on the real TPU:

  A. jnp.take_along_axis(tile, idx, axis=-1)   — lane-dim dynamic gather
  B. src[idx_rows, :]                          — sublane/row gather
  C. full 2-D per-element src[yi, xi]          — arbitrary gather
  D. tent-weight two-stage matmul sampling     — bilinear as MXU work
  E. XLA gather baseline (what sift.py does today)

Run:  python scripts/proto_pallas_gather.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, n=10, warmup=2):
    # axon tunnel: block_until_ready can return before remote execution
    # completes; force a scalar device_get to sync (see profile_sift.py)
    chk = jax.jit(
        lambda *a: sum(
            jnp.sum(l.astype(jnp.float32))
            for l in jax.tree_util.tree_leaves(fn(*a))
        )
    )
    for _ in range(warmup):
        float(chk(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        v = float(chk(*args))
    return (time.perf_counter() - t0) / n


def try_case(name, fn):
    try:
        out, ref = fn()
        ok = np.allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
        print(f"[{name}] COMPILES, correct={ok}")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"[{name}] FAILED: {type(e).__name__}: {msg}")
        return False


# ---------------------------------------------------------------- A: lane TAA
def case_a():
    src = jnp.asarray(np.random.rand(256, 512).astype(np.float32))
    idx = jnp.asarray(np.random.randint(0, 512, (256, 512)).astype(np.int32))

    def kernel(s_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(s_ref[:], i_ref[:], axis=-1)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(src.shape, src.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(src, idx)
    ref = jnp.take_along_axis(src, idx, axis=-1)
    return out, ref


# ------------------------------------------------------------- B: row gather
def case_b():
    src = jnp.asarray(np.random.rand(512, 256).astype(np.float32))
    idx = jnp.asarray(np.random.randint(0, 512, (256,)).astype(np.int32))

    def kernel(s_ref, i_ref, o_ref):
        o_ref[:] = s_ref[:][i_ref[:], :]

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((256, 256), src.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(src, idx)
    ref = src[idx, :]
    return out, ref


# ------------------------------------------------- B2: take_along_axis axis 0
def case_b2():
    src = jnp.asarray(np.random.rand(512, 256).astype(np.float32))
    idx = jnp.asarray(np.random.randint(0, 512, (512, 256)).astype(np.int32))

    def kernel(s_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(s_ref[:], i_ref[:], axis=0)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(src.shape, src.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(src, idx)
    ref = jnp.take_along_axis(src, idx, axis=0)
    return out, ref


# --------------------------------------------------------- C: arbitrary 2-D
def case_c():
    H, W = 256, 512
    src = jnp.asarray(np.random.rand(H, W).astype(np.float32))
    yi = jnp.asarray(np.random.randint(0, H, (8, 128)).astype(np.int32))
    xi = jnp.asarray(np.random.randint(0, W, (8, 128)).astype(np.int32))

    def kernel(s_ref, y_ref, x_ref, o_ref):
        o_ref[:] = s_ref[:][y_ref[:], x_ref[:]]

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), src.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(src, yi, xi)
    ref = src[yi, xi]
    return out, ref


# ------------------------------------- C2: flat gather via take_along_axis 1D
def case_c2():
    HW = 256 * 512
    src = jnp.asarray(np.random.rand(HW).astype(np.float32))
    idx = jnp.asarray(np.random.randint(0, HW, (1024,)).astype(np.int32))

    def kernel(s_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(s_ref[:], i_ref[:])

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1024,), src.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(src, idx)
    ref = jnp.take(src, idx)
    return out, ref


# ---------------------------------------------------------------- timings
def bench_a_sized(Ksamp=2048 * 256):
    """Time lane-gather at SIFT-descriptor scale if A works."""
    rows = Ksamp // 512
    src = jnp.asarray(np.random.rand(rows, 512).astype(np.float32))
    idx = jnp.asarray(np.random.randint(0, 512, (rows, 512)).astype(np.int32))

    def kernel(s_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(s_ref[:], i_ref[:], axis=-1)

    f = jax.jit(lambda s, i: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(src.shape, src.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(s, i))
    dt = timeit(f, src, idx)
    print(f"  lane-gather {src.shape}: {dt*1e3:.3f} ms "
          f"({src.size/dt/1e9:.2f} G elems/s)")


def bench_xla_gather():
    """XLA baseline: what _bilinear_gather costs today."""
    LH, W = 3840, 640
    vol = jnp.asarray(np.random.rand(LH, W, 2).astype(np.float32))
    K, G = 2048, 16
    ys = jnp.asarray((np.random.rand(K, G, G) * (LH - 2)).astype(np.float32))
    xs = jnp.asarray((np.random.rand(K, G, G) * (W - 2)).astype(np.float32))

    from pycolmap_tpu.features.sift import _bilinear_gather

    f = jax.jit(lambda v, y, x: _bilinear_gather(v, y, x))
    dt = timeit(f, vol, ys, xs)
    print(f"  XLA bilinear gather K={K} G={G}x{G} 2ch: {dt*1e3:.2f} ms")


def bench_xla_gather_flat():
    """Flat 1-D gather (what _bilinear_gather_level does: [L*H, W] source)."""
    LH, W = 3840, 640
    vol = jnp.asarray(np.random.rand(LH * W).astype(np.float32))
    N = 2048 * 256 * 4
    idx = jnp.asarray(np.random.randint(0, LH * W, (N,)).astype(np.int32))
    f = jax.jit(lambda v, i: v[i])
    dt = timeit(f, vol, idx)
    print(f"  XLA flat 1-D gather N={N}: {dt*1e3:.2f} ms "
          f"({N*4/dt/1e9:.2f} GB/s)")


def main():
    print("backend:", jax.default_backend(), jax.devices())
    if "--bench-only" not in sys.argv:
        try_case("A lane take_along_axis", case_a)
        try_case("B row gather s[idx, :]", case_b)
        try_case("B2 take_along_axis axis=0", case_b2)
        try_case("C 2-D s[yi, xi]", case_c)
        try_case("C2 flat 1-D take", case_c2)
    bench_xla_gather()
    bench_xla_gather_flat()


if __name__ == "__main__":
    main()
