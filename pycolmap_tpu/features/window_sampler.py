"""Pallas TPU kernel: bilinear window sampling without gathers.

The SIFT orientation/descriptor stages (and affine-shape adaptation) need
~0.5M bilinear fetches per octave from the gradient volume at per-keypoint
rotated-grid positions (ref: upstream VLFeat/SiftGPU per-keypoint sampling
loops behind pycolmap/feature/sift.h:65). XLA lowers these to 1-D gathers
that run at ~0.2 GB/s on TPU (measured, scripts/proto_pallas_gather.py), and
Mosaic rejects every per-element vector-gather form inside Pallas kernels.

This kernel removes the gathers entirely. Observation: all samples of one
keypoint live in a small bounding window (support is 6*scale px, rotated).
Per keypoint (one grid step):

  1. DMA the [2, WIN_Y, WIN_X] gradient window HBM -> VMEM scratch
     (origin from scalar-prefetched per-keypoint (channel, row, col) bases);
  2. bilinear interpolation = two tent-weight contractions on the MXU:
       Wy[s, r] = max(0, 1 - |wy[s] - r|)      # [S, WIN_Y], <=2 nonzero/row
       M = Wy @ window[c]                       # [S, WIN_X]  (MXU)
       out[c, s] = sum_x M[s, x] * Wx[s, x]     # tent along x (VPU)

Tent weights reproduce bilinear interpolation with zero-outside semantics
exactly: a sample whose footprint row/col falls outside the window (or the
image: the volume is zero-padded) contributes zero, matching
sift._bilinear_gather. Out-of-image samples are handled by the caller
mapping them to in-window coordinates < -1 (all-zero tent row).

Cost for the SIFT descriptor stage (K=2048, S=256 samples, WIN 72x256):
~39 GFLOP of matmul + 300 MB of DMA ~= 1-2 ms, vs 39 ms measured for the
XLA gather formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# sample count per keypoint: SIFT uses a 16x16 grid
_S = 256
# keypoints per grid step: blocks must have sublane-divisible shapes, and
# issuing the 8 window DMAs up front pipelines them against the tent math
_KB = 8


def _sampler_kernel(ch0_ref, y0_ref, x0_ref, vol_ref, wy_ref, wx_ref,
                    out_ref, win, sem, *, win_y, win_x, bf16):
    kb = pl.program_id(0) * _KB

    def dma(i, c):
        # both channels of a keypoint land side-by-side in one
        # [win_y, 2*win_x] scratch plane so the Wy contraction is a SINGLE
        # matmul over both (ROADMAP lever: the per-channel [S, win_x]
        # matmuls waste MXU issue overhead; 2x width amortizes it)
        return pltpu.make_async_copy(
            vol_ref.at[
                ch0_ref[kb + i] + c,
                pl.ds(pl.multiple_of(y0_ref[kb + i], 8), win_y),
                pl.ds(pl.multiple_of(x0_ref[kb + i], 128), win_x),
            ],
            win.at[i, :, pl.ds(c * win_x, win_x)],
            sem.at[i, c],
        )

    for i in range(_KB):
        dma(i, 0).start()
        dma(i, 1).start()

    # tpu.iota is integer-only; cast the index ramps to f32 after
    rows = jax.lax.broadcasted_iota(jnp.int32, (_S, win_y), 1).astype(
        jnp.float32
    )
    cols = jax.lax.broadcasted_iota(jnp.int32, (_S, win_x), 1).astype(
        jnp.float32
    )
    for i in range(_KB):
        Wy = jnp.maximum(0.0, 1.0 - jnp.abs(wy_ref[i][:, None] - rows))
        Wx = jnp.maximum(0.0, 1.0 - jnp.abs(wx_ref[i][:, None] - cols))
        dma(i, 0).wait()
        dma(i, 1).wait()
        src = win[i]
        if bf16:
            # halve the MXU passes: operands lose ~3 decimal digits,
            # well under the u8 descriptor quantization downstream
            Wy = Wy.astype(jnp.bfloat16)
            src = src.astype(jnp.bfloat16)
        # bf16=False must mean f32: at DEFAULT precision the MXU truncates
        # f32 operands to bf16 anyway (caught by scripts/tpu_kernel_gate.py
        # — compiled-vs-reference max err 9e-3 at "f32"), so the exact path
        # needs an explicit HIGHEST, costing the extra MXU passes bf16 saves
        M = jnp.dot(
            Wy, src, preferred_element_type=jnp.float32,
            precision=(None if bf16 else jax.lax.Precision.HIGHEST),
        )
        out_ref[i, 0, :] = jnp.sum(M[:, :win_x] * Wx, axis=1)
        out_ref[i, 1, :] = jnp.sum(M[:, win_x:] * Wx, axis=1)


@functools.partial(
    jax.jit, static_argnames=("win_y", "win_x", "bf16", "interpret")
)
def _sample_windows_pallas(vol, ch0, y0, x0, wy, wx, win_y, win_x,
                           bf16=False, interpret=False):
    """vol [NC, LHp, Wp] f32; ch0/y0/x0 [K] int32 (x0 mult of 128, y0 of 8,
    K mult of _KB); wy/wx [K, S] f32 in-window coords. Returns [K, 2, S]."""
    K = ch0.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(K // _KB,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((_KB, _S), lambda k, *_: (k, 0)),
            pl.BlockSpec((_KB, _S), lambda k, *_: (k, 0)),
        ],
        out_specs=pl.BlockSpec((_KB, 2, _S), lambda k, *_: (k, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((_KB, win_y, 2 * win_x), jnp.float32),
            pltpu.SemaphoreType.DMA((_KB, 2)),
        ],
    )
    kernel = functools.partial(
        _sampler_kernel, win_y=win_y, win_x=win_x, bf16=bf16
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, 2, _S), jnp.float32),
        interpret=interpret,
    )(ch0, y0, x0, vol, wy, wx)


def _use_pallas() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def pad_volume(grad2):
    """Pad a [2(or NC), LH, W] channel-major volume for the sampler.

    Rows to a multiple of 8 and >= max WIN_Y; cols to a multiple of 128 and
    >= max WIN_X. Zero padding preserves zero-outside bilinear semantics.
    """
    nc, lh, w = grad2.shape
    lhp = max(_round_up(lh, 8), 256)
    wp = max(_round_up(w, 128), 512)
    if lhp == lh and wp == w:
        return grad2
    return jnp.pad(grad2, ((0, 0), (0, lhp - lh), (0, wp - w)))


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def window_sizes(support_px: float):
    """Static window shape for a given max |sample - keypoint| in pixels.

    Returns None if the support cannot fit the largest window (callers fall
    back to the XLA gather path).
    """
    spread = int(np.ceil(2 * support_px + 2))  # + bilinear footprint
    win_y = _round_up(spread + 8, 8)  # y0 is floor-8-aligned
    win_y = max(win_y, 16)
    if win_y > 256:
        return None
    # x0 is floor-128-aligned: allowed spread = win_x - 129
    for win_x in (256, 384, 512):
        if spread <= win_x - 129:
            return (win_y, win_x)
    return None


def _bf16_default() -> bool:
    """bf16 matmul operands by default on TPU (halves MXU passes; ~3
    decimal digits of tent/gradient precision, far under the u8 descriptor
    quantization). CPU/interpret keeps f32 so the reference cross-checks
    stay exact. PYCOLMAP_TPU_SIFT_SAMPLER_BF16 overrides either way."""
    import os

    v = os.environ.get("PYCOLMAP_TPU_SIFT_SAMPLER_BF16")
    if v is not None:
        return v == "1"
    return _use_pallas()


def sample_windows(vol, ch0, ys, xs, win_y, win_x, interpret=False,
                   bf16=None):
    """Bilinear-sample a channel-pair volume at per-keypoint grid positions.

    vol: [NC, LHp, Wp] f32, zero-padded via :func:`pad_volume`;
    ch0: [K] int32 first channel of each keypoint's channel pair;
    ys/xs: [K, G, G] f32 sample coords into the [LHp, Wp] planes (ys already
    clamped/level-offset by the caller; out-of-image xs are fine).
    Requires all samples of one keypoint within a (win_y-9, win_x-129)
    bounding box (see :func:`window_sizes`).

    Returns (v0, v1): two [K, G, G] f32 sampled channel planes.
    """
    K, G, _ = ys.shape
    lhp, wp = vol.shape[1], vol.shape[2]
    ysf = ys.reshape(K, -1)
    xsf = xs.reshape(K, -1)
    y_min = jnp.floor(jnp.min(ysf, axis=1)).astype(jnp.int32)
    x_min = jnp.floor(jnp.min(xsf, axis=1)).astype(jnp.int32)
    y0 = jnp.clip((y_min // 8) * 8, 0, lhp - win_y)
    x0 = jnp.clip((x_min // 128) * 128, 0, wp - win_x)
    wy = ysf - y0[:, None].astype(jnp.float32)
    wx = xsf - x0[:, None].astype(jnp.float32)
    kp = _round_up(K, _KB)
    if kp != K:
        pad = ((0, kp - K), (0, 0))
        ch0 = jnp.pad(ch0, ((0, kp - K),))
        y0 = jnp.pad(y0, ((0, kp - K),))
        x0 = jnp.pad(x0, ((0, kp - K),))
        wy = jnp.pad(wy, pad, constant_values=-2.0)  # all-zero tent rows
        wx = jnp.pad(wx, pad, constant_values=-2.0)
    if bf16 is None:
        bf16 = _bf16_default()
    out = _sample_windows_pallas(
        vol, ch0, y0, x0, wy, wx, win_y, win_x, bf16=bf16,
        interpret=interpret
    )[:K]  # [K, 2, S]
    return out[:, 0].reshape(K, G, G), out[:, 1].reshape(K, G, G)


def sample_windows_reference(vol, ch0, ys, xs):
    """XLA-gather reference/fallback with identical semantics (used on CPU,
    for oversized supports, and to cross-check the kernel in tests)."""
    K, G, _ = ys.shape

    def one(c0, ysk, xsk):
        v0 = _bilinear_plane(vol, c0, ysk, xsk)
        v1 = _bilinear_plane(vol, c0 + 1, ysk, xsk)
        return v0, v1

    return jax.vmap(one)(ch0, ys, xs)


def _bilinear_plane(vol, c, ys, xs):
    """Bilinear sample vol[c] at (ys, xs), zero outside."""
    H, W = vol.shape[1], vol.shape[2]
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    dx = xs - x0
    dy = ys - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def get(yi, xi):
        ok = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yi = jnp.clip(yi, 0, H - 1)
        xi = jnp.clip(xi, 0, W - 1)
        return jnp.where(ok, vol[c, yi, xi], 0.0)

    return (
        get(y0i, x0i) * (1 - dy) * (1 - dx)
        + get(y0i, x0i + 1) * (1 - dy) * dx
        + get(y0i + 1, x0i) * dy * (1 - dx)
        + get(y0i + 1, x0i + 1) * dy * dx
    )
