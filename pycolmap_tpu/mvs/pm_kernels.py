"""Pallas TPU kernel for PatchMatch per-view window costs.

The XLA formulation of PatchMatch's bilateral-NCC cost gathers
nw x 4 bilinear corners per (pixel, candidate, view) from HBM; TPU runs
those gathers at ~0.2 GB/s (measured, scripts/proto_pallas_gather.py), which
made patch_match_kernel ~27 s at 320x240 x 3 iterations. This kernel removes
every gather:

- grid over (view, 8x128 output tiles); per step it DMAs one source-image
  row/column BAND (BAND_Y x BAND_X around the tile's warped footprint,
  origin scalar-prefetched) plus the reference halo tile into VMEM;
- bilinear sampling of all window-offset warps is evaluated as tent-weight
  contractions on the MXU against the band (exact bilinear, zero outside:
  same trick as features/window_sampler.py);
- the per-offset warp itself (plane-induced homography at the offset ray,
  ref: mvs/patch_match.py plane parameterization) is recomputed in-kernel
  from iota pixel coordinates — no warp fields ever hit HBM;
- NCC statistics accumulate in VMEM registers; one [8, 128] cost tile is
  written per (view, tile).

Samples falling outside the band (depth discontinuities inside a tile, or
extreme geometry) are treated like out-of-image samples: their window weight
is zeroed, and a window with <20% surviving weight scores the invalid cost
2.0 — the conservative failure mode of the XLA reference implementation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_Y = 8
TILE_X = 128
BAND_Y = 64
BAND_X = 384
HALO_Y = 24  # TILE_Y + 2*8 (covers window radius <= 8)
HALO_X = 384  # TILE_X + 2*128

# view-parameter row layout (f32): R row-major 9, t 3, Ks fx fy cx cy,
# Kr fx fy cx cy, sigma_color, geom_w, geom_max_cost, Ks_inv fx fy cx cy
_P_R = 0
_P_T = 9
_P_KSF = 12  # fx, fy, cx, cy
_P_KRF = 16  # fx, fy, cx, cy (reference intrinsics)
_P_SIGMA = 20
_P_GEOMW = 21
_P_GEOMMAX = 22
_P_KSI = 23  # Ks^-1: 1/fx, 1/fy, -cx/fx, -cy/fy
_P_LEN = 32


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def interpret_default() -> bool:
    """Interpret-mode default: compiled on TPU, interpreter on CPU (tests)."""
    try:
        return jax.default_backend() in ("cpu",)
    except Exception:  # pragma: no cover
        return True


def _tent_tile_sample(band, rv, ru, valid, dtype):
    """Sample band [BAND_Y, BAND_X] at per-element (rv, ru) for a whole
    [TILE_Y, TILE_X] tile. rv/ru [TILE_Y, TILE_X] f32 in band coords;
    returns [TILE_Y, TILE_X] f32 (zero where tents fall outside or ~valid).

    Each output row is a [TILE_X, BAND_Y] x [BAND_Y, BAND_X] tent-weight
    matmul on the MXU (Mosaic rejects the [TY*TX, BAND_Y] single-matmul
    form: sublane->lane reshape is an unsupported shape cast). With
    dtype=bfloat16 the tent weights quantize sub-pixel position to
    ~1/256 px — the same fractional precision as GPU texture units, which
    the reference's CUDA sampler relies on.
    """
    iy = jax.lax.broadcasted_iota(jnp.int32, (TILE_X, BAND_Y), 1).astype(
        jnp.float32
    )
    ix = jax.lax.broadcasted_iota(jnp.int32, (TILE_X, BAND_X), 1).astype(
        jnp.float32
    )
    rv = jnp.where(valid, rv, -2.0)
    band_c = band.astype(dtype)
    rows = []
    for i in range(TILE_Y):
        Ty = jnp.maximum(0.0, 1.0 - jnp.abs(rv[i][:, None] - iy))  # [TX, BY]
        Tx = jnp.maximum(0.0, 1.0 - jnp.abs(ru[i][:, None] - ix))  # [TX, BX]
        M = jnp.dot(
            Ty.astype(dtype), band_c, preferred_element_type=jnp.float32
        )  # [TX, BX]
        rows.append(jnp.sum(M * Tx, axis=1))
    return jnp.stack(rows)


def _make_kernel(H, W, offsets, w_spatial, geom, num_tx, sample_dtype):
    """Returns the kernel fn closed over static geometry.

    H, W: true image sizes (un-padded); offsets: [(dy, dx)] static window
    offsets; w_spatial: matching static spatial weights; geom: include the
    forward-backward geometric-consistency term (needs src depth bands);
    sample_dtype: MXU dtype for the intensity tent matmuls (depth-band
    sampling for the geom term always runs f32 — depths aren't in [0,1]).
    """

    def kernel(y0_ref, x0_ref, params_ref, src_ref, sdep_ref, halo_ref,
               d_ref, n_ref, stats_ref, out_ref, band, dband, halo, sems):
        v = pl.program_id(0)
        ty = pl.program_id(1)
        tx = pl.program_id(2)
        tile = ty * num_tx + tx

        y0 = pl.multiple_of(y0_ref[v, tile], 8)
        x0 = pl.multiple_of(x0_ref[v, tile], 128)
        cp_band = pltpu.make_async_copy(
            src_ref.at[v, pl.ds(y0, BAND_Y), pl.ds(x0, BAND_X)], band,
            sems.at[0],
        )
        cp_band.start()
        cp_halo = pltpu.make_async_copy(
            halo_ref.at[pl.ds(ty * TILE_Y, HALO_Y),
                        pl.ds(tx * TILE_X, HALO_X)],
            halo, sems.at[1],
        )
        cp_halo.start()
        if geom:
            cp_dep = pltpu.make_async_copy(
                sdep_ref.at[v, pl.ds(y0, BAND_Y), pl.ds(x0, BAND_X)], dband,
                sems.at[2],
            )
            cp_dep.start()

        # view parameters (SMEM row, dynamically indexed by view)
        R = [params_ref[v, _P_R + i] for i in range(9)]
        t = [params_ref[v, _P_T + i] for i in range(3)]
        ksfx, ksfy, kscx, kscy = (params_ref[v, _P_KSF + i] for i in range(4))
        krfx, krfy, krcx, krcy = (params_ref[v, _P_KRF + i] for i in range(4))
        sigma_color = params_ref[v, _P_SIGMA]
        y0f = y0.astype(jnp.float32)
        x0f = x0.astype(jnp.float32)

        # center rays + plane terms for the tile
        px = (
            jax.lax.broadcasted_iota(jnp.int32, (TILE_Y, TILE_X), 1)
            + tx * TILE_X
        ).astype(jnp.float32) + 0.5
        py = (
            jax.lax.broadcasted_iota(jnp.int32, (TILE_Y, TILE_X), 0)
            + ty * TILE_Y
        ).astype(jnp.float32) + 0.5
        rpx = (px - krcx) / krfx
        rpy = (py - krcy) / krfy
        d = d_ref[:]  # [TY, TX]
        n0 = n_ref[0]
        n1 = n_ref[1]
        n2 = n_ref[2]
        ndotr = n0 * rpx + n1 * rpy + n2
        denom = d * jnp.where(jnp.abs(ndotr) < 1e-6, -1e-6, ndotr)

        cp_halo.wait()
        ref_c = halo[8:16, 128:256]  # [TY, TX] center reference tile

        zero = jnp.zeros((TILE_Y, TILE_X), jnp.float32)
        s_sum = zero
        s2_sum = zero
        rs_sum = zero
        wv_sum = zero + 1e-9
        cp_band.wait()
        bandv = band[:]

        for (dy, dx), wsp in zip(offsets, w_spatial):
            rqx = (px + dx - krcx) / krfx
            rqy = (py + dy - krcy) / krfy
            ndotq = n0 * rqx + n1 * rqy + n2
            scale = ndotq / denom
            m0 = R[0] * rqx + R[1] * rqy + R[2] + t[0] * scale
            m1 = R[3] * rqx + R[4] * rqy + R[5] + t[1] * scale
            m2 = R[6] * rqx + R[7] * rqy + R[8] + t[2] * scale
            z = jnp.where(jnp.abs(m2) < 1e-9, 1e-9, m2)
            us = ksfx * (m0 / z) + kscx - 0.5
            vs = ksfy * (m1 / z) + kscy - 0.5
            rv = vs - y0f
            ru = us - x0f
            ok = (
                (us >= 0.0) & (us < W - 1) & (vs >= 0.0) & (vs < H - 1)
                & (rv >= 0.0) & (rv <= BAND_Y - 1.001)
                & (ru >= 0.0) & (ru <= BAND_X - 1.001)
                & (m2 > 0)
            )
            s = _tent_tile_sample(bandv, rv, ru, ok, sample_dtype)
            ref_q = halo[8 + dy:16 + dy, 128 + dx:256 + dx]
            w = jnp.exp(-jnp.abs(ref_q - ref_c) / sigma_color) * wsp
            wk = w * ok.astype(jnp.float32)
            s_sum = s_sum + wk * s
            s2_sum = s2_sum + wk * s * s
            rs_sum = rs_sum + wk * ref_q * s
            wv_sum = wv_sum + wk

        w_sum = stats_ref[0]
        ref_mean = stats_ref[1]
        ref_var = stats_ref[2]
        src_mean = s_sum / wv_sum
        src_var = jnp.maximum(s2_sum / wv_sum - src_mean * src_mean, 1e-6)
        covar = rs_sum / wv_sum - ref_mean * src_mean
        ncc = covar / jnp.sqrt(ref_var * src_var)
        cost = 1.0 - jnp.clip(ncc, -1.0, 1.0)
        cost = jnp.where(wv_sum > 0.2 * w_sum, cost, 2.0)

        if geom:
            # forward-backward reprojection error at the center pixel
            geom_w = params_ref[v, _P_GEOMW]
            geom_max = params_ref[v, _P_GEOMMAX]
            ksi_fx, ksi_fy, ksi_cx, ksi_cy = (
                params_ref[v, _P_KSI + i] for i in range(4)
            )
            scale_c = 1.0 / jnp.maximum(d, 1e-9)
            c0 = R[0] * rpx + R[1] * rpy + R[2] + t[0] * scale_c
            c1 = R[3] * rpx + R[4] * rpy + R[5] + t[1] * scale_c
            c2 = R[6] * rpx + R[7] * rpy + R[8] + t[2] * scale_c
            zc = jnp.where(jnp.abs(c2) < 1e-9, 1e-9, c2)
            uc = ksfx * (c0 / zc) + kscx
            vc = ksfy * (c1 / zc) + kscy
            rvc = (vc - 0.5) - y0f
            ruc = (uc - 0.5) - x0f
            okc = (
                (uc - 0.5 >= 0.0) & (uc - 0.5 < W - 1)
                & (vc - 0.5 >= 0.0) & (vc - 0.5 < H - 1)
                & (rvc >= 0.0) & (rvc <= BAND_Y - 1.001)
                & (ruc >= 0.0) & (ruc <= BAND_X - 1.001)
                & (c2 > 0)
            )
            cp_dep.wait()
            ds = _tent_tile_sample(dband[:], rvc, ruc, okc, jnp.float32)
            bx = ksi_fx * uc + ksi_cx
            by = ksi_fy * vc + ksi_cy
            d0 = ds * bx - t[0]
            d1 = ds * by - t[1]
            d2 = ds - t[2]
            Xr0 = R[0] * d0 + R[3] * d1 + R[6] * d2
            Xr1 = R[1] * d0 + R[4] * d1 + R[7] * d2
            Xr2 = R[2] * d0 + R[5] * d1 + R[8] * d2
            zr = jnp.where(Xr2 < 1e-9, 1e-9, Xr2)
            ur = krfx * (Xr0 / zr) + krcx
            vr = krfy * (Xr1 / zr) + krcy
            err = jnp.sqrt((ur - px) ** 2 + (vr - py) ** 2)
            okg = okc & (ds > 0) & (Xr2 > 0)
            cost = cost + geom_w * jnp.where(
                okg, jnp.minimum(err, geom_max), geom_max
            )

        out_ref[0] = cost

    return kernel


def sample_dtype_default():
    """MXU dtype for intensity tent matmuls: bf16 (GPU-texture-grade
    fractional precision, ~4x MXU rate) unless PYCOLMAP_TPU_PM_F32=1."""
    import os

    if os.environ.get("PYCOLMAP_TPU_PM_F32", "0") == "1":
        return jnp.float32
    return jnp.bfloat16


@functools.partial(
    jax.jit,
    static_argnames=("H", "W", "offsets", "w_spatial", "geom", "interpret",
                     "sample_dtype"),
)
def pm_view_costs_pallas(
    src_pad, sdep_pad, ref_halo_pad, d_pad, n_pad, stats_pad, params,
    y0, x0, H, W, offsets, w_spatial, geom=False, interpret=False,
    sample_dtype=jnp.bfloat16,
):
    """Per-view PatchMatch window costs for one candidate plane field.

    src_pad [K, Hp, Wp] f32 zero-padded sources (Hp >= BAND_Y mult 8,
    Wp >= BAND_X mult 128); sdep_pad: same-shape source depth bands (any
    [K, Hp, Wp] array when geom=False — unused); ref_halo_pad
    [Hp + 16, Wp + 256] reference padded by (8, 128) on the top-left;
    d_pad [Hp, Wp]; n_pad [3, Hp, Wp]; stats_pad [3, Hp, Wp] (w_sum,
    ref_mean, ref_var); params [K, 32] view rows; y0/x0 [K, T] band
    origins (T = (Hp/8) * (Wp/128), row-major tiles).
    Returns cost [K, Hp, Wp] f32 (padding region = garbage, crop it).
    """
    K, Hp, Wp = src_pad.shape
    nty, ntx = Hp // TILE_Y, Wp // TILE_X
    kernel = _make_kernel(H, W, offsets, w_spatial, geom, ntx, sample_dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(K, nty, ntx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # params [K, 32]
            pl.BlockSpec(memory_space=pl.ANY),  # src_pad
            pl.BlockSpec(memory_space=pl.ANY),  # sdep_pad
            pl.BlockSpec(memory_space=pl.ANY),  # ref_halo_pad
            pl.BlockSpec((TILE_Y, TILE_X), lambda v, ty, tx, *_: (ty, tx)),
            pl.BlockSpec((3, TILE_Y, TILE_X),
                         lambda v, ty, tx, *_: (0, ty, tx)),
            pl.BlockSpec((3, TILE_Y, TILE_X),
                         lambda v, ty, tx, *_: (0, ty, tx)),
        ],
        out_specs=pl.BlockSpec(
            (1, TILE_Y, TILE_X), lambda v, ty, tx, *_: (v, ty, tx)
        ),
        scratch_shapes=[
            pltpu.VMEM((BAND_Y, BAND_X), jnp.float32),
            pltpu.VMEM((BAND_Y, BAND_X), jnp.float32),
            pltpu.VMEM((HALO_Y, HALO_X), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, Hp, Wp), jnp.float32),
        interpret=interpret,
    )(y0, x0, params, src_pad, sdep_pad, ref_halo_pad, d_pad, n_pad,
      stats_pad)


def band_origins(v_c, u_c, Hp, Wp, radius):
    """Per-tile band origins from center-warp fields v_c/u_c [K, H, W].

    Margins cover the window-offset warp deviation (~2*radius px for
    moderate geometry); samples beyond the band are marked invalid by the
    kernel. Returns (y0, x0) [K, T] int32, 8/128-aligned and clipped.
    """
    K, H, W = v_c.shape
    nty, ntx = Hp // TILE_Y, Wp // TILE_X
    pad_y = nty * TILE_Y - H
    pad_x = ntx * TILE_X - W
    big = jnp.float32(1e9)
    # clamp in-front warps to the image so off-image centers (whose samples
    # the kernel invalidates anyway) don't drag the band away from pixels
    # that do land in the source image
    v = jnp.where(jnp.isfinite(v_c), jnp.clip(v_c, 0.0, H - 1.0), big)
    u = jnp.where(jnp.isfinite(u_c), jnp.clip(u_c, 0.0, W - 1.0), big)
    v = jnp.pad(v, ((0, 0), (0, pad_y), (0, pad_x)), constant_values=1e9)
    u = jnp.pad(u, ((0, 0), (0, pad_y), (0, pad_x)), constant_values=1e9)
    v_min = jnp.min(
        v.reshape(K, nty, TILE_Y, ntx, TILE_X), axis=(2, 4)
    )  # [K, nty, ntx]
    u_min = jnp.min(u.reshape(K, nty, TILE_Y, ntx, TILE_X), axis=(2, 4))
    margin = 2 * radius + 2
    y0 = jnp.clip(
        ((v_min - margin).astype(jnp.int32) // 8) * 8, 0, Hp - BAND_Y
    )
    x0 = jnp.clip(
        ((u_min - margin).astype(jnp.int32) // 128) * 128, 0, Wp - BAND_X
    )
    return (
        y0.reshape(K, -1).astype(jnp.int32),
        x0.reshape(K, -1).astype(jnp.int32),
    )
