"""Pallas TPU kernel for PatchMatch per-view window costs.

The XLA formulation of PatchMatch's bilateral-NCC cost gathers
nw x 4 bilinear corners per (pixel, candidate, view) from HBM; TPU runs
those gathers at ~0.2 GB/s (measured, scripts/proto_pallas_gather.py), which
made patch_match_kernel ~27 s at 320x240 x 3 iterations. This kernel removes
every gather:

- grid over (view, 8x128 output tiles); per step it DMAs one source-image
  row/column BAND (BAND_Y x BAND_X around the tile's warped footprint,
  origin scalar-prefetched) plus the reference halo tile into VMEM;
- bilinear sampling of all window-offset warps keeps pixels in LANES:
  the x taps are per-pixel tpu.dynamic_gather lane lookups over 128-wide
  band chunks, the y taps a 2-sparse tent contraction over band sublanes
  (exact bilinear, zero outside). An earlier dense tent-MATMUL variant
  (both taps as MXU one-hot contractions) measured 238 ms per cost eval
  at 320x240 K=8 — VPU-bound building [128, BAND_X] tent matrices; the
  gather form does ~100x less tent work per sample;
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
BAND_Y = 48  # tile y-footprint + 2x band_origins margin + intra-tile spread
BAND_X = 256  # two 128-lane gather chunks; covers warp scale <= ~1.5

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


def _band_chunks(band):
    """Split a [BAND_Y, BAND_X] band into single-vreg (128-lane) chunks plus
    their x+1-shifted twins (the second bilinear tap). tpu.dynamic_gather
    only gathers within one vreg along lanes, so the x-lookup is chunked."""
    BY, BX = band.shape
    shift = jnp.concatenate(
        [band[:, 1:], jnp.zeros((BY, 1), jnp.float32)], axis=1
    )
    chunks = tuple(band[:, s * 128:(s + 1) * 128] for s in range(BX // 128))
    chunks1 = tuple(shift[:, s * 128:(s + 1) * 128] for s in range(BX // 128))
    return chunks, chunks1


def _band_chunks_packed(band):
    """Pack the two x-taps (band[y, x], band[y, x+1]) as round-to-nearest
    bf16 halves of ONE int32 plane (ROADMAP r4 Perf #3): a single
    dynamic_gather then fetches both bilinear x-taps — half the gather
    count of the f32 path. Sample quantization is 2^-9 relative (bf16 with
    rounding), ~1e-3 on NCC costs — below the invalid-cost scale."""
    BY, BX = band.shape
    shift = jnp.concatenate(
        [band[:, 1:], jnp.zeros((BY, 1), jnp.float32)], axis=1
    )

    def bf16_bits(x):
        u = jax.lax.bitcast_convert_type(x, jnp.uint32)
        # round-to-nearest-even is overkill; round-half-up halves the
        # truncation error for one add
        return (u + 0x8000) & jnp.uint32(0xFFFF0000)

    packed = jax.lax.bitcast_convert_type(
        bf16_bits(band) | (bf16_bits(shift) >> 16), jnp.int32
    )
    return tuple(
        packed[:, s * 128:(s + 1) * 128] for s in range(BX // 128)
    )


def _gather_row_sample_packed(pchunks, rv, ru, valid):
    """Packed-pair variant of :func:`_gather_row_sample`: one int32 lane
    gather per chunk yields both x-taps (bf16 halves)."""
    BY = pchunks[0].shape[0]
    ruc = jnp.clip(ru, 0.0, BAND_X - 1.001)
    x0 = jnp.floor(ruc)
    fx = (ruc - x0)[None, :]
    idx = jnp.broadcast_to(
        x0.astype(jnp.int32)[None, :], (BY, TILE_X)
    )
    gp = jnp.zeros((BY, TILE_X), jnp.int32)
    for s, pc in enumerate(pchunks):
        rem = jnp.clip(idx - s * 128, 0, 127)
        inseg = (idx >= s * 128) & (idx < (s + 1) * 128)
        gp = jnp.where(inseg, jnp.take_along_axis(pc, rem, axis=1), gp)
    gu = jax.lax.bitcast_convert_type(gp, jnp.uint32)
    g0 = jax.lax.bitcast_convert_type(
        gu & jnp.uint32(0xFFFF0000), jnp.float32
    )
    g1 = jax.lax.bitcast_convert_type(gu << 16, jnp.float32)
    gx = g0 + (g1 - g0) * fx
    iy = jax.lax.broadcasted_iota(jnp.int32, (BY, TILE_X), 0).astype(
        jnp.float32
    )
    rvm = jnp.where(valid, rv, -2.0)
    ty = jnp.maximum(0.0, 1.0 - jnp.abs(rvm[None, :] - iy))
    return jnp.sum(ty * gx, axis=0)


def _gather_row_sample(chunks, chunks1, rv, ru, valid):
    """Exact bilinear sample of the band for one output row (pixels in
    LANES throughout — no transposes/relayouts). rv/ru/valid [TILE_X] in
    band coords; returns [TILE_X] f32 (zero where tents miss or ~valid).

    x taps: per-pixel lane gather (take_along_axis -> tpu.dynamic_gather)
    from each 128-lane chunk, combined by segment select, then lerped.
    y taps: dense 2-tap tent contraction over the BAND_Y sublanes (sublane
    indexing is not gatherable on TPU; the tent row is 2-sparse so this is
    the cheap direction to keep dense).
    """
    BY = chunks[0].shape[0]
    ruc = jnp.clip(ru, 0.0, BAND_X - 1.001)
    x0 = jnp.floor(ruc)
    fx = (ruc - x0)[None, :]
    idx = jnp.broadcast_to(
        x0.astype(jnp.int32)[None, :], (BY, TILE_X)
    )
    g0 = jnp.zeros((BY, TILE_X), jnp.float32)
    g1 = g0
    for s, (c0, c1) in enumerate(zip(chunks, chunks1)):
        rem = jnp.clip(idx - s * 128, 0, 127)
        inseg = (idx >= s * 128) & (idx < (s + 1) * 128)
        g0 = jnp.where(inseg, jnp.take_along_axis(c0, rem, axis=1), g0)
        g1 = jnp.where(inseg, jnp.take_along_axis(c1, rem, axis=1), g1)
    gx = g0 + (g1 - g0) * fx
    iy = jax.lax.broadcasted_iota(jnp.int32, (BY, TILE_X), 0).astype(
        jnp.float32
    )
    rvm = jnp.where(valid, rv, -2.0)
    ty = jnp.maximum(0.0, 1.0 - jnp.abs(rvm[None, :] - iy))
    return jnp.sum(ty * gx, axis=0)


def _gather_tile_sample(chunks, chunks1, rv, ru, valid):
    """[TILE_Y, TILE_X] bilinear band sample via _gather_row_sample."""
    return jnp.stack(
        [
            _gather_row_sample(chunks, chunks1, rv[i], ru[i], valid[i])
            for i in range(TILE_Y)
        ]
    )


def _gather_tile_sample_packed(pchunks, rv, ru, valid):
    """[TILE_Y, TILE_X] bilinear sample from bf16-pair-packed chunks."""
    return jnp.stack(
        [
            _gather_row_sample_packed(pchunks, rv[i], ru[i], valid[i])
            for i in range(TILE_Y)
        ]
    )


def _make_kernel(H, W, geom, num_tx, pack_pairs=True):
    """Returns the kernel fn closed over static geometry.

    H, W: true image sizes (un-padded); geom: include the forward-backward
    geometric-consistency term (needs src depth bands). Window offsets are
    DATA (SMEM [nw, 2] rows), so the offset loop is a fori_loop — the
    kernel body stays one-offset-sized regardless of window size (an
    unrolled 36-offset variant took >10 min of Mosaic compile through the
    remote-compile tunnel).

    pack_pairs: bf16-pair-packed photometric band (half the gathers per
    sample, ~2^-9 sample quantization); source DEPTH bands always stay
    f32 — quantized depths would bias the geometric-consistency term.
    """

    def kernel(y0_ref, x0_ref, params_ref, offs_ref, src_ref, sdep_ref,
               w_ref, wr_ref, d_ref, n_ref, stats_ref, out_ref, band,
               dband, sems):
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
        if geom:
            cp_dep = pltpu.make_async_copy(
                sdep_ref.at[v, pl.ds(y0, BAND_Y), pl.ds(x0, BAND_X)], dband,
                sems.at[1],
            )
            cp_dep.start()

        # view parameters (SMEM row, dynamically indexed by view)
        R = [params_ref[v, _P_R + i] for i in range(9)]
        t = [params_ref[v, _P_T + i] for i in range(3)]
        ksfx, ksfy, kscx, kscy = (params_ref[v, _P_KSF + i] for i in range(4))
        krfx, krfy, krcx, krcy = (params_ref[v, _P_KRF + i] for i in range(4))
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

        zero = jnp.zeros((TILE_Y, TILE_X), jnp.float32)
        cp_band.wait()
        if pack_pairs:
            pchunks = _band_chunks_packed(band[:])
        else:
            chunks, chunks1 = _band_chunks(band[:])
        nw = w_ref.shape[0]

        def offset_body(i, carry):
            s_sum, s2_sum, rs_sum, wv_sum = carry
            dy = offs_ref[i, 0]
            dx = offs_ref[i, 1]
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
            if pack_pairs:
                s = _gather_tile_sample_packed(pchunks, rv, ru, ok)
            else:
                s = _gather_tile_sample(chunks, chunks1, rv, ru, ok)
            okf = ok.astype(jnp.float32)
            wk = w_ref[i] * okf  # bilateral weight (spatial x color), DMA'd
            return (
                s_sum + wk * s,
                s2_sum + wk * s * s,
                rs_sum + (wr_ref[i] * okf) * s,  # w * ref_q precomputed
                wv_sum + wk,
            )

        s_sum, s2_sum, rs_sum, wv_sum = jax.lax.fori_loop(
            0, nw, offset_body, (zero, zero, zero, zero + 1e-9)
        )

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
            dch, dch1 = _band_chunks(dband[:])
            ds = _gather_tile_sample(dch, dch1, rvc, ruc, okc)
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


@functools.partial(
    jax.jit,
    static_argnames=("H", "W", "geom", "interpret", "pack_pairs"),
)
def pm_view_costs_pallas(
    src_pad, sdep_pad, w_pad, wr_pad, d_pad, n_pad, stats_pad, params,
    offs, y0, x0, H, W, geom=False, interpret=False, pack_pairs=True,
):
    """Per-view PatchMatch window costs for one candidate plane field.

    src_pad [K, Hp, Wp] f32 zero-padded sources (Hp >= BAND_Y mult 8,
    Wp >= BAND_X mult 128); sdep_pad: same-shape source depth bands (any
    [K, Hp, Wp] array when geom=False — unused); w_pad [nw, Hp, Wp]
    bilateral window weights (spatial x color, the XLA path's w_off);
    wr_pad [nw, Hp, Wp] = w_off * ref_off (weight times shifted reference);
    d_pad [Hp, Wp]; n_pad [3, Hp, Wp]; stats_pad [3, Hp, Wp] (w_sum,
    ref_mean, ref_var); params [K, 32] view rows; offs [nw, 2] f32 window
    offsets (dy, dx); y0/x0 [K, T] band origins (T = (Hp/8) * (Wp/128),
    row-major tiles).
    Returns cost [K, Hp, Wp] f32 (padding region = garbage, crop it).
    """
    K, Hp, Wp = src_pad.shape
    nw = w_pad.shape[0]
    nty, ntx = Hp // TILE_Y, Wp // TILE_X
    kernel = _make_kernel(H, W, geom, ntx, pack_pairs=pack_pairs)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(K, nty, ntx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # params [K, 32]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # offs [nw, 2]
            pl.BlockSpec(memory_space=pl.ANY),  # src_pad
            pl.BlockSpec(memory_space=pl.ANY),  # sdep_pad
            pl.BlockSpec((nw, TILE_Y, TILE_X),
                         lambda v, ty, tx, *_: (0, ty, tx)),
            pl.BlockSpec((nw, TILE_Y, TILE_X),
                         lambda v, ty, tx, *_: (0, ty, tx)),
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
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, Hp, Wp), jnp.float32),
        interpret=interpret,
    )(y0, x0, params, offs, src_pad, sdep_pad, w_pad, wr_pad, d_pad, n_pad,
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
