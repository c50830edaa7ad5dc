"""Pallas TPU kernel: fused Schur-complement CG matvec for bundle adjustment.

One implicit matvec of the reduced camera system
  S x = (U + damp) x - W V^-1 W^T x
evaluated per observation bucket (ref: Ceres ITERATIVE_SCHUR implicit
SchurComplementOperator; upstream ceres/internal/implicit_schur_complement).

Why a kernel: the XLA formulation gathers/scatters camera parameters per
observation through precomputed one-hot matrices of shape [I, T*P] — at C3
bench scale (128 images, 600k obs) each one-hot is 537 MB of f32 streamed
from HBM, and a matvec touches four of them (pose/intr gather + pose/intr
scatter) -> 2.1 GB -> 2.6 ms at v5e bandwidth, which matched the measured
2.37 ms/matvec exactly: the matvec was one-hot-bound, not math-bound. This
kernel streams J once (176 MB), keeps the camera tables VMEM-resident with
images in LANES, gathers x per observation via tpu.dynamic_gather (single
128-wide vreg chunks, the pattern proven in mvs/pm_kernels.py), evaluates
the J / V^-1 / J^T chain per [T, 128] tile in registers, and scatters with
per-tile in-VMEM one-hot dot_generals (the one-hot never exists in HBM).

Layouts: J [2, 21, T, P] component-first (6 pose | 12 intrinsics | 3 point
columns); img_idx/cam_idx [T, P] (a point's track occupies one column — the
track reduction is a sublane sum); camera tables transposed [rows, Ipad]
so the image axis is the lane axis.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pycolmap_tpu.ops.camera_models import MAX_PARAMS

_LANES = 128


def matvec_enabled() -> bool:
    """Whether the bucketed BA solver should use this kernel.

    PYCOLMAP_TPU_BA_PALLAS: "0" forces the XLA one-hot path, "1" forces the
    kernel (interpret mode on CPU), default "auto" = kernel on TPU only.
    """
    mode = os.environ.get("PYCOLMAP_TPU_BA_PALLAS", "auto").lower()
    if mode in ("0", "off", "false"):
        return False
    if mode in ("1", "on", "true", "interpret"):
        return True
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def interpret_default() -> bool:
    try:
        return jax.default_backend() in ("cpu",)
    except Exception:  # pragma: no cover
        return True


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def _chunk_gather(table_ref, row, idx, T, n_chunks):
    """table[row, idx] for idx [T, 128] -> [T, 128] f32.

    Per 128-lane chunk of the table row: broadcast to [T, 128], lane-gather
    with the in-chunk remainder, select by chunk membership. Small chunk
    counts unroll; large ones (wide camera tables at 1000+ images) run as
    a fori_loop so the compiler's live-temporary stack stays bounded (an
    unrolled 16-chunk scan pushed scoped VMEM to 29 MB at C5 shapes, r4).
    """
    def chunk(c, out):
        src = jnp.broadcast_to(
            table_ref[row, pl.ds(c * _LANES, _LANES)][None, :], (T, _LANES)
        )
        rem = jnp.clip(idx - c * _LANES, 0, _LANES - 1)
        hit = (idx >= c * _LANES) & (idx < (c + 1) * _LANES)
        return jnp.where(hit, jnp.take_along_axis(src, rem, axis=1), out)

    out = jnp.zeros((T, _LANES), jnp.float32)
    if n_chunks <= 4:
        for c in range(n_chunks):
            out = chunk(c, out)
        return out
    return jax.lax.fori_loop(0, n_chunks, chunk, out)


def _tile_scatter(acc, vals, idx, T, n_chunks, precision="highest"):
    """acc[r, i] += sum_{t,p: idx[t,p]==i} vals[r][t, p] via per-(t, chunk)
    one-hot dot_generals (one-hot built in registers from iota == idx).

    precision: "highest" for gradient/Hessian reductions (default MXU
    precision bf16-truncates the f32 values operand — same requirement as
    the XLA twins _gather_mm/_scatter_cam in ba_kernels.py); the bf16-packed
    CG matvec passes "default" instead — its values are products of a bf16 J
    stream, so a HIGHEST (3-pass) scatter would burn MXU passes to preserve
    precision the operands never had."""
    prec = (
        jax.lax.Precision.HIGHEST if precision == "highest" else None
    )
    R = len(vals)
    for t in range(T):
        v_t = jnp.stack([vals[r][t] for r in range(R)])  # [R, 128]
        idx_t = idx[t]
        for c in range(n_chunks):
            oh = (
                jax.lax.broadcasted_iota(
                    jnp.int32, (_LANES, _LANES), 0
                ) + c * _LANES
                == idx_t[None, :]
            ).astype(jnp.float32)  # [128 (i), 128 (p)]
            contrib = jax.lax.dot_general(
                v_t, oh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )  # [R, 128 (i)]
            sl = pl.ds(c * _LANES, _LANES)
            acc[0:R, sl] = acc[0:R, sl] + contrib


def _make_kernel(T, n_pt, n_ichunks, n_cchunks, NP):
    def kernel(J_ref, ii_ref, ci_ref, vinv_ref, xp_ref, xi_ref,
               outp_ref, outi_ref, accp, acci):
        pt = pl.program_id(0)

        @pl.when(pt == 0)
        def _init():
            accp[:] = jnp.zeros_like(accp)
            acci[:] = jnp.zeros_like(acci)

        J = J_ref[:]  # [2, 9+NP, T, 128]
        ii = ii_ref[:]  # [T, 128] int32
        ci = ci_ref[:]

        # per-observation camera-side x: 6 pose + NP intr components
        xc = [
            _chunk_gather(xp_ref, k, ii, T, n_ichunks) for k in range(6)
        ] + [
            _chunk_gather(xi_ref, k, ci, T, n_cchunks)
            for k in range(NP)
        ]
        nk = 6 + NP
        a0 = sum(J[0, k] * xc[k] for k in range(nk))  # [T, 128]
        a1 = sum(J[1, k] * xc[k] for k in range(nk))

        # y = Jp^T a summed over the track (sublane) axis -> per-point [128]
        y = [
            jnp.sum(J[0, nk + a] * a0 + J[1, nk + a] * a1, axis=0)
            for a in range(3)
        ]
        va, vb, vc, vd, ve, vf = (vinv_ref[i] for i in range(6))
        z0 = va * y[0] + vb * y[1] + vc * y[2]
        z1 = vb * y[0] + vd * y[1] + ve * y[2]
        z2 = vc * y[0] + ve * y[1] + vf * y[2]
        d0 = a0 - (
            J[0, nk] * z0[None] + J[0, nk + 1] * z1[None]
            + J[0, nk + 2] * z2[None]
        )
        d1 = a1 - (
            J[1, nk] * z0[None] + J[1, nk + 1] * z1[None]
            + J[1, nk + 2] * z2[None]
        )

        vals = [J[0, k] * d0 + J[1, k] * d1 for k in range(nk)]
        _tile_scatter(accp, vals[:6], ii, T, n_ichunks)
        _tile_scatter(acci, vals[6:], ci, T, n_cchunks)

        @pl.when(pt == n_pt - 1)
        def _flush():
            outp_ref[:] = accp[:]
            outi_ref[:] = acci[:]

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def cg_matvec_bucket(J, img_idx, cam_idx, Vinv, xpose_t, xintr_t,
                     interpret=False):
    """One bucket's contribution to the implicit Schur matvec.

    J [2, 9+NP, T, P] f32 (padding slots all-zero; NP = model param count);
    img_idx/cam_idx [T, P] int32; Vinv [6, P] packed symmetric
    (lambda-damped) point-block inverses; xpose_t [8, Ip] f32 (rows 0-5 =
    x_pose^T, Ip mult of 128); xintr_t [NP(+pad to 8), Cp] f32. Returns
    (outp_t [8, Ip], outi_t like xintr_t): J_c^T (I - J_p V^-1 J_p^T) J_c x
    accumulated per camera, transposed layouts.
    """
    _, nj, T, P = J.shape
    NP = nj - 9
    n_pt = P // _LANES
    n_ichunks = xpose_t.shape[1] // _LANES
    n_cchunks = xintr_t.shape[1] // _LANES
    kernel = _make_kernel(T, n_pt, n_ichunks, n_cchunks, NP)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_pt,),
        in_specs=[
            pl.BlockSpec((2, nj, T, _LANES), lambda p: (0, 0, 0, p)),
            pl.BlockSpec((T, _LANES), lambda p: (0, p)),
            pl.BlockSpec((T, _LANES), lambda p: (0, p)),
            pl.BlockSpec((6, _LANES), lambda p: (0, p)),
            pl.BlockSpec(xpose_t.shape, lambda p: (0, 0)),
            pl.BlockSpec(xintr_t.shape, lambda p: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec(xpose_t.shape, lambda p: (0, 0)),
            pl.BlockSpec(xintr_t.shape, lambda p: (0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM(xpose_t.shape, jnp.float32),
            pltpu.VMEM(xintr_t.shape, jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(xpose_t.shape, jnp.float32),
            jax.ShapeDtypeStruct(xintr_t.shape, jnp.float32),
        ],
        interpret=interpret,
    )(J, img_idx, cam_idx, Vinv, xpose_t, xintr_t)


def _make_matvec16_kernel(T, n_steps, n_sub, n_ichunks, n_cchunks, NP,
                          single_cam):
    """bf16-packed Schur matvec kernel, wide-block edition.

    J arrives as [9+NP, 2T, P] bf16 — residual-row pairs packed into the
    SUBLANE axis so each column plane is exactly one (16, 128) bf16 tile.
    Each grid step covers n_sub lane-tiles (W = n_sub*128 lanes): the
    elementwise algebra runs WIDE (one vector op across the whole block —
    round-4 profiling showed per-vreg op issue, not HBM bytes, bounds these
    kernels at ~1 ns/slot), while the lane-granular pieces (tpu.dynamic_-
    gather of x, one-hot MXU scatter) run per 128-lane subtile.  x is
    gathered on the T track rows once and shared by both packed residual
    halves (indices are identical).  single_cam=True (C == 1, the common
    COLMAP shared-camera case) replaces the NP intrinsics gathers with
    scalar broadcasts and the intrinsics scatter with a wide reduction —
    callers then lane-sum the returned intr partials.
    """
    nk = 6 + NP

    def kernel(J_ref, ii_ref, ci_ref, vinv_ref,
               xp_ref, xi_ref, outp_ref, outi_ref, accp, acci, xg_buf):
        pt = pl.program_id(0)

        @pl.when(pt == 0)
        def _init():
            accp[:] = jnp.zeros_like(accp)
            acci[:] = jnp.zeros_like(acci)

        # lane-granular gathers into a VMEM staging buffer
        for s in range(n_sub):
            sl = slice(s * _LANES, (s + 1) * _LANES)
            ii_s = ii_ref[:, sl]
            for k in range(6):
                xg_buf[k, :, sl] = _chunk_gather(
                    xp_ref, k, ii_s, T, n_ichunks
                )
            if not single_cam:
                ci_s = ci_ref[:, sl]
                for k in range(NP):
                    xg_buf[6 + k, :, sl] = _chunk_gather(
                        xi_ref, k, ci_s, T, n_cchunks
                    )

        # wide algebra over the full [.., T, W] block
        J = J_ref[:].astype(jnp.float32)  # [9+NP, 2T, W]
        xg = xg_buf[:]
        if single_cam:
            xik = [xi_ref[k, 0] for k in range(NP)]
        else:
            xik = [xg[6 + k] for k in range(NP)]
        a = sum(J[k, :T] * xg[k] for k in range(6)) + sum(
            J[6 + k, :T] * xik[k] for k in range(NP)
        )
        a2 = sum(J[k, T:] * xg[k] for k in range(6)) + sum(
            J[6 + k, T:] * xik[k] for k in range(NP)
        )
        # point reduction over both residual rows and the track
        y = [
            jnp.sum(J[nk + p_, :T] * a + J[nk + p_, T:] * a2, axis=0)
            for p_ in range(3)
        ]
        va, vb, vc, vd, ve, vf = (vinv_ref[i] for i in range(6))
        z0 = va * y[0] + vb * y[1] + vc * y[2]
        z1 = vb * y[0] + vd * y[1] + ve * y[2]
        z2 = vc * y[0] + ve * y[1] + vf * y[2]
        d = a - (
            J[nk, :T] * z0[None] + J[nk + 1, :T] * z1[None]
            + J[nk + 2, :T] * z2[None]
        )
        d2 = a2 - (
            J[nk, T:] * z0[None] + J[nk + 1, T:] * z1[None]
            + J[nk + 2, T:] * z2[None]
        )
        vals = [J[k, :T] * d + J[k, T:] * d2 for k in range(nk)]

        # lane-granular one-hot scatters (+ the single-cam intr reduction,
        # kept 2-D per subtile: a 1-D [W] -> [n_sub, 128] reshape hit
        # Mosaic "unsupported shape cast" at some shapes, r4)
        for s in range(n_sub):
            sl = slice(s * _LANES, (s + 1) * _LANES)
            ii_s = ii_ref[:, sl]
            _tile_scatter(
                accp, [v[:, sl] for v in vals[:6]], ii_s, T, n_ichunks,
                precision="default",
            )
            if single_cam:
                for k in range(NP):
                    sk = jnp.sum(
                        vals[6 + k][:, sl], axis=0, keepdims=True
                    )  # [1, 128]
                    acci[k:k + 1, 0:_LANES] = acci[k:k + 1, 0:_LANES] + sk
            else:
                ci_s = ci_ref[:, sl]
                _tile_scatter(
                    acci, [v[:, sl] for v in vals[6:]], ci_s, T, n_cchunks,
                    precision="default",
                )

        @pl.when(pt == n_steps - 1)
        def _flush():
            outp_ref[:] = accp[:]
            outi_ref[:] = acci[:]

    return kernel


def _subtile_split(P, bytes_per_tile, max_sub=32, budget=9 * 2**20):
    """(n_steps, n_sub) with n_sub lane-tiles per grid step.

    n_sub is capped so the double-buffered input blocks + scratch fit the
    16 MB scoped-VMEM limit (bytes_per_tile = per-lane-tile VMEM demand;
    a T=32 bucket at n_sub=32 hit 22.3 MB and failed to compile, r4)."""
    n_pt = P // _LANES
    n_sub = max(1, min(max_sub, budget // max(bytes_per_tile, 1)))
    n_sub = 1 << (n_sub.bit_length() - 1)  # power of two
    while n_pt % n_sub:
        n_sub //= 2
    return n_pt // n_sub, n_sub


@functools.partial(jax.jit, static_argnames=("single_cam", "interpret"))
def cg_matvec16_bucket(J16, img_idx, cam_idx, Vinv,
                       xpose_t, xintr_t, single_cam=False, interpret=False):
    """One bucket's implicit Schur matvec from bf16-packed J.

    J16 [9+NP, 2T, P] bf16 (see pack_j_bf16); img_idx/cam_idx [T, P];
    remaining args as cg_matvec_bucket.  With single_cam=True the returned
    intr accumulator holds per-lane PARTIAL sums — lane-sum it (the caller
    does) to get the [NP] totals."""
    nj, T2, P = J16.shape
    NP = nj - 9
    T = T2 // 2
    xg_rows = 6 + (0 if single_cam else NP)
    # per-lane-tile VMEM: J block (x2 buffers) + ii/ci blocks (x2) + Vinv
    # (x2) + the xg staging scratch
    n_ichunks = xpose_t.shape[1] // _LANES
    bytes_per_tile = (
        nj * T2 * _LANES * 2 * 2
        + 2 * T * _LANES * 4 * 2
        + 6 * _LANES * 4 * 2
        + xg_rows * T * _LANES * 4
        # live temporaries of the chunked gathers grow with the unrolled
        # chunk count (<=4; larger counts run as fori_loop)
        + xg_rows * T * _LANES * 4 * min(n_ichunks, 4)
    )
    n_steps, n_sub = _subtile_split(P, bytes_per_tile)
    W = n_sub * _LANES
    kernel = _make_matvec16_kernel(
        T, n_steps, n_sub, xpose_t.shape[1] // _LANES,
        xintr_t.shape[1] // _LANES, NP, single_cam,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((nj, T2, W), lambda p: (0, 0, p)),
            pl.BlockSpec((T, W), lambda p: (0, p)),
            pl.BlockSpec((T, W), lambda p: (0, p)),
            pl.BlockSpec((6, W), lambda p: (0, p)),
            pl.BlockSpec(xpose_t.shape, lambda p: (0, 0)),
            pl.BlockSpec(xintr_t.shape, lambda p: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec(xpose_t.shape, lambda p: (0, 0)),
            pl.BlockSpec(xintr_t.shape, lambda p: (0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM(xpose_t.shape, jnp.float32),
            pltpu.VMEM(xintr_t.shape, jnp.float32),
            pltpu.VMEM((6 + (0 if single_cam else NP), T, W), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(xpose_t.shape, jnp.float32),
            jax.ShapeDtypeStruct(xintr_t.shape, jnp.float32),
        ],
        interpret=interpret,
    )(J16, img_idx, cam_idx, Vinv, xpose_t, xintr_t)


def pack_j_bf16(J):
    """[2, nj, T, P] f32 -> [nj, 2T, P] bf16 (rows 0..T-1 = residual row 0).

    One XLA transpose+cast per LM step; the CG loop then reads half the
    bytes per matvec for cg_iters matvecs."""
    _, nj, T, P = J.shape
    return (
        J.transpose(1, 0, 2, 3).reshape(nj, 2 * T, P).astype(jnp.bfloat16)
    )


def schur_matvec16(buckets, J16_l, Vinv_l, x_pose, x_intr, I, C,
                   interpret=None):
    """Implicit S x over all buckets from bf16-packed J (see schur_matvec)."""
    if interpret is None:
        interpret = interpret_default()
    NP = J16_l[0].shape[0] - 9
    single_cam = C == 1
    Ip = _round_up(I, _LANES)
    Cp = _round_up(C, _LANES)
    xp_t = jnp.zeros((8, Ip), jnp.float32).at[:6, :I].set(x_pose.T)
    mp8 = _round_up(NP, 8)
    xi_t = jnp.zeros((mp8, Cp), jnp.float32).at[:NP, :C].set(x_intr.T)
    out_pose = jnp.zeros((I, 6))
    out_intr = jnp.zeros((C, NP))
    for b, J16, Vinv in zip(buckets, J16_l, Vinv_l):
        op_t, oi_t = cg_matvec16_bucket(
            J16, b.img_idx, b.cam_idx, Vinv, xp_t, xi_t,
            single_cam=single_cam, interpret=interpret,
        )
        out_pose = out_pose + op_t[:6, :I].T
        if single_cam:
            # intr rows are per-lane partial sums (see cg_matvec16_bucket)
            out_intr = out_intr + jnp.sum(oi_t[:NP], axis=1).reshape(1, NP)
        else:
            out_intr = out_intr + oi_t[:NP, :C].T
    return out_pose, out_intr


def _make_gather_kernel(Ri, Rc, T, n_ichunks, n_cchunks):
    def kernel(itab_ref, ctab_ref, ii_ref, ci_ref, outi_ref, outc_ref):
        ii = ii_ref[:]
        ci = ci_ref[:]
        for r in range(Ri):
            outi_ref[r] = _chunk_gather(itab_ref, r, ii, T, n_ichunks)
        for r in range(Rc):
            outc_ref[r] = _chunk_gather(ctab_ref, r, ci, T, n_cchunks)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_params_bucket(img_tab_t, cam_tab_t, img_idx, cam_idx,
                         interpret=False):
    """Per-observation parameter gather: one bucket, both index spaces.

    img_tab_t [Ri, Ip] f32 (Ip 128-multiple, image axis in LANES);
    cam_tab_t [Rc, Cp]; img_idx/cam_idx [T, P] int32. Returns
    (out_i [Ri, T, P], out_c [Rc, T, P]) with out_i[r] = img_tab_t[r,
    img_idx] etc.

    Why a kernel: the XLA fast-path gathers camera parameters through
    precomputed one-hot matmuls (``ba_kernels._gather_mm``) whose [I, T*P]
    one-hot is 537 MB of f32 at C3 bench scale, streamed from HBM once PER
    CALL — the residual+Jacobian, back-substitution, and total-cost stages
    each pay multiple such streams per LM iteration. This kernel keeps the
    tables VMEM-resident (images in lanes) and lane-gathers them per
    [T, 128] tile via tpu.dynamic_gather — traffic drops from ~512 B/obs
    per gathered component-set to the 4 B/obs index read + output write.
    """
    Ri = img_tab_t.shape[0]
    Rc = cam_tab_t.shape[0]
    T, P = img_idx.shape
    n_pt = P // _LANES
    kernel = _make_gather_kernel(
        Ri, Rc, T, img_tab_t.shape[1] // _LANES, cam_tab_t.shape[1] // _LANES
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_pt,),
        in_specs=[
            pl.BlockSpec(img_tab_t.shape, lambda p: (0, 0)),
            pl.BlockSpec(cam_tab_t.shape, lambda p: (0, 0)),
            pl.BlockSpec((T, _LANES), lambda p: (0, p)),
            pl.BlockSpec((T, _LANES), lambda p: (0, p)),
        ],
        out_specs=[
            pl.BlockSpec((Ri, T, _LANES), lambda p: (0, 0, p)),
            pl.BlockSpec((Rc, T, _LANES), lambda p: (0, 0, p)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Ri, T, P), jnp.float32),
            jax.ShapeDtypeStruct((Rc, T, P), jnp.float32),
        ],
        interpret=interpret,
    )(img_tab_t, cam_tab_t, img_idx, cam_idx)


def _table_t(arr, n, width):
    """[N, k] f32 -> transposed padded [width, n] table (image axis lanes)."""
    k = arr.shape[1]
    return jnp.zeros((width, n), jnp.float32).at[:k, : arr.shape[0]].set(
        arr.T
    )


def gather_obs_params(bucket, quat, trans, intr, interpret=None):
    """Pallas twin of ``ba_kernels._gather_obs_params`` (one-hot-free).

    quat [I, 4], trans [I, 3], intr [C, NP]. Returns (q_obs 4-tuple,
    t_obs 3-tuple, k_obs NP-tuple) of [T, P] arrays.
    """
    if interpret is None:
        interpret = interpret_default()
    NP = intr.shape[1]
    I = quat.shape[0]
    C = intr.shape[0]
    Ip = _round_up(I, _LANES)
    Cp = _round_up(C, _LANES)
    itab = jnp.zeros((8, Ip), jnp.float32)
    itab = itab.at[:4, :I].set(quat.T).at[4:7, :I].set(trans.T)
    ctab = _table_t(intr, Cp, _round_up(NP, 8))
    oi, oc = gather_params_bucket(
        itab, ctab, bucket.img_idx, bucket.cam_idx, interpret=interpret
    )
    q_obs = tuple(oi[r] for r in range(4))
    t_obs = tuple(oi[4 + r] for r in range(3))
    k_obs = tuple(oc[r] for r in range(NP))
    return q_obs, t_obs, k_obs


def gather_x(bucket, x_pose, x_intr, interpret=None):
    """Gather CG solution vectors per observation (back-substitution stage).

    x_pose [I, 6], x_intr [C, NP] -> (xp [6, T, P], xi [NP, T, P])."""
    if interpret is None:
        interpret = interpret_default()
    NP = x_intr.shape[1]
    I = x_pose.shape[0]
    C = x_intr.shape[0]
    itab = _table_t(x_pose, _round_up(I, _LANES), 8)
    ctab = _table_t(x_intr, _round_up(C, _LANES), _round_up(NP, 8))
    oi, oc = gather_params_bucket(
        itab, ctab, bucket.img_idx, bucket.cam_idx, interpret=interpret
    )
    return oi[:6], oc[:NP]


# ---------------------------------------------------------------------------
# fused residual + Jacobian / cost / back-substitution kernels
# ---------------------------------------------------------------------------


def _gather_pose_intr(itab_ref, ctab_ref, ii, ci, T, n_ichunks, n_cchunks,
                      NP):
    """In-kernel per-observation parameter gather: q(4) t(3) from the image
    table, intr(NP) from the camera table."""
    q_obs = tuple(_chunk_gather(itab_ref, r, ii, T, n_ichunks) for r in range(4))
    t_obs = tuple(
        _chunk_gather(itab_ref, 4 + r, ii, T, n_ichunks) for r in range(3)
    )
    k_obs = tuple(
        _chunk_gather(ctab_ref, r, ci, T, n_cchunks) for r in range(NP)
    )
    return q_obs, t_obs, k_obs


def _make_resjac_kernel(model_id, loss_type, T, n_ichunks, n_cchunks, NP):
    """Fused res+jac: per-obs parameter lane-gathers, the analytic Jacobian
    chain of ba_kernels._bucket_res_and_jac, and IRLS robust weighting — J is
    written once, straight from registers (the XLA formulation materializes
    dozens of [T, P] intermediates between HBM round-trips)."""

    def kernel(itab_ref, ctab_ref, ii_ref, ci_ref, xy_ref, mask_ref,
               ptsf_ref, scale_ref, res_ref, J_ref):
        from pycolmap_tpu.sfm import ba_kernels as bk
        from pycolmap_tpu.sfm.bundle_adjustment import _robust_weight

        ii = ii_ref[:]
        ci = ci_ref[:]
        q_obs, t_obs, k_obs = _gather_pose_intr(
            itab_ref, ctab_ref, ii, ci, T, n_ichunks, n_cchunks, NP
        )
        ifo = tuple(
            _chunk_gather(ctab_ref, NP + r, ci, T, n_cchunks)
            for r in range(NP)
        )
        ptsf = ptsf_ref[:]  # [4, 128]: xyz + point_free
        bucket = bk.Bucket(
            img_idx=ii, cam_idx=ci, xy=xy_ref[:], mask=mask_ref[:],
            points=ptsf[0:3], point_free=ptsf[3], point_rows=ii,
        )
        res, J = bk._bucket_res_and_jac(
            model_id, bucket, q_obs, t_obs, k_obs, ifo
        )
        sq = res[0] * res[0] + res[1] * res[1]
        w = _robust_weight(sq, loss_type, scale_ref[0, 0]) * bucket.mask
        sw = jnp.sqrt(w)
        res_ref[:] = res * sw[None]
        J_ref[:] = J * sw[None, None]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("model_id", "loss_type", "interpret")
)
def resjac_bucket(itab, ctab, img_idx, cam_idx, xy, mask, ptsf, scale,
                  model_id, loss_type, interpret=False):
    """One bucket's robust-weighted residual [2, T, P] + Jacobian
    [2, 9+NP, T, P]. itab [8, Ip] rows 0-3 quat^T | 4-6 trans^T;
    ctab [pad8(2*NP), Cp] rows 0..NP-1 intr^T | NP..2NP-1 intr_free^T;
    ptsf [4, P] rows xyz | point_free; scale [1, 1] SMEM robust-loss
    scale."""
    from pycolmap_tpu.ops.camera_models import solver_num_params

    NP = solver_num_params(model_id)
    T, P = img_idx.shape
    n_pt = P // _LANES
    kernel = _make_resjac_kernel(
        model_id, loss_type, T, itab.shape[1] // _LANES,
        ctab.shape[1] // _LANES, NP,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_pt,),
        in_specs=[
            pl.BlockSpec(itab.shape, lambda p: (0, 0)),
            pl.BlockSpec(ctab.shape, lambda p: (0, 0)),
            pl.BlockSpec((T, _LANES), lambda p: (0, p)),
            pl.BlockSpec((T, _LANES), lambda p: (0, p)),
            pl.BlockSpec((2, T, _LANES), lambda p: (0, 0, p)),
            pl.BlockSpec((T, _LANES), lambda p: (0, p)),
            pl.BlockSpec((4, _LANES), lambda p: (0, p)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((2, T, _LANES), lambda p: (0, 0, p)),
            pl.BlockSpec((2, 9 + NP, T, _LANES), lambda p: (0, 0, 0, p)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((2, T, P), jnp.float32),
            jax.ShapeDtypeStruct((2, 9 + NP, T, P), jnp.float32),
        ],
        interpret=interpret,
    )(itab, ctab, img_idx, cam_idx, xy, mask, ptsf, scale)


def _make_cost_kernel(model_id, loss_type, T, n_pt, n_ichunks, n_cchunks,
                      NP):
    def kernel(itab_ref, ctab_ref, ii_ref, ci_ref, xy_ref, mask_ref,
               ptsf_ref, scale_ref, cost_ref, acc):
        from pycolmap_tpu.sfm import ba_kernels as bk
        from pycolmap_tpu.sfm.bundle_adjustment import _robust_cost

        pt = pl.program_id(0)

        @pl.when(pt == 0)
        def _init():
            acc[:] = jnp.zeros_like(acc)

        ii = ii_ref[:]
        ci = ci_ref[:]
        q_obs, t_obs, k_obs = _gather_pose_intr(
            itab_ref, ctab_ref, ii, ci, T, n_ichunks, n_cchunks, NP
        )
        ptsf = ptsf_ref[:]
        mask = mask_ref[:]
        X = (ptsf[0][None], ptsf[1][None], ptsf[2][None])
        rx, ry = bk._residual_vals(
            model_id, xy_ref[:], mask, q_obs, t_obs, k_obs, X
        )
        sq = rx * rx + ry * ry
        c = _robust_cost(sq, loss_type, scale_ref[0, 0]) * mask
        acc[0:1, :] = acc[0:1, :] + jnp.sum(c, axis=0, keepdims=True)

        @pl.when(pt == n_pt - 1)
        def _flush():
            cost_ref[:] = acc[:]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("model_id", "loss_type", "interpret")
)
def cost_bucket(itab, ctab, img_idx, cam_idx, xy, mask, ptsf, scale,
                model_id, loss_type, interpret=False):
    """One bucket's robust cost, lane-partial: returns [8, 128] whose row 0
    holds per-lane partial sums (caller sums). Table layouts as resjac_bucket
    (ctab intr_free rows are ignored here)."""
    from pycolmap_tpu.ops.camera_models import solver_num_params

    NP = solver_num_params(model_id)
    T, P = img_idx.shape
    n_pt = P // _LANES
    kernel = _make_cost_kernel(
        model_id, loss_type, T, n_pt, itab.shape[1] // _LANES,
        ctab.shape[1] // _LANES, NP,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_pt,),
        in_specs=[
            pl.BlockSpec(itab.shape, lambda p: (0, 0)),
            pl.BlockSpec(ctab.shape, lambda p: (0, 0)),
            pl.BlockSpec((T, _LANES), lambda p: (0, p)),
            pl.BlockSpec((T, _LANES), lambda p: (0, p)),
            pl.BlockSpec((2, T, _LANES), lambda p: (0, 0, p)),
            pl.BlockSpec((T, _LANES), lambda p: (0, p)),
            pl.BlockSpec((4, _LANES), lambda p: (0, p)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[pl.BlockSpec((8, _LANES), lambda p: (0, 0))],
        scratch_shapes=[pltpu.VMEM((8, _LANES), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((8, _LANES), jnp.float32)],
        interpret=interpret,
    )(itab, ctab, img_idx, cam_idx, xy, mask, ptsf, scale)[0]


def _make_finish_kernel(model_id, loss_type, T, n_pt, n_ichunks, n_cchunks,
                        NP):
    """Fused LM-step tail: gather the CG solution per obs, back-substitute
    the point update, and evaluate the robust cost at the UPDATED parameters
    (new camera tables + just-computed points) without a round-trip of the
    new points through HBM-and-back."""
    nk = 6 + NP

    def kernel(J_ref, vinv_ref, gpt_ref, ii_ref, ci_ref, xy_ref, mask_ref,
               ptsf_ref, xtab_i_ref, xtab_c_ref, ntab_i_ref, ntab_c_ref,
               scale_ref, npts_ref, cost_ref, acc):
        from pycolmap_tpu.sfm import ba_kernels as bk
        from pycolmap_tpu.sfm.bundle_adjustment import _robust_cost

        pt = pl.program_id(0)

        @pl.when(pt == 0)
        def _init():
            acc[:] = jnp.zeros_like(acc)

        ii = ii_ref[:]
        ci = ci_ref[:]
        J = J_ref[:]  # [2, 9+NP, T, 128]

        # --- back-substitution -------------------------------------------
        xc = [
            _chunk_gather(xtab_i_ref, k, ii, T, n_ichunks) for k in range(6)
        ] + [
            _chunk_gather(xtab_c_ref, k, ci, T, n_cchunks)
            for k in range(NP)
        ]
        a0 = sum(J[0, k] * xc[k] for k in range(nk))
        a1 = sum(J[1, k] * xc[k] for k in range(nk))
        bt = [
            jnp.sum(J[0, nk + a] * a0 + J[1, nk + a] * a1, axis=0)
            for a in range(3)
        ]
        va, vb, vc, vd, ve, vf = (vinv_ref[i] for i in range(6))
        g = [gpt_ref[i] for i in range(3)]
        r0 = g[0] - bt[0]
        r1 = g[1] - bt[1]
        r2 = g[2] - bt[2]
        dp = (
            va * r0 + vb * r1 + vc * r2,
            vb * r0 + vd * r1 + ve * r2,
            vc * r0 + ve * r1 + vf * r2,
        )
        ptsf = ptsf_ref[:]
        pfree = ptsf[3]
        newpt = [ptsf[a] - dp[a] * pfree for a in range(3)]
        npts_ref[:] = jnp.stack(newpt)

        # --- robust cost at the updated parameters ------------------------
        q_obs, t_obs, k_obs = _gather_pose_intr(
            ntab_i_ref, ntab_c_ref, ii, ci, T, n_ichunks, n_cchunks, NP
        )
        mask = mask_ref[:]
        X = (newpt[0][None], newpt[1][None], newpt[2][None])
        rx, ry = bk._residual_vals(
            model_id, xy_ref[:], mask, q_obs, t_obs, k_obs, X
        )
        sq = rx * rx + ry * ry
        c = _robust_cost(sq, loss_type, scale_ref[0, 0]) * mask
        acc[0:1, :] = acc[0:1, :] + jnp.sum(c, axis=0, keepdims=True)

        @pl.when(pt == n_pt - 1)
        def _flush():
            cost_ref[:] = acc[:]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("model_id", "loss_type", "interpret")
)
def finish_bucket(J, Vinv, g_pt, img_idx, cam_idx, xy, mask, ptsf,
                  xtab_i, xtab_c, ntab_i, ntab_c, scale,
                  model_id, loss_type, interpret=False):
    """One bucket's fused back-substitution + new-cost evaluation.

    Returns (new_pts [3, P], cost_partial [8, 128] with row 0 = per-lane
    partial sums of the robust cost at the updated parameters).
    xtab_i [8, Ip] rows 0-5 = x_pose^T; xtab_c [pad8(NP), Cp] rows =
    x_intr^T; ntab_i/ntab_c: updated parameter tables (layout as
    resjac_bucket)."""
    from pycolmap_tpu.ops.camera_models import solver_num_params

    NP = solver_num_params(model_id)
    nj = J.shape[1]
    assert nj == 9 + NP
    T, P = img_idx.shape
    n_pt = P // _LANES
    kernel = _make_finish_kernel(
        model_id, loss_type, T, n_pt, xtab_i.shape[1] // _LANES,
        xtab_c.shape[1] // _LANES, NP,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_pt,),
        in_specs=[
            pl.BlockSpec((2, nj, T, _LANES), lambda p: (0, 0, 0, p)),
            pl.BlockSpec((6, _LANES), lambda p: (0, p)),
            pl.BlockSpec((3, _LANES), lambda p: (0, p)),
            pl.BlockSpec((T, _LANES), lambda p: (0, p)),
            pl.BlockSpec((T, _LANES), lambda p: (0, p)),
            pl.BlockSpec((2, T, _LANES), lambda p: (0, 0, p)),
            pl.BlockSpec((T, _LANES), lambda p: (0, p)),
            pl.BlockSpec((4, _LANES), lambda p: (0, p)),
            pl.BlockSpec(xtab_i.shape, lambda p: (0, 0)),
            pl.BlockSpec(xtab_c.shape, lambda p: (0, 0)),
            pl.BlockSpec(ntab_i.shape, lambda p: (0, 0)),
            pl.BlockSpec(ntab_c.shape, lambda p: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((3, _LANES), lambda p: (0, p)),
            pl.BlockSpec((8, _LANES), lambda p: (0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((8, _LANES), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((3, P), jnp.float32),
            jax.ShapeDtypeStruct((8, _LANES), jnp.float32),
        ],
        interpret=interpret,
    )(J, Vinv, g_pt, img_idx, cam_idx, xy, mask, ptsf,
      xtab_i, xtab_c, ntab_i, ntab_c, scale)


def _param_tables(quat, trans, intr, intr_free, NP):
    """Build the [8, Ip] image table (quat | trans) and [pad8(2*NP), Cp]
    camera table (intr rows 0..NP-1 | intr_free rows NP..2NP-1) used by the
    resjac/cost/finish kernels. intr/intr_free wider than NP are sliced."""
    I = quat.shape[0]
    C = intr.shape[0]
    Ip = _round_up(I, _LANES)
    Cp = _round_up(C, _LANES)
    itab = jnp.zeros((8, Ip), jnp.float32)
    itab = itab.at[:4, :I].set(quat.T).at[4:7, :I].set(trans.T)
    ctab = jnp.zeros((_round_up(2 * NP, 8), Cp), jnp.float32)
    ctab = ctab.at[:NP, :C].set(intr[:, :NP].T)
    if intr_free is not None:
        ctab = ctab.at[NP:2 * NP, :C].set(intr_free[:, :NP].T)
    return itab, ctab


def res_and_jac(buckets, pts_list, quat, trans, intr, intr_free,
                model_id, loss_type, loss_scale, interpret=None):
    """Fused robust-weighted residual+Jacobian over all buckets.
    Returns J_l with NP-narrow intrinsics blocks ([2, 9+NP, T, P])."""
    from pycolmap_tpu.ops.camera_models import solver_num_params

    if interpret is None:
        interpret = interpret_default()
    NP = solver_num_params(model_id)
    itab, ctab = _param_tables(quat, trans, intr, intr_free, NP)
    scale = jnp.reshape(jnp.asarray(loss_scale, jnp.float32), (1, 1))
    res_l, J_l = [], []
    for b, pts in zip(buckets, pts_list):
        ptsf = jnp.concatenate([pts, b.point_free[None]], axis=0)
        res, J = resjac_bucket(
            itab, ctab, b.img_idx, b.cam_idx, b.xy, b.mask, ptsf, scale,
            model_id, loss_type, interpret=interpret,
        )
        res_l.append(res)
        J_l.append(J)
    return res_l, J_l


def total_cost(buckets, pts_list, quat, trans, intr, model_id, loss_type,
               loss_scale, interpret=None):
    """Fused robust total cost over all buckets (scalar)."""
    from pycolmap_tpu.ops.camera_models import solver_num_params

    if interpret is None:
        interpret = interpret_default()
    NP = solver_num_params(model_id)
    itab, ctab = _param_tables(quat, trans, intr, None, NP)
    scale = jnp.reshape(jnp.asarray(loss_scale, jnp.float32), (1, 1))
    cost = jnp.float32(0.0)
    for b, pts in zip(buckets, pts_list):
        ptsf = jnp.concatenate([pts, b.point_free[None]], axis=0)
        part = cost_bucket(
            itab, ctab, b.img_idx, b.cam_idx, b.xy, b.mask, ptsf, scale,
            model_id, loss_type, interpret=interpret,
        )
        cost = cost + jnp.sum(part[0])
    return cost


def backsub_and_cost(buckets, pts_list, J_l, Vinv_l, g_pt_l, x_pose, x_intr,
                     new_quat, new_trans, new_intr, model_id, loss_type,
                     loss_scale, interpret=None):
    """Fused LM tail over all buckets: point back-substitution + robust cost
    at the updated parameters. x_intr is [C, NP]. Returns
    (new_pts_list, new_cost)."""
    from pycolmap_tpu.ops.camera_models import solver_num_params

    if interpret is None:
        interpret = interpret_default()
    NP = solver_num_params(model_id)
    I = x_pose.shape[0]
    C = x_intr.shape[0]
    xtab_i = _table_t(x_pose, _round_up(I, _LANES), 8)
    xtab_c = _table_t(x_intr[:, :NP], _round_up(C, _LANES),
                      _round_up(NP, 8))
    ntab_i, ntab_c = _param_tables(new_quat, new_trans, new_intr, None, NP)
    scale = jnp.reshape(jnp.asarray(loss_scale, jnp.float32), (1, 1))
    new_pts_list = []
    cost = jnp.float32(0.0)
    for b, pts, J, Vinv, g_pt in zip(buckets, pts_list, J_l, Vinv_l, g_pt_l):
        ptsf = jnp.concatenate([pts, b.point_free[None]], axis=0)
        npts, part = finish_bucket(
            J, Vinv, g_pt, b.img_idx, b.cam_idx, b.xy, b.mask, ptsf,
            xtab_i, xtab_c, ntab_i, ntab_c, scale,
            model_id, loss_type, interpret=interpret,
        )
        new_pts_list.append(npts)
        cost = cost + jnp.sum(part[0])
    return new_pts_list, cost


def _make_prepare_kernel(T, n_pt, n_ichunks, n_cchunks, NP):
    """Fused per-bucket LM-step preparation (one pass over J):

      V       = lam-damped point blocks J_p^T J_p  -> packed 3x3 inverses
      g_pt    = J_p^T res per point (track = sublane sum)
      rhs     = J_c^T (res - J_p V^-1 g_pt) scattered per camera
      U_diag  = diag(J_c^T J_c) per camera (damping diagonals)
      S       = per-camera 6x6 SCHUR_JACOBI blocks
                sum_obs (Jc^T Jc - W V^-1 W^T), W = Jc^T Jp

    Replaces four XLA stages (V build 6.1 ms, gradients+rhs 7.4 ms,
    precond build 18.2 ms at C3 scale — dominated by 537 MB one-hot
    scatter streams and materialized [*, T, P] intermediates).
    """
    MP = NP
    nk = 6 + MP
    tri = [(i, j) for i in range(6) for j in range(i, 6)]

    def kernel(J_ref, res_ref, ii_ref, ci_ref, lam_ref,
               vinv_ref, gpt_ref, outi_ref, outc_ref, acci, accc):
        pt = pl.program_id(0)

        @pl.when(pt == 0)
        def _init():
            acci[:] = jnp.zeros_like(acci)
            accc[:] = jnp.zeros_like(accc)

        J = J_ref[:]  # [2, 9+NP, T, 128]
        res = res_ref[:]  # [2, T, 128]
        ii = ii_ref[:]
        ci = ci_ref[:]
        lam = lam_ref[0, 0]

        Jp = [[J[r, nk + a] for a in range(3)] for r in range(2)]

        # --- lam-damped point blocks + packed inverse ---------------------
        pairs = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
        V = [
            jnp.sum(Jp[0][i] * Jp[0][j] + Jp[1][i] * Jp[1][j], axis=0)
            for i, j in pairs
        ]  # 6 x [128]
        V[0] = V[0] + lam * jnp.maximum(V[0], 1e-6)
        V[3] = V[3] + lam * jnp.maximum(V[3], 1e-6)
        V[5] = V[5] + lam * jnp.maximum(V[5], 1e-6)
        a_, b_, c_, d_, e_, f_ = V
        iA = d_ * f_ - e_ * e_
        iB = c_ * e_ - b_ * f_
        iC = b_ * e_ - c_ * d_
        det = a_ * iA + b_ * iB + c_ * iC
        det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        iD = a_ * f_ - c_ * c_
        iE = b_ * c_ - a_ * e_
        iF = a_ * d_ - b_ * b_
        va, vb, vc = iA / det, iB / det, iC / det
        vd, ve, vf = iD / det, iE / det, iF / det

        # --- point gradient + z0 = V^-1 g_pt ------------------------------
        g = [
            jnp.sum(Jp[0][a] * res[0] + Jp[1][a] * res[1], axis=0)
            for a in range(3)
        ]
        z0 = (
            va * g[0] + vb * g[1] + vc * g[2],
            vb * g[0] + vd * g[1] + ve * g[2],
            vc * g[0] + ve * g[1] + vf * g[2],
        )
        rmj = [
            res[r]
            - (
                Jp[r][0] * z0[0][None]
                + Jp[r][1] * z0[1][None]
                + Jp[r][2] * z0[2][None]
            )
            for r in range(2)
        ]

        # --- per-camera rows: rhs | U diag | S blocks ---------------------
        rhs = [J[0, k] * rmj[0] + J[1, k] * rmj[1] for k in range(nk)]
        ud = [J[0, k] * J[0, k] + J[1, k] * J[1, k] for k in range(nk)]
        W = [
            [
                J[0, k] * Jp[0][a] + J[1, k] * Jp[1][a]
                for a in range(3)
            ]
            for k in range(6)
        ]
        VW = [
            (
                va[None] * W[k][0] + vb[None] * W[k][1] + vc[None] * W[k][2],
                vb[None] * W[k][0] + vd[None] * W[k][1] + ve[None] * W[k][2],
                vc[None] * W[k][0] + ve[None] * W[k][1] + vf[None] * W[k][2],
            )
            for k in range(6)
        ]
        blocks = [
            J[0, i] * J[0, j] + J[1, i] * J[1, j]
            - (
                VW[i][0] * W[j][0] + VW[i][1] * W[j][1] + VW[i][2] * W[j][2]
            )
            for (i, j) in tri
        ]

        _tile_scatter(acci, rhs[:6] + ud[:6] + blocks, ii, T, n_ichunks)
        _tile_scatter(accc, rhs[6:] + ud[6:], ci, T, n_cchunks)

        vinv_ref[:] = jnp.stack([va, vb, vc, vd, ve, vf])
        gpt_ref[:] = jnp.stack(g)

        @pl.when(pt == n_pt - 1)
        def _flush():
            outi_ref[:] = acci[:]
            outc_ref[:] = accc[:]

    return kernel


@functools.partial(jax.jit, static_argnames=("Ip", "Cp", "interpret"))
def schur_prepare_bucket(J, res, img_idx, cam_idx, lam, Ip, Cp,
                         interpret=False):
    """One bucket's fused LM preparation. Returns (Vinv [6, P], g_pt [3, P],
    cam_img_t [40, Ip] rows = 6 rhs_pose | 6 U_diag_pose | 21 S_blocks(tri),
    cam_cam_t [pad8(2*NP), Cp] rows = NP rhs_intr | NP U_diag_intr).
    lam: f32 scalar (as [1, 1]). Ip/Cp: 128-multiples (static)."""
    _, nj, T, P = J.shape
    NP = nj - 9
    nc_rows = _round_up(2 * NP, 8)
    n_pt = P // _LANES
    kernel = _make_prepare_kernel(
        T, n_pt, Ip // _LANES, Cp // _LANES, NP
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_pt,),
        in_specs=[
            pl.BlockSpec((2, nj, T, _LANES), lambda p: (0, 0, 0, p)),
            pl.BlockSpec((2, T, _LANES), lambda p: (0, 0, p)),
            pl.BlockSpec((T, _LANES), lambda p: (0, p)),
            pl.BlockSpec((T, _LANES), lambda p: (0, p)),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lam [1, 1]
        ],
        out_specs=[
            pl.BlockSpec((6, _LANES), lambda p: (0, p)),
            pl.BlockSpec((3, _LANES), lambda p: (0, p)),
            pl.BlockSpec((40, Ip), lambda p: (0, 0)),
            pl.BlockSpec((nc_rows, Cp), lambda p: (0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((40, Ip), jnp.float32),
            pltpu.VMEM((nc_rows, Cp), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((6, P), jnp.float32),
            jax.ShapeDtypeStruct((3, P), jnp.float32),
            jax.ShapeDtypeStruct((40, Ip), jnp.float32),
            jax.ShapeDtypeStruct((nc_rows, Cp), jnp.float32),
        ],
        interpret=interpret,
    )(J, res, img_idx, cam_idx, lam)


def schur_prepare(buckets, J_l, res_l, lam, I, C, interpret=None):
    """Fused LM preparation over all buckets.

    Returns (Vinv_l, g_pt_l, rhs_pose [I, 6], rhs_intr [C, NP],
    U_diag_pose [I, 6], U_diag_intr [C, NP], S_blocks [I, 21]) — the exact
    quantities the XLA V/gradient/rhs/precond stages produce (free-mask
    application stays with the caller). NP = J.shape[1] - 9.
    """
    if interpret is None:
        interpret = interpret_default()
    NP = J_l[0].shape[1] - 9
    nc_rows = _round_up(2 * NP, 8)
    Ip = _round_up(I, _LANES)
    Cp = _round_up(C, _LANES)
    lam2 = jnp.reshape(jnp.asarray(lam, jnp.float32), (1, 1))
    Vinv_l, g_pt_l = [], []
    acc_i = jnp.zeros((40, Ip))
    acc_c = jnp.zeros((nc_rows, Cp))
    for b, J, res in zip(buckets, J_l, res_l):
        vinv, gpt, oi, oc = schur_prepare_bucket(
            J, res, b.img_idx, b.cam_idx, lam2, Ip, Cp, interpret=interpret
        )
        Vinv_l.append(vinv)
        g_pt_l.append(gpt)
        acc_i = acc_i + oi
        acc_c = acc_c + oc
    MP = NP
    rhs_pose = acc_i[:6, :I].T
    U_diag_pose = acc_i[6:12, :I].T
    S_blocks = acc_i[12:33, :I].T
    rhs_intr = acc_c[:MP, :C].T
    U_diag_intr = acc_c[MP:2 * MP, :C].T
    return (
        Vinv_l, g_pt_l, rhs_pose, rhs_intr, U_diag_pose, U_diag_intr,
        S_blocks,
    )


def schur_matvec(buckets, J_l, Vinv_l, x_pose, x_intr, I, C,
                 interpret=None):
    """Implicit S x over all buckets via cg_matvec_bucket (no damping/free
    masking — the caller owns those, matching the XLA matvec's contract).

    x_pose [I, 6]; x_intr [C, NP] (NP = J.shape[1] - 9). Returns
    (out_pose [I, 6], out_intr [C, NP]).
    """
    if interpret is None:
        interpret = interpret_default()
    NP = J_l[0].shape[1] - 9
    Ip = _round_up(I, _LANES)
    Cp = _round_up(C, _LANES)
    xp_t = jnp.zeros((8, Ip), jnp.float32).at[:6, :I].set(x_pose.T)
    mp8 = _round_up(NP, 8)
    xi_t = jnp.zeros((mp8, Cp), jnp.float32).at[:NP, :C].set(
        x_intr.T
    )
    out_pose = jnp.zeros((I, 6))
    out_intr = jnp.zeros((C, NP))
    for b, J, Vinv in zip(buckets, J_l, Vinv_l):
        op_t, oi_t = cg_matvec_bucket(
            J, b.img_idx, b.cam_idx, Vinv, xp_t, xi_t, interpret=interpret
        )
        out_pose = out_pose + op_t[:6, :I].T
        out_intr = out_intr + oi_t[:NP, :C].T
    return out_pose, out_intr
