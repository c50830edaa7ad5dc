"""Fused Pallas Schur-CG matvec vs a dense numpy reference (interpret mode)."""

import numpy as np
import jax.numpy as jnp

from pycolmap_tpu.ops.camera_models import MAX_PARAMS
from pycolmap_tpu.sfm import cg_kernel as ck


def _reference(J, img_idx, cam_idx, Vinv, x_pose, x_intr):
    nk = 6 + MAX_PARAMS
    T, P = img_idx.shape
    xc = np.concatenate(
        [
            x_pose[img_idx].transpose(2, 0, 1),  # [6, T, P]
            x_intr[cam_idx].transpose(2, 0, 1),  # [MP, T, P]
        ]
    )
    a = np.einsum("rkts,kts->rts", J[:, :nk], xc)  # [2, T, P]
    y = np.einsum("rats,rts->as", J[:, nk:nk + 3], a)  # [3, P]
    va, vb, vc, vd, ve, vf = Vinv
    z = np.stack(
        [
            va * y[0] + vb * y[1] + vc * y[2],
            vb * y[0] + vd * y[1] + ve * y[2],
            vc * y[0] + ve * y[1] + vf * y[2],
        ]
    )
    d = a - np.einsum("rats,as->rts", J[:, nk:nk + 3], z)
    val = np.einsum("rkts,rts->kts", J[:, :nk], d)  # [nk, T, P]
    out_pose = np.zeros((x_pose.shape[0], 6))
    out_intr = np.zeros((x_intr.shape[0], MAX_PARAMS))
    for t in range(T):
        for p in range(P):
            out_pose[img_idx[t, p]] += val[:6, t, p]
            out_intr[cam_idx[t, p]] += val[6:, t, p]
    return out_pose, out_intr


class _Bucket:
    def __init__(self, img_idx, cam_idx):
        self.img_idx = jnp.asarray(img_idx)
        self.cam_idx = jnp.asarray(cam_idx)


def _run_case(T, P, I, C, seed=0, mask_frac=0.3):
    rng = np.random.default_rng(seed)
    J = rng.normal(size=(2, 21, T, P)).astype(np.float32)
    mask = (rng.uniform(size=(T, P)) > mask_frac).astype(np.float32)
    J *= mask[None, None]
    img_idx = rng.integers(0, I, (T, P)).astype(np.int32)
    cam_idx = rng.integers(0, C, (T, P)).astype(np.int32)
    Vinv = rng.normal(size=(6, P)).astype(np.float32)
    x_pose = rng.normal(size=(I, 6)).astype(np.float32)
    x_intr = rng.normal(size=(C, MAX_PARAMS)).astype(np.float32)

    ref_p, ref_i = _reference(J, img_idx, cam_idx, Vinv, x_pose, x_intr)
    out_p, out_i = ck.schur_matvec(
        [_Bucket(img_idx, cam_idx)], [jnp.asarray(J)], [jnp.asarray(Vinv)],
        jnp.asarray(x_pose), jnp.asarray(x_intr), I, C, interpret=True,
    )
    scale = max(np.abs(ref_p).max(), np.abs(ref_i).max(), 1.0)
    np.testing.assert_allclose(
        np.asarray(out_p) / scale, ref_p / scale, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_i) / scale, ref_i / scale, atol=2e-5
    )


def test_cg_matvec_single_tile():
    _run_case(T=8, P=128, I=5, C=1)


def test_cg_matvec_multi_tile_multi_cam():
    _run_case(T=8, P=512, I=60, C=3, seed=1)


def test_cg_matvec_tall_track_bucket():
    _run_case(T=32, P=256, I=20, C=2, seed=2)


def test_cg_matvec_many_images_chunked():
    # I > 128 exercises the multi-chunk gather/scatter path
    _run_case(T=4, P=256, I=200, C=130, seed=3)


def _prepare_reference(J, res, img_idx, cam_idx, lam, I, C):
    """Numpy mirror of ba_kernels' V/gradient/rhs/precond stages."""
    nk = 6 + MAX_PARAMS
    T, P = img_idx.shape
    Jp = J[:, nk:nk + 3]  # [2, 3, T, P]
    pairs = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
    V = np.stack(
        [np.sum(Jp[:, i] * Jp[:, j], axis=(0, 1)) for i, j in pairs]
    )
    for k, di in ((0, 0), (3, 1), (5, 2)):
        V[k] += lam * np.maximum(V[k], 1e-6)
    a, b, c, d, e, f = V
    A = d * f - e * e
    B = c * e - b * f
    Cc = b * e - c * d
    det = a * A + b * B + c * Cc
    det = np.where(np.abs(det) < 1e-12, 1e-12, det)
    Vinv = np.stack(
        [A, B, Cc, a * f - c * c, b * c - a * e, a * d - b * b]
    ) / det
    g_pt = np.einsum("rats,rts->as", Jp, res)
    va, vb, vc, vd, ve, vf = Vinv
    z0 = np.stack(
        [
            va * g_pt[0] + vb * g_pt[1] + vc * g_pt[2],
            vb * g_pt[0] + vd * g_pt[1] + ve * g_pt[2],
            vc * g_pt[0] + ve * g_pt[1] + vf * g_pt[2],
        ]
    )
    rmj = res - np.einsum("rats,as->rts", Jp, z0)
    rhs_obs = np.einsum("rkts,rts->kts", J[:, :nk], rmj)
    ud_obs = np.sum(J[:, :nk] ** 2, axis=0)  # [nk, T, P]
    W = np.einsum("rkts,rats->kats", J[:, :6], Jp)  # [6, 3, T, P]
    VW = np.stack(
        [
            va * W[:, 0] + vb * W[:, 1] + vc * W[:, 2],
            vb * W[:, 0] + vd * W[:, 1] + ve * W[:, 2],
            vc * W[:, 0] + ve * W[:, 1] + vf * W[:, 2],
        ],
        axis=1,
    )
    tri = [(i, j) for i in range(6) for j in range(i, 6)]
    blocks = np.stack(
        [
            np.sum(J[:, i] * J[:, j], axis=0)
            - np.sum(VW[i] * W[j], axis=0)
            for (i, j) in tri
        ]
    )
    rhs_pose = np.zeros((I, 6))
    rhs_intr = np.zeros((C, MAX_PARAMS))
    udp = np.zeros((I, 6))
    udi = np.zeros((C, MAX_PARAMS))
    S = np.zeros((I, 21))
    for t in range(T):
        for p in range(P):
            i, cc = img_idx[t, p], cam_idx[t, p]
            rhs_pose[i] += rhs_obs[:6, t, p]
            rhs_intr[cc] += rhs_obs[6:, t, p]
            udp[i] += ud_obs[:6, t, p]
            udi[cc] += ud_obs[6:, t, p]
            S[i] += blocks[:, t, p]
    return Vinv, g_pt, rhs_pose, rhs_intr, udp, udi, S


def test_schur_prepare_matches_reference():
    rng = np.random.default_rng(7)
    T, P, I, C = 8, 256, 11, 2
    lam = 0.37
    J = rng.normal(size=(2, 21, T, P)).astype(np.float32)
    mask = (rng.uniform(size=(T, P)) > 0.25).astype(np.float32)
    J *= mask[None, None]
    res = (rng.normal(size=(2, T, P)) * mask[None]).astype(np.float32)
    img_idx = rng.integers(0, I, (T, P)).astype(np.int32)
    cam_idx = rng.integers(0, C, (T, P)).astype(np.int32)

    refs = _prepare_reference(J, res, img_idx, cam_idx, lam, I, C)
    (Vinv_l, g_pt_l, rhs_pose, rhs_intr, udp, udi, S) = ck.schur_prepare(
        [_Bucket(img_idx, cam_idx)], [jnp.asarray(J)], [jnp.asarray(res)],
        jnp.float32(lam), I, C, interpret=True,
    )
    outs = (
        np.asarray(Vinv_l[0]), np.asarray(g_pt_l[0]), np.asarray(rhs_pose),
        np.asarray(rhs_intr), np.asarray(udp), np.asarray(udi),
        np.asarray(S),
    )
    for got, ref in zip(outs, refs):
        scale = max(np.abs(ref).max(), 1.0)
        np.testing.assert_allclose(got / scale, ref / scale, atol=3e-5)


def test_cg_matvec_multi_bucket_sum():
    rng = np.random.default_rng(4)
    I, C = 9, 2
    bs, Js, Vs = [], [], []
    refs_p = np.zeros((I, 6))
    refs_i = np.zeros((C, MAX_PARAMS))
    x_pose = rng.normal(size=(I, 6)).astype(np.float32)
    x_intr = rng.normal(size=(C, MAX_PARAMS)).astype(np.float32)
    for T, P in ((4, 128), (8, 256)):
        J = rng.normal(size=(2, 21, T, P)).astype(np.float32)
        ii = rng.integers(0, I, (T, P)).astype(np.int32)
        ci = rng.integers(0, C, (T, P)).astype(np.int32)
        Vinv = rng.normal(size=(6, P)).astype(np.float32)
        rp, ri = _reference(J, ii, ci, Vinv, x_pose, x_intr)
        refs_p += rp
        refs_i += ri
        bs.append(_Bucket(ii, ci))
        Js.append(jnp.asarray(J))
        Vs.append(jnp.asarray(Vinv))
    out_p, out_i = ck.schur_matvec(
        bs, Js, Vs, jnp.asarray(x_pose), jnp.asarray(x_intr), I, C,
        interpret=True,
    )
    scale = max(np.abs(refs_p).max(), 1.0)
    np.testing.assert_allclose(
        np.asarray(out_p) / scale, refs_p / scale, atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_i) / scale, refs_i / scale, atol=3e-5
    )


def test_cg_matvec_bf16_packed_matches_f32():
    """bf16-packed matvec == f32 matvec to bf16 storage tolerance."""
    rng = np.random.default_rng(11)
    T, P, I, C = 8, 256, 12, 2
    NP = 4
    nj = 9 + NP
    J = rng.normal(size=(2, nj, T, P)).astype(np.float32)
    mask = (rng.uniform(size=(T, P)) > 0.3).astype(np.float32)
    J *= mask[None, None]
    img_idx = rng.integers(0, I, (T, P)).astype(np.int32)
    cam_idx = rng.integers(0, C, (T, P)).astype(np.int32)
    Vinv = rng.normal(size=(6, P)).astype(np.float32)
    x_pose = rng.normal(size=(I, 6)).astype(np.float32)
    x_intr = rng.normal(size=(C, NP)).astype(np.float32)

    ref_p, ref_i = ck.schur_matvec(
        [_Bucket(img_idx, cam_idx)], [jnp.asarray(J)], [jnp.asarray(Vinv)],
        jnp.asarray(x_pose), jnp.asarray(x_intr), I, C, interpret=True,
    )
    J16 = ck.pack_j_bf16(jnp.asarray(J))
    out_p, out_i = ck.schur_matvec16(
        [_Bucket(img_idx, cam_idx)], [J16], [jnp.asarray(Vinv)],
        jnp.asarray(x_pose), jnp.asarray(x_intr), I, C, interpret=True,
    )
    scale = max(np.abs(np.asarray(ref_p)).max(),
                np.abs(np.asarray(ref_i)).max(), 1.0)
    # bf16 storage of J -> ~8e-3 relative on the quadratic form
    np.testing.assert_allclose(
        np.asarray(out_p) / scale, np.asarray(ref_p) / scale, atol=3e-2
    )
    np.testing.assert_allclose(
        np.asarray(out_i) / scale, np.asarray(ref_i) / scale, atol=3e-2
    )
