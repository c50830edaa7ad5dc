"""Pair-parallel two-view verification (SURVEY.md §2c P1).

One compiled program estimates E, F and H for a whole block of image pairs
at once: hypotheses for every pair × every model are generated and scored as
single tensors (vmap over the pair axis on top of the batched LORANSAC
math). The per-pair host path (estimators/two_view_geometry.py) remains the
reference semantics — including COLMAP's adaptive trial counts; this batch
path trades the adaptive loop for a fixed hypothesis budget, which at TPU
batch sizes dominates the adaptive count anyway.

Used by pipeline/match_features when enough pairs are pending; falls back to
the per-pair path for stragglers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pycolmap_tpu.estimators.ransac import RANSACOptions
from pycolmap_tpu.estimators.two_view_geometry import (
    TwoViewGeometry,
    TwoViewGeometryConfiguration,
    TwoViewGeometryOptions,
    _detect_watermark,
)
from pycolmap_tpu.ops import solvers

NUM_CHUNK = 1024  # hypotheses per model per pair
NUM_E_SAMPLES = 128  # 5pt minimal samples per pair (each yields <= 10 E's)


def _sample_idx(key, B, n, m, mask, k=NUM_CHUNK):
    u = jax.random.uniform(key, (B, k, n)) + (1.0 - mask[:, None, :]) * 1e6
    _, idx = jax.lax.top_k(-u, m)
    return idx  # [B, k, m]


def _score(residuals, mask, thr_sq):
    """residuals [B, K, N] -> (num_inliers [B,K], capped [B,K])."""
    r = jnp.where(mask[:, None, :] > 0, residuals, jnp.inf)
    inl = r <= thr_sq
    return jnp.sum(inl, axis=-1), jnp.sum(jnp.minimum(r, thr_sq), axis=-1)


def _pick_best(num_inl, capped, models):
    """Best hypothesis per pair. models: [B, K, ...]."""
    score = jnp.where(
        jnp.isfinite(capped), num_inl.astype(jnp.float32) - capped / (capped + 1.0),
        -jnp.inf,
    )
    best = jnp.argmax(score, axis=1)  # [B]
    take = lambda a: jnp.take_along_axis(
        a, best.reshape((-1,) + (1,) * (a.ndim - 1)), axis=1
    )[:, 0]
    return take(models), take(num_inl), best


def _sampson(F, x1, x2):
    """F [B, K, 3, 3]; x [B, N, 2] -> [B, K, N]."""
    ones = jnp.ones_like(x1[..., :1])
    p1 = jnp.concatenate([x1, ones], axis=-1)
    p2 = jnp.concatenate([x2, ones], axis=-1)
    Fx1 = jnp.einsum("bkij,bnj->bkni", F, p1)
    Ftx2 = jnp.einsum("bkji,bnj->bkni", F, p2)
    x2Fx1 = jnp.einsum("bni,bkni->bkn", p2, Fx1)
    den = Fx1[..., 0] ** 2 + Fx1[..., 1] ** 2 + Ftx2[..., 0] ** 2 + Ftx2[..., 1] ** 2
    return x2Fx1**2 / jnp.maximum(den, 1e-12)


def _transfer(H, x1, x2):
    ones = jnp.ones_like(x1[..., :1])
    p1 = jnp.concatenate([x1, ones], axis=-1)
    Hx1 = jnp.einsum("bkij,bnj->bkni", H, p1)
    w = Hx1[..., 2]
    bad = jnp.abs(w) < 1e-8
    w_safe = jnp.where(bad, 1.0, w)
    proj = Hx1[..., :2] / w_safe[..., None]
    err = jnp.sum((proj - x2[:, None]) ** 2, axis=-1)
    return jnp.where(bad, 1e12, err)


@functools.partial(jax.jit, static_argnames=())
def _verify_block_kernel(
    key, x1_px, x2_px, x1_n, x2_n, mask, thr_px_sq, thr_norm_sq
):
    """x*_px pixel coords [B, N, 2]; x*_n normalized; mask [B, N].

    Returns per-pair best (E, F, H, inlier counts, inlier masks).
    """
    B, N, _ = x1_px.shape
    kE, kF, kH = jax.random.split(key, 3)

    def per_pair_gather(x, idx):
        # x [B, N, 2], idx [B, K, m] -> [B, K, m, 2]
        return jax.vmap(lambda xb, ib: xb[ib])(x, idx)

    # --- F: 8pt hypotheses on pixel coords ------------------------------
    idxF = _sample_idx(kF, B, N, 8, mask)
    sF1 = per_pair_gather(x1_px, idxF)  # [B, K, 8, 2]
    sF2 = per_pair_gather(x2_px, idxF)
    F_h = solvers.fundamental_8pt(sF1, sF2)  # [B, K, 3, 3]
    rF = _sampson(F_h, x1_px, x2_px)
    niF, capF = _score(rF, mask, thr_px_sq)
    F_best, F_ninl, bF = _pick_best(niF, capF, F_h)
    rF_best = jnp.take_along_axis(rF, bF[:, None, None], axis=1)[:, 0]
    F_inl = (rF_best <= thr_px_sq) & (mask > 0)
    # LO refit on inliers
    F_refit = solvers.fundamental_8pt(x1_px, x2_px, F_inl.astype(jnp.float32))
    rFr = _sampson(F_refit[:, None], x1_px, x2_px)[:, 0]
    niFr = jnp.sum((rFr <= thr_px_sq) & (mask > 0), axis=-1)
    use_r = niFr >= F_ninl
    F_best = jnp.where(use_r[:, None, None], F_refit, F_best)
    F_inl = jnp.where(use_r[:, None], (rFr <= thr_px_sq) & (mask > 0), F_inl)
    F_ninl = jnp.maximum(niFr, F_ninl)

    # --- E: Nistér 5pt minimal hypotheses on normalized coords ----------
    # (parity with the reference's LORANSAC minimal solver,
    # estimators/essential_matrix.h:48-52; each 5pt sample yields up to 10
    # essential matrices, invalid roots are masked out of scoring)
    idxE = _sample_idx(kE, B, N, 5, mask, k=NUM_E_SAMPLES)
    sE1 = per_pair_gather(x1_n, idxE)  # [B, K5, 5, 2]
    sE2 = per_pair_gather(x2_n, idxE)
    E_h, E_valid = solvers.essential_5pt(
        sE1.reshape(B * NUM_E_SAMPLES, 5, 2),
        sE2.reshape(B * NUM_E_SAMPLES, 5, 2),
    )
    E_h = E_h.reshape(B, NUM_E_SAMPLES * 10, 3, 3)
    E_valid = E_valid.reshape(B, NUM_E_SAMPLES * 10)
    rE = _sampson(E_h, x1_n, x2_n)
    rE = jnp.where(E_valid[:, :, None], rE, jnp.inf)
    niE, capE = _score(rE, mask, thr_norm_sq)
    E_best, E_ninl, bE = _pick_best(niE, capE, E_h)
    rE_best = jnp.take_along_axis(rE, bE[:, None, None], axis=1)[:, 0]
    E_inl = (rE_best <= thr_norm_sq) & (mask > 0)
    E_refit = solvers.essential_8pt(x1_n, x2_n, E_inl.astype(jnp.float32))
    rEr = _sampson(E_refit[:, None], x1_n, x2_n)[:, 0]
    niEr = jnp.sum((rEr <= thr_norm_sq) & (mask > 0), axis=-1)
    use_r = niEr >= E_ninl
    E_best = jnp.where(use_r[:, None, None], E_refit, E_best)
    E_inl = jnp.where(use_r[:, None], (rEr <= thr_norm_sq) & (mask > 0), E_inl)
    E_ninl = jnp.maximum(niEr, E_ninl)

    # --- H: 4pt hypotheses on pixel coords ------------------------------
    idxH = _sample_idx(kH, B, N, 4, mask)
    sH1 = per_pair_gather(x1_px, idxH)
    sH2 = per_pair_gather(x2_px, idxH)
    H_h = solvers.homography_dlt(sH1, sH2)
    rH = _transfer(H_h, x1_px, x2_px)
    niH, capH = _score(rH, mask, thr_px_sq)
    H_best, H_ninl, bH = _pick_best(niH, capH, H_h)
    rH_best = jnp.take_along_axis(rH, bH[:, None, None], axis=1)[:, 0]
    H_inl = (rH_best <= thr_px_sq) & (mask > 0)
    H_refit = solvers.homography_dlt(x1_px, x2_px, H_inl.astype(jnp.float32))
    rHr = _transfer(H_refit[:, None], x1_px, x2_px)[:, 0]
    niHr = jnp.sum((rHr <= thr_px_sq) & (mask > 0), axis=-1)
    use_r = niHr >= H_ninl
    H_best = jnp.where(use_r[:, None, None], H_refit, H_best)
    H_inl = jnp.where(use_r[:, None], (rHr <= thr_px_sq) & (mask > 0), H_inl)
    H_ninl = jnp.maximum(niHr, H_ninl)

    return (E_best, E_ninl, E_inl, F_best, F_ninl, F_inl, H_best, H_ninl, H_inl)


def verify_pairs_batch(
    pair_data, options: TwoViewGeometryOptions = None
):
    """Verify a block of pairs in one device program.

    pair_data: list of dicts with keys x1_px, x2_px (pixel coords of the
    matched keypoints), cam1, cam2, matches (for inlier index mapping).
    Returns a list of TwoViewGeometry.
    """
    if options is None:
        options = TwoViewGeometryOptions()
    B_real = len(pair_data)
    if B_real == 0:
        return []
    # pad the pair count to a pow2 ladder: B is a compiled shape, and the
    # last flush of a matching run otherwise presents an arbitrary
    # remainder (measured r5: a 13-pair final block cost a fresh ~minutes
    # remote compile). Dummy pairs have zero valid rows -> DEGENERATE.
    B = 1 << (B_real - 1).bit_length()
    pair_data = list(pair_data) + [
        {
            "x1_px": np.zeros((0, 2), np.float32),
            "x2_px": np.zeros((0, 2), np.float32),
            "cam1": pair_data[0]["cam1"],
            "cam2": pair_data[0]["cam2"],
            "matches": np.zeros((0, 2), np.uint32),
        }
        for _ in range(B - B_real)
    ]
    N = max(max(len(p["x1_px"]) for p in pair_data), 16)
    N = 1 << (N - 1).bit_length()
    x1_px = np.zeros((B, N, 2), dtype=np.float32)
    x2_px = np.zeros((B, N, 2), dtype=np.float32)
    x1_n = np.zeros((B, N, 2), dtype=np.float32)
    x2_n = np.zeros((B, N, 2), dtype=np.float32)
    mask = np.zeros((B, N), dtype=np.float32)
    thr_norm = np.zeros(B, dtype=np.float32)
    for b, p in enumerate(pair_data):
        n = len(p["x1_px"])
        x1_px[b, :n] = p["x1_px"]
        x2_px[b, :n] = p["x2_px"]
        x1_n[b, :n] = p["cam1"].cam_from_img(p["x1_px"])
        x2_n[b, :n] = p["cam2"].cam_from_img(p["x2_px"])
        mask[b, :n] = 1.0
        thr_norm[b] = 0.5 * (
            options.ransac.max_error / p["cam1"].mean_focal_length()
            + options.ransac.max_error / p["cam2"].mean_focal_length()
        )
    # single normalized threshold per block (max keeps behavior permissive;
    # per-pair thresholds would need a [B] thr tensor — done via mean here)
    thr_norm_sq = float(np.mean(thr_norm[:B_real]) ** 2)

    import sys as _sys

    from pycolmap_tpu.ops import epipolar as _ep
    from pycolmap_tpu.ops import solvers as _sv
    from pycolmap_tpu.utils import aot_cache

    (E, E_ninl, E_inl, F, F_ninl, F_inl, H, H_ninl, H_inl) = [
        np.asarray(a)
        for a in aot_cache.cached_call(
            _verify_block_kernel, "two_view_block",
            aot_cache.source_salt(_sys.modules[__name__], _sv, _ep), {},
            jax.random.PRNGKey(0),
            jnp.asarray(x1_px), jnp.asarray(x2_px),
            jnp.asarray(x1_n), jnp.asarray(x2_n), jnp.asarray(mask),
            jnp.float32(options.ransac.max_error**2), jnp.float32(thr_norm_sq),
        )
    ]

    out = []
    C = TwoViewGeometryConfiguration
    pair_data = pair_data[:B_real]  # drop the shape-padding dummies
    for b, p in enumerate(pair_data):
        n = len(p["x1_px"])
        g = TwoViewGeometry()
        e_n, f_n, h_n = int(E_ninl[b]), int(F_ninl[b]), int(H_ninl[b])
        if max(e_n, f_n, h_n) < options.min_num_inliers:
            g.config = int(C.DEGENERATE)
            out.append(g)
            continue
        best_inl = max(e_n, f_n)
        if e_n >= options.min_num_inliers and e_n >= options.min_E_F_inlier_ratio * f_n:
            g.config = int(C.CALIBRATED)
            mask_b = E_inl[b, :n]
        elif f_n >= options.min_num_inliers:
            g.config = int(C.UNCALIBRATED)
            mask_b = F_inl[b, :n]
        else:
            g.config = int(C.PLANAR_OR_PANORAMIC)
            mask_b = H_inl[b, :n]
        if (
            g.config in (int(C.CALIBRATED), int(C.UNCALIBRATED))
            and h_n > options.max_H_inlier_ratio * best_inl
        ):
            g.config = int(C.PLANAR_OR_PANORAMIC)
        g.E = E[b].astype(np.float64)
        g.F = F[b].astype(np.float64)
        g.H = H[b].astype(np.float64)
        if options.detect_watermark and _detect_watermark(
            p["x1_px"], p["x2_px"], mask_b, p["cam1"], p["cam2"], options
        ):
            g.config = int(C.WATERMARK)
        g.inlier_matches = p["matches"][mask_b].astype(np.uint32)
        if options.compute_relative_pose and g.config not in (
            int(C.DEGENERATE), int(C.UNDEFINED), int(C.WATERMARK)
        ):
            # recover cam2_from_cam1 (ref two_view_geometry.h:153-160).
            # estimate_two_view_geometry_pose indexes full keypoint arrays
            # via inlier_matches; here we only hold the MATCHED coords, so
            # hand it block-local indices and copy the pose back
            from pycolmap_tpu.estimators.two_view_geometry import (
                estimate_two_view_geometry_pose,
            )

            idx = np.nonzero(mask_b)[0].astype(np.uint32)
            g_tmp = TwoViewGeometry()
            g_tmp.config = g.config
            g_tmp.E, g_tmp.F, g_tmp.H = g.E, g.F, g.H
            g_tmp.inlier_matches = np.stack([idx, idx], axis=1)
            if estimate_two_view_geometry_pose(
                p["cam1"], p["x1_px"], p["cam2"], p["x2_px"], g_tmp
            ):
                g.cam2_from_cam1 = g_tmp.cam2_from_cam1
                g.tri_angle = getattr(g_tmp, "tri_angle", 0.0)
                g.config = g_tmp.config
        out.append(g)
    return out
