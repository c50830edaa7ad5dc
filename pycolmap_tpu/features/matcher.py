"""Descriptor matching as one MXU matmul + vectorized ratio/cross checks.

TPU-native replacement for the reference's SiftMatcher / FLANN paths
(ref: pipeline/match_features.h:71-99 SiftMatchingOptions; upstream
feature/matcher + sift.cc ComputeSiftDistanceMatrix). Distances follow
COLMAP's convention: angular distance acos(<d1, d2>) between L2-normalized
SIFT descriptors, so max_distance/max_ratio defaults carry over unchanged.

Guided matching (ref: match_features.h guided_matching) masks the distance
matrix with the epipolar/homography residual before re-running the same
argmin pipeline — a dense masked matmul instead of the reference's per-point
loops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pycolmap_tpu.utils.options import BaseOptions, options_dataclass


@options_dataclass
class SiftMatchingOptions(BaseOptions):
    """Defaults mirror the reference (match_features.h:71-99)."""

    max_ratio: float = 0.8
    max_distance: float = 0.7
    cross_check: bool = True
    max_num_matches: int = 32768
    guided_matching: bool = False
    num_threads: int = -1
    use_gpu: bool = True
    gpu_index: str = "-1"


def _pad_rows(a, m):
    n = a.shape[0]
    n_pad = ((n + m - 1) // m) * m
    if n_pad == n:
        return a, n
    pad = np.zeros((n_pad - n,) + a.shape[1:], dtype=a.dtype)
    return np.concatenate([a, pad], axis=0), n


@functools.partial(jax.jit, static_argnames=("cross_check",))
def _match_kernel(d1, d2, n1, n2, max_ratio, max_distance, cross_check):
    """d1 [N1p, 128], d2 [N2p, 128] unit-norm float32; returns match idx per row.

    Output: idx2 [N1p] int32 (-1 = no match).
    """
    sim = jnp.dot(d1, d2.T, preferred_element_type=jnp.float32)  # [N1p, N2p]
    # mask padding
    row_ids = jnp.arange(sim.shape[0])[:, None]
    col_ids = jnp.arange(sim.shape[1])[None, :]
    valid = (row_ids < n1) & (col_ids < n2)
    sim = jnp.where(valid, sim, -2.0)
    dist = jnp.arccos(jnp.clip(sim, -1.0, 1.0))  # angular distance

    top2_sim, top2_idx = jax.lax.top_k(sim, 2)
    best = top2_idx[:, 0]
    best_dist = jnp.arccos(jnp.clip(top2_sim[:, 0], -1.0, 1.0))
    second_dist = jnp.arccos(jnp.clip(top2_sim[:, 1], -1.0, 1.0))

    ok = best_dist <= max_distance
    ok &= best_dist <= max_ratio * second_dist
    if cross_check:
        rev_best = jnp.argmax(sim, axis=0)  # best row for each col
        ok &= rev_best[best] == jnp.arange(sim.shape[0])
    ok &= (jnp.arange(sim.shape[0]) < n1)
    return jnp.where(ok, best, -1)


def match_descriptors(
    descriptors1: np.ndarray,
    descriptors2: np.ndarray,
    options: SiftMatchingOptions = None,
) -> np.ndarray:
    """Brute-force match. descriptors: [N, 128] float (unit norm) or uint8
    (COLMAP 512-scaled). Returns matches [M, 2] uint32.

    On TPU backends the similarity matrix is never materialized: a Pallas
    kernel fuses the MXU matmul with a running top-2 reduction
    (features/pallas_kernels.py); the jnp path is the reference/CPU fallback.
    """
    if options is None:
        options = SiftMatchingOptions()
    d1 = _to_unit_float(descriptors1)
    d2 = _to_unit_float(descriptors2)
    if len(d1) == 0 or len(d2) == 0:
        return np.zeros((0, 2), dtype=np.uint32)
    d1p, n1 = _pad_rows(d1, 256)
    d2p, n2 = _pad_rows(d2, 256)

    from pycolmap_tpu.features import pallas_kernels as pk

    if pk.use_pallas():
        best, second, idx = pk.match_top2(d1p, d2p, n1, n2)
        best_dist = np.arccos(np.clip(best, -1.0, 1.0))
        second_dist = np.arccos(np.clip(second, -1.0, 1.0))
        ok = (best > -1.5) & (best_dist <= options.max_distance)
        ok &= best_dist <= options.max_ratio * second_dist
        if options.cross_check:
            _, _, rev_idx = pk.match_top2(d2p, d1p, n2, n1)
            safe_idx = np.clip(idx, 0, n2 - 1)
            ok &= rev_idx[safe_idx] == np.arange(n1)
        idx2 = np.where(ok, idx, -1)
    else:
        idx2 = np.asarray(
            _match_kernel(
                jnp.asarray(d1p), jnp.asarray(d2p), n1, n2,
                jnp.float32(options.max_ratio), jnp.float32(options.max_distance),
                options.cross_check,
            )
        )[:n1]
    rows = np.nonzero(idx2 >= 0)[0]
    matches = np.stack([rows, idx2[rows]], axis=1).astype(np.uint32)
    if len(matches) > options.max_num_matches:
        matches = matches[: options.max_num_matches]
    return matches


_batch_match_kernel = jax.jit(
    jax.vmap(_match_kernel, in_axes=(0, 0, 0, 0, None, None, None)),
    static_argnames=("cross_check",),
)


def match_descriptors_batch(pairs, options: SiftMatchingOptions = None):
    """Match a BLOCK of descriptor pairs in one device program per shape
    bucket (SURVEY §2c P1: per-pair calls pay 10-25 ms tunnel dispatch each).

    pairs: list of (descriptors1, descriptors2). Returns a list of matches
    [M, 2] uint32 aligned with the input. Pairs are grouped by pow2-padded
    (N1, N2) buckets; each bucket is one batched call (two with
    cross-check on the Pallas path).
    """
    from collections import defaultdict

    from pycolmap_tpu.features import pallas_kernels as pk

    if options is None:
        options = SiftMatchingOptions()
    out = [np.zeros((0, 2), dtype=np.uint32)] * len(pairs)
    prepared = []
    for i, (a, b) in enumerate(pairs):
        d1 = _to_unit_float(a)
        d2 = _to_unit_float(b)
        if len(d1) == 0 or len(d2) == 0:
            continue
        n1p = max(256, 1 << (len(d1) - 1).bit_length())
        n2p = max(256, 1 << (len(d2) - 1).bit_length())
        prepared.append((i, d1, d2, n1p, n2p))
    groups = defaultdict(list)
    for item in prepared:
        groups[(item[3], item[4])].append(item)

    use_pk = pk.use_pallas()
    for (n1p, n2p), items in groups.items():
        B = len(items)
        D1 = np.zeros((B, n1p, 128), np.float32)
        D2 = np.zeros((B, n2p, 128), np.float32)
        n1s = np.zeros(B, np.int32)
        n2s = np.zeros(B, np.int32)
        for k, (_i, d1, d2, _a, _b) in enumerate(items):
            D1[k, : len(d1)] = d1
            D2[k, : len(d2)] = d2
            n1s[k] = len(d1)
            n2s[k] = len(d2)
        if use_pk:
            best, second, idx = (
                np.asarray(x)
                for x in pk.pallas_top2_batch(
                    jnp.asarray(D1), jnp.asarray(D2), jnp.asarray(n2s)
                )
            )
            best_dist = np.arccos(np.clip(best, -1.0, 1.0))
            second_dist = np.arccos(np.clip(second, -1.0, 1.0))
            ok = (best > -1.5) & (best_dist <= options.max_distance)
            ok &= best_dist <= options.max_ratio * second_dist
            if options.cross_check:
                _, _, rev_idx = (
                    np.asarray(x)
                    for x in pk.pallas_top2_batch(
                        jnp.asarray(D2), jnp.asarray(D1), jnp.asarray(n1s)
                    )
                )
                safe = np.clip(idx, 0, n2p - 1)
                ok &= (
                    np.take_along_axis(rev_idx, safe, axis=1)
                    == np.arange(n1p)[None, :]
                )
            ok &= np.arange(n1p)[None, :] < n1s[:, None]
            idx2_all = np.where(ok, idx, -1)
        else:
            idx2_all = np.asarray(
                _batch_match_kernel(
                    jnp.asarray(D1), jnp.asarray(D2),
                    jnp.asarray(n1s), jnp.asarray(n2s),
                    jnp.float32(options.max_ratio),
                    jnp.float32(options.max_distance),
                    options.cross_check,
                )
            )
        for k, (i, d1, _d2, _a, _b) in enumerate(items):
            idx2 = idx2_all[k, : len(d1)]
            rows = np.nonzero(idx2 >= 0)[0]
            matches = np.stack([rows, idx2[rows]], axis=1).astype(np.uint32)
            if len(matches) > options.max_num_matches:
                matches = matches[: options.max_num_matches]
            out[i] = matches
    return out


def _to_unit_float(desc) -> np.ndarray:
    desc = np.asarray(desc)
    if desc.dtype == np.uint8:
        desc = desc.astype(np.float32) / 512.0
    desc = desc.astype(np.float32)
    norms = np.linalg.norm(desc, axis=1, keepdims=True)
    return desc / np.maximum(norms, 1e-12)


@functools.partial(jax.jit, static_argnames=("cross_check", "model"))
def _guided_match_kernel(
    d1, d2, x1, x2, G, n1, n2, max_ratio, max_distance, max_residual,
    cross_check, model,
):
    """Distance matrix masked by two-view geometry residual, then matched.

    model: 'epipolar' (G = E or F; squared Sampson) or 'homography'
    (G = H; squared transfer error). x1/x2 padded like d1/d2.
    """
    sim = jnp.dot(d1, d2.T, preferred_element_type=jnp.float32)
    ones1 = jnp.ones_like(x1[:, :1])
    ones2 = jnp.ones_like(x2[:, :1])
    p1 = jnp.concatenate([x1, ones1], axis=1)  # [N1p, 3]
    p2 = jnp.concatenate([x2, ones2], axis=1)
    if model == "epipolar":
        Gp1 = p1 @ G.T  # [N1p, 3] = (G x1)
        Gtp2 = p2 @ G  # [N2p, 3] = (G^T x2)
        num = (p2 @ (G @ p1.T)) ** 2  # [N2p, N1p]
        num = num.T  # [N1p, N2p]
        den = (
            Gp1[:, 0:1] ** 2 + Gp1[:, 1:2] ** 2
            + (Gtp2[:, 0:1] ** 2 + Gtp2[:, 1:2] ** 2).T
        )
        residual = num / jnp.maximum(den, 1e-12)
    else:
        Hp1 = p1 @ G.T  # [N1p, 3]
        w = Hp1[:, 2:3]
        w_safe = jnp.where(jnp.abs(w) < 1e-8, 1.0, w)
        proj = Hp1[:, :2] / w_safe
        dx = proj[:, 0:1] - x2[None, :, 0].reshape(1, -1)
        dy = proj[:, 1:2] - x2[None, :, 1].reshape(1, -1)
        residual = dx * dx + dy * dy

    sim = jnp.where(residual <= max_residual, sim, -2.0)
    row_ids = jnp.arange(sim.shape[0])[:, None]
    col_ids = jnp.arange(sim.shape[1])[None, :]
    sim = jnp.where((row_ids < n1) & (col_ids < n2), sim, -2.0)

    top2_sim, top2_idx = jax.lax.top_k(sim, 2)
    best = top2_idx[:, 0]
    best_dist = jnp.arccos(jnp.clip(top2_sim[:, 0], -1.0, 1.0))
    second_dist = jnp.arccos(jnp.clip(top2_sim[:, 1], -1.0, 1.0))
    ok = (top2_sim[:, 0] > -1.5) & (best_dist <= max_distance)
    ok &= best_dist <= max_ratio * second_dist
    if cross_check:
        rev_best = jnp.argmax(sim, axis=0)
        ok &= rev_best[best] == jnp.arange(sim.shape[0])
    ok &= (jnp.arange(sim.shape[0]) < n1)
    return jnp.where(ok, best, -1)


def match_guided(
    descriptors1, descriptors2, points2D1, points2D2, two_view_geometry,
    options: SiftMatchingOptions = None, max_error: float = 4.0,
):
    """Guided matching constrained by an estimated two-view geometry.

    Uses F (pixel-space Sampson) or H (pixel transfer) depending on the
    geometry's config (upstream SiftMatchGuided).
    """
    from pycolmap_tpu.estimators.two_view_geometry import (
        TwoViewGeometryConfiguration as C,
    )

    if options is None:
        options = SiftMatchingOptions()
    d1 = _to_unit_float(descriptors1)
    d2 = _to_unit_float(descriptors2)
    x1 = np.asarray(points2D1, dtype=np.float32).reshape(-1, 2)
    x2 = np.asarray(points2D2, dtype=np.float32).reshape(-1, 2)
    cfg = two_view_geometry.config
    if cfg in (int(C.PLANAR), int(C.PANORAMIC), int(C.PLANAR_OR_PANORAMIC)):
        G = two_view_geometry.H
        model = "homography"
    else:
        G = two_view_geometry.F if two_view_geometry.F is not None else two_view_geometry.E
        model = "epipolar"
    if G is None:
        return match_descriptors(descriptors1, descriptors2, options)
    d1p, n1 = _pad_rows(d1, 256)
    d2p, n2 = _pad_rows(d2, 256)
    x1p, _ = _pad_rows(x1, 256)
    x2p, _ = _pad_rows(x2, 256)
    idx2 = np.asarray(
        _guided_match_kernel(
            jnp.asarray(d1p), jnp.asarray(d2p),
            jnp.asarray(x1p), jnp.asarray(x2p),
            jnp.asarray(G, dtype=jnp.float32), n1, n2,
            jnp.float32(options.max_ratio), jnp.float32(options.max_distance),
            jnp.float32(max_error**2), options.cross_check, model,
        )
    )[:n1]
    rows = np.nonzero(idx2 >= 0)[0]
    return np.stack([rows, idx2[rows]], axis=1).astype(np.uint32)
