"""Pair-parallel verification agrees with the per-pair reference path."""

import numpy as np
import pytest

from pycolmap_tpu.estimators.batch_two_view import verify_pairs_batch
from pycolmap_tpu.estimators.two_view_geometry import (
    TwoViewGeometryConfiguration,
    TwoViewGeometryOptions,
    estimate_calibrated_two_view_geometry,
)

from test_estimators import synth_two_view


def test_batch_matches_per_pair():
    options = TwoViewGeometryOptions()
    pair_data = []
    per_pair = []
    for seed in range(5):
        cam, x1, x2, rel, gt = synth_two_view(
            n=150, outlier_ratio=0.25, seed=seed
        )
        matches = np.stack([np.arange(len(x1))] * 2, axis=1).astype(np.uint32)
        pair_data.append(
            {
                "x1_px": x1, "x2_px": x2, "cam1": cam, "cam2": cam,
                "matches": matches,
            }
        )
        per_pair.append(
            estimate_calibrated_two_view_geometry(
                cam, x1, cam, x2, matches, options
            )
        )
    batch = verify_pairs_batch(pair_data, options)
    assert len(batch) == 5
    for g_b, g_p, (_, _, _, _, gt) in zip(
        batch, per_pair, [synth_two_view(n=150, outlier_ratio=0.25, seed=s) for s in range(5)]
    ):
        # both paths should find essentially the same inlier set
        assert g_b.config != int(TwoViewGeometryConfiguration.DEGENERATE)
        n_b = len(g_b.inlier_matches)
        n_p = len(g_p.inlier_matches)
        assert n_b > 0.85 * n_p
        inl_idx = set(map(tuple, g_b.inlier_matches.tolist()))
        true_inl = {(i, i) for i in np.nonzero(gt)[0]}
        agree = len(inl_idx & true_inl) / max(len(inl_idx), 1)
        assert agree > 0.9


def test_batch_5pt_recall_high_outliers():
    """The Nistér-5pt hypothesis path keeps high inlier recall at 50%
    outliers, where 8-point minimal samples (success p ~ 0.004 per draw)
    degrade (VERDICT r2 item 7; ref essential_matrix.h:48-52)."""
    options = TwoViewGeometryOptions()
    pair_data = []
    gts = []
    for seed in range(3):
        cam, x1, x2, rel, gt = synth_two_view(
            n=200, outlier_ratio=0.5, seed=seed
        )
        matches = np.stack([np.arange(len(x1))] * 2, axis=1).astype(np.uint32)
        pair_data.append(
            {
                "x1_px": x1, "x2_px": x2, "cam1": cam, "cam2": cam,
                "matches": matches,
            }
        )
        gts.append(gt)
    batch = verify_pairs_batch(pair_data, options)
    for g, gt in zip(batch, gts):
        assert g.config == int(TwoViewGeometryConfiguration.CALIBRATED)
        inl_idx = {m[0] for m in g.inlier_matches.tolist()}
        true_inl = set(np.nonzero(gt)[0].tolist())
        recall = len(inl_idx & true_inl) / len(true_inl)
        precision = len(inl_idx & true_inl) / max(len(inl_idx), 1)
        assert recall > 0.9 and precision > 0.9


def test_batch_degenerate_pair():
    from pycolmap_tpu.scene import Camera

    cam = Camera.create(1, "PINHOLE", 600.0, 640, 480)
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 640, (40, 2))
    pair_data = [
        {
            "x1_px": x, "x2_px": rng.uniform(0, 640, (40, 2)),
            "cam1": cam, "cam2": cam,
            "matches": np.stack([np.arange(40)] * 2, 1).astype(np.uint32),
        }
    ]
    out = verify_pairs_batch(pair_data)
    assert out[0].config == int(TwoViewGeometryConfiguration.DEGENERATE)
