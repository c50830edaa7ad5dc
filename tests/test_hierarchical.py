"""Partitioned correspondence graph + hierarchical mapping (SURVEY §2c P5;
upstream colmap/controllers/hierarchical_pipeline analog)."""

import numpy as np
import pytest

from pycolmap_tpu.parallel.graph_partition import (
    expand_with_overlap,
    hierarchical_mapping,
    merge_reconstructions,
    partition_images,
)


class TestPartitioning:
    def _chain_counts(self, n, w=100):
        return {(i, i + 1): w for i in range(1, n)}

    def test_covers_all_balanced(self):
        counts = self._chain_counts(20)
        parts = partition_images(counts, range(1, 21), 4)
        flat = sorted(x for p in parts for x in p)
        assert flat == list(range(1, 21))
        sizes = [len(p) for p in parts]
        assert max(sizes) - min(sizes) <= 1

    def test_chain_partitions_contiguous(self):
        # a pure chain should split into contiguous runs (connectivity-aware)
        counts = self._chain_counts(16)
        parts = partition_images(counts, range(1, 17), 2)
        for p in parts:
            assert p == list(range(min(p), max(p) + 1))

    def test_overlap_adds_boundary_images(self):
        counts = self._chain_counts(10)
        parts = partition_images(counts, range(1, 11), 2)
        expanded = expand_with_overlap(parts, counts, overlap=2)
        for orig, exp in zip(parts, expanded):
            assert set(orig) <= set(exp)
            assert len(exp) >= len(orig) + 1  # at least one shared image
        assert set(expanded[0]) & set(expanded[1])

    def test_deterministic(self):
        counts = {(i, j): ((i * 7 + j) % 13) + 1
                  for i in range(1, 15) for j in range(i + 1, 15)}
        a = partition_images(counts, range(1, 15), 3)
        b = partition_images(counts, range(1, 15), 3)
        assert a == b


@pytest.mark.slow
def test_hierarchical_mapping_merges_partitions(tmp_path):
    from test_incremental_mapping import make_synthetic_database

    from pycolmap_tpu.estimators import compare_reconstructions
    from pycolmap_tpu.pipeline.sfm import IncrementalPipelineOptions

    gt = make_synthetic_database(
        tmp_path / "db.db", num_images=16, num_points=600, pixel_noise=0.4
    )
    options = IncrementalPipelineOptions()
    options.min_model_size = 4
    options.extract_colors = False
    recs = hierarchical_mapping(
        tmp_path / "db.db", tmp_path, tmp_path / "sparse",
        num_partitions=2, overlap=4, options=options,
    )
    assert recs
    merged = recs[0]
    # the merge must unify (nearly) the whole scene into one model
    assert merged.num_reg_images >= 14
    result = compare_reconstructions(merged, gt)
    assert result is not None
    rot = np.median([e.rotation_error_deg for e in result["errors"]])
    assert rot < 0.5
    merged.check()
