"""Auxiliary subsystems: Timer, snapshots, callbacks (SURVEY §5)."""

import time

import numpy as np
import pytest

from pycolmap_tpu.utils.timer import Timer


class TestTimer:
    def test_elapsed(self):
        t = Timer()
        t.start()
        time.sleep(0.05)
        assert 0.04 < t.elapsed_seconds() < 1.0
        t.pause()
        e1 = t.elapsed_seconds()
        time.sleep(0.03)
        assert t.elapsed_seconds() == e1
        t.resume()
        time.sleep(0.02)
        assert t.elapsed_seconds() > e1
        t.reset()
        assert t.elapsed_seconds() == 0.0

    def test_units(self):
        t = Timer()
        t.start()
        time.sleep(0.01)
        t.pause()  # freeze so all unit queries see the same elapsed time
        s = t.elapsed_seconds()
        assert abs(t.elapsed_minutes() - s / 60) < 1e-9
        assert abs(t.elapsed_micro_seconds() - s * 1e6) < 1e-3


@pytest.mark.slow
def test_snapshots_and_callbacks(tmp_path):
    from test_incremental_mapping import make_synthetic_database

    from pycolmap_tpu.pipeline.sfm import (
        IncrementalPipelineOptions,
        incremental_mapping,
    )

    make_synthetic_database(tmp_path / "db.db", num_images=6, num_points=150)
    options = IncrementalPipelineOptions()
    options.min_model_size = 4
    options.extract_colors = False
    options.snapshot_path = str(tmp_path / "snaps")
    options.snapshot_images_freq = 2
    events = {"initial": 0, "next": 0}
    recs = incremental_mapping(
        tmp_path / "db.db", tmp_path, tmp_path / "sparse", options,
        initial_image_pair_callback=lambda: events.__setitem__(
            "initial", events["initial"] + 1
        ),
        next_image_callback=lambda: events.__setitem__("next", events["next"] + 1),
    )
    assert events["initial"] >= 1
    assert events["next"] >= recs[0].num_reg_images - 2
    snaps = sorted((tmp_path / "snaps").glob("*/cameras.bin"))
    assert len(snaps) >= 1
