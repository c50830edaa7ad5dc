"""C4-ish scale validation: synthetic N-image scene -> database -> mapping.

Measures wall-clock per pipeline stage and registered-images/sec, the
second headline metric of BASELINE.json. Uses the synthetic-database path
(ground-truth verified matches) to stress the mapper/triangulator/BA
scheduling rather than SIFT.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import numpy as np


def main(num_images=60, num_points=3000, out="/tmp/scale_test",
         mode="orbit", match_overlap=None):
    from test_incremental_mapping import make_synthetic_database

    from pycolmap_tpu.pipeline.sfm import (
        IncrementalPipelineOptions,
        incremental_mapping,
    )

    out = Path(out)
    out.mkdir(parents=True, exist_ok=True)
    db = out / "db.db"
    if db.exists():
        db.unlink()
    t0 = time.time()
    gt = make_synthetic_database(
        db, num_images=num_images, num_points=num_points, pixel_noise=0.4,
        mode=mode, match_overlap=match_overlap,
    )
    print(
        f"synthetic db ({num_images} imgs, {num_points} pts, {mode}): "
        f"{time.time()-t0:.1f}s"
    )

    options = IncrementalPipelineOptions()
    options.min_model_size = 6
    options.extract_colors = False
    t0 = time.time()
    recs = incremental_mapping(db, out, out / "sparse", options)
    dt = time.time() - t0
    rec = recs[0]
    print(rec.summary())
    print(
        f"mapping: {dt:.1f}s -> {rec.num_reg_images / dt:.2f} registered images/s"
    )
    from pycolmap_tpu.estimators import compare_reconstructions

    result = compare_reconstructions(rec, gt)
    if result:
        rot = np.median([e.rotation_error_deg for e in result["errors"]])
        ctr = np.median([e.proj_center_error for e in result["errors"]])
        print(f"vs GT: median rot err {rot:.4f} deg, center err {ctr:.5f}")
    # skip interpreter teardown: a prewarm thread blocked in a remote
    # tunnel RPC at exit aborts the process after the stats have printed
    import os as _os

    sys.stdout.flush()
    _os._exit(0)


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--num_images", type=int, default=60)
    p.add_argument("--num_points", type=int, default=3000)
    p.add_argument("--mode", default="orbit", choices=["orbit", "sequential"])
    p.add_argument("--match_overlap", type=int, default=None)
    args = p.parse_args()
    main(
        args.num_images, args.num_points,
        mode=args.mode, match_overlap=args.match_overlap,
    )
