"""C4/C5 scale validation: synthetic N-image scene -> database -> mapping.

Measures wall-clock per pipeline stage and registered-images/sec, the
second headline metric of BASELINE.json. Uses the synthetic-database path
(ground-truth verified matches, point-anchored descriptors) to stress the
mapper/triangulator/BA scheduling rather than SIFT.

Modes:
  --mode sequential      forward trajectory (C4 drift benchmark)
  --mode loop            closed circular trajectory; with --loop_closure
                         the vocab-tree retrieval finds the revisits,
                         descriptor matching + two-view verification
                         accepts them, and retriangulation + global BA
                         close the loop (VERDICT r3 weak #7 demo)
  --hierarchical         partition the scene graph, map sub-models,
                         merge + final global BA (C5 path, SURVEY §2c P5)
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import numpy as np


def rss_gb():
    import resource

    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def add_loop_closures(db_path, verbose=True):
    """Detect loop candidates by retrieval, match + verify them, and write
    the verified pairs into the database (the sequential-matching
    loop_detection path, run standalone on a synthetic database)."""
    from pycolmap_tpu.features.retrieval import detect_loops
    from pycolmap_tpu.pipeline.match_features import (
        SiftMatchingOptions,
        _PairMatcher,
    )
    from pycolmap_tpu.estimators.two_view_geometry import (
        TwoViewGeometryOptions,
    )
    from pycolmap_tpu.scene import Database

    db = Database(db_path)
    try:
        images = sorted(db.read_all_images(), key=lambda im: im.name)
        ids = [im.image_id for im in images]
        t0 = time.time()
        ranked = detect_loops(db, ids, period=5, num_images=5,
                              min_sequence_gap=max(20, len(ids) // 4),
                              min_score=0.125)
        cands = sorted(
            {
                (min(q, m), max(q, m))
                for q, cc in ranked
                for m, _ in cc
            }
        )
        t1 = time.time()
        # compute_relative_pose: the pose-graph relaxation needs the
        # closure pairs' relative rotations/translation directions
        matcher = _PairMatcher(
            db, SiftMatchingOptions(),
            TwoViewGeometryOptions(compute_relative_pose=True), False,
        )
        verified = sum(matcher.run(cands))
        t2 = time.time()
        if verbose:
            print(
                f"loop closure: {len(cands)} candidates (retrieval "
                f"{t1 - t0:.1f}s), {verified} verified pairs "
                f"(match+verify {t2 - t1:.1f}s)"
            )
        return verified
    finally:
        db.close()


def main(num_images=60, num_points=3000, out="/tmp/scale_test",
         mode="orbit", match_overlap=None, loop_closure=False,
         hierarchical=False, num_parts=4):
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

    if loop_closure:
        add_loop_closures(db)

    options = IncrementalPipelineOptions()
    options.min_model_size = 6
    options.extract_colors = False
    t0 = time.time()
    if hierarchical:
        from pycolmap_tpu.parallel.graph_partition import (
            hierarchical_mapping,
        )

        rec_map = hierarchical_mapping(
            db, out, out / "sparse", num_partitions=num_parts,
            options=options,
        )
        recs = (
            list(rec_map.values()) if isinstance(rec_map, dict) else [rec_map]
        )
    else:
        rec_map = incremental_mapping(db, out, out / "sparse", options)
        recs = list(rec_map.values()) if isinstance(rec_map, dict) else rec_map
    dt = time.time() - t0
    if not recs:
        print(f"mapping FAILED: no model ({dt:.1f}s)")
        sys.stdout.flush()
        import os as _os

        _os._exit(1)
    rec = max(recs, key=lambda r: r.num_reg_images)
    print(rec.summary())
    print(
        f"mapping{' (hierarchical)' if hierarchical else ''}: {dt:.1f}s -> "
        f"{rec.num_reg_images / dt:.2f} registered images/s; "
        f"peak RSS {rss_gb():.2f} GB"
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
    p.add_argument("--out", default="/tmp/scale_test")
    p.add_argument("--mode", default="orbit",
                   choices=["orbit", "sequential", "loop"])
    p.add_argument("--match_overlap", type=int, default=None)
    p.add_argument("--loop_closure", action="store_true")
    p.add_argument("--hierarchical", action="store_true")
    p.add_argument("--num_parts", type=int, default=4)
    args = p.parse_args()
    main(
        args.num_images, args.num_points, out=args.out,
        mode=args.mode, match_overlap=args.match_overlap,
        loop_closure=args.loop_closure, hierarchical=args.hierarchical,
        num_parts=args.num_parts,
    )
