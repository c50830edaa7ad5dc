"""End-to-end example mirroring the reference example.py flow
(ref: /root/reference/example.py:32-49): extract -> match -> map -> summary.

The reference downloads the Strecha Fountain scene; this environment has no
network, so the example renders a synthetic two-plane scene (same generator
the integration tests use) and reconstructs it. Point it at your own images
with --image_path to run on real data.
"""

import argparse
import sys
import tempfile
from pathlib import Path

import pycolmap_tpu as pycolmap


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--image_path", type=str, default="")
    parser.add_argument("--output_path", type=str, default="")
    parser.add_argument("--num_images", type=int, default=6)
    parser.add_argument("--dense", action="store_true",
                        help="run undistortion + patch-match + fusion")
    args = parser.parse_args()

    output_path = Path(args.output_path or tempfile.mkdtemp(prefix="sfm_"))
    output_path.mkdir(parents=True, exist_ok=True)

    if args.image_path:
        image_path = Path(args.image_path)
    else:
        image_path = output_path / "images"
        print(f"Rendering synthetic scene -> {image_path}")
        sys.path.insert(0, str(Path(__file__).parent / "tests"))
        from test_full_pipeline import render_scene

        render_scene(image_path, num_images=args.num_images)

    database_path = output_path / "database.db"
    sparse_path = output_path / "sparse"

    print("Extracting features...")
    pycolmap.extract_features(database_path, image_path)

    print("Matching exhaustively...")
    pycolmap.match_exhaustive(database_path)

    print("Running incremental mapping...")
    options = pycolmap.IncrementalPipelineOptions()
    options.min_model_size = 4
    options.mapper.init_min_num_inliers = 30
    options.mapper.abs_pose_min_num_inliers = 15
    options.mapper.init_min_tri_angle = 4.0
    maps = pycolmap.incremental_mapping(
        database_path, image_path, sparse_path, options
    )
    for idx, rec in maps.items():
        print(f"model #{idx}:")
        print(rec.summary())

    if args.dense and maps:
        from pycolmap_tpu.pipeline.mvs import patch_match_stereo, stereo_fusion

        dense_path = output_path / "dense"
        print("Undistorting...")
        pycolmap.undistort_images(dense_path, sparse_path / "0", image_path)
        print("PatchMatch stereo...")
        patch_match_stereo(dense_path)
        print("Fusing...")
        stereo_fusion(dense_path / "fused.ply", dense_path)

    print(f"Done. Outputs in {output_path}")


if __name__ == "__main__":
    main()
