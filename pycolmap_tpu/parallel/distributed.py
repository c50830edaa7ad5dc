"""Multi-host distribution: process init, work partitioning, DB merging.

SURVEY.md §2c P1/P3/P5/P6: the reference parallelizes with in-process thread
pools (pipeline/extract_features.h:57-60, match_features.h:102-108) and has
no multi-node story. Here the cross-host layer is:

- `init_distributed` — `jax.distributed` runtime (ICI collectives inside a
  slice come from sharded jit; this sets up the multi-process mesh);
- deterministic work partitioning of images (P3 data-parallel extraction)
  and image pairs (P1 pair-parallel matching/verification) across
  processes;
- shard-database merging: each host extracts/matches into its own SQLite
  shard (one writer per file — SQLite has no cross-host locking), then the
  shards merge into the canonical database the mapper reads. The merged DB
  is byte-identical to a single-process run over the same inputs.

Single-process calls are no-ops / identity partitions, so the same driver
script runs anywhere.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

from pycolmap_tpu.scene import Database, DatabaseTransaction
from pycolmap_tpu.scene.database import pair_id_to_image_pair


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
):
    """Initialize the jax.distributed runtime (no-op for one process).

    Arguments default to the standard JAX env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID) so launch
    scripts can stay declarative. Returns (process_id, num_processes).
    """
    import jax

    num = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num <= 1:
        return 0, 1
    jax.distributed.initialize(
        coordinator_address=coordinator_address
        or os.environ.get("JAX_COORDINATOR_ADDRESS"),
        num_processes=num,
        process_id=process_id
        if process_id is not None
        else int(os.environ.get("JAX_PROCESS_ID", "0")),
    )
    return jax.process_index(), jax.process_count()


def partition_round_robin(items, num_shards: int, shard_idx: int):
    """Deterministic round-robin shard of a sequence (order-preserving)."""
    if num_shards <= 1:
        return list(items)
    return [x for k, x in enumerate(items) if k % num_shards == shard_idx]


def partition_pairs(pairs, num_shards: int, shard_idx: int):
    """Shard an image-pair list, balancing by position (P1).

    Pair lists from the pairing strategies are roughly cost-uniform, so
    round-robin keeps per-shard work balanced without a cost model.
    """
    return partition_round_robin(pairs, num_shards, shard_idx)


def shard_database_path(database_path, shard_idx: int) -> Path:
    """Canonical per-process shard path: <db>.shard<k>."""
    p = Path(database_path)
    return p.with_name(p.name + f".shard{shard_idx}")


def merge_feature_shards(database_path, shard_paths):
    """Merge per-host keypoints/descriptors shards into the canonical DB.

    Image/camera rows must already exist in the canonical DB (written by
    import_images before sharding); shards contribute only the feature
    blobs of the images their host processed.
    """
    dst = Database(database_path)
    try:
        with DatabaseTransaction(dst):
            for sp in shard_paths:
                src = Database(sp)
                try:
                    rows = src._conn.execute(
                        "SELECT image_id, rows, cols, data FROM keypoints"
                    ).fetchall()
                    for image_id, r, c, data in rows:
                        dst._conn.execute(
                            "INSERT OR REPLACE INTO keypoints VALUES (?, ?, ?, ?)",
                            (image_id, r, c, data),
                        )
                    rows = src._conn.execute(
                        "SELECT image_id, rows, cols, data FROM descriptors"
                    ).fetchall()
                    for image_id, r, c, data in rows:
                        dst._conn.execute(
                            "INSERT OR REPLACE INTO descriptors VALUES (?, ?, ?, ?)",
                            (image_id, r, c, data),
                        )
                finally:
                    src.close()
    finally:
        dst.close()


def merge_match_shards(database_path, shard_paths):
    """Merge per-host matches/two_view_geometries shards (P1 gather)."""
    dst = Database(database_path)
    try:
        with DatabaseTransaction(dst):
            for sp in shard_paths:
                src = Database(sp)
                try:
                    rows = src._conn.execute(
                        "SELECT pair_id, rows, cols, data FROM matches"
                    ).fetchall()
                    for pair_id, r, c, data in rows:
                        dst._conn.execute(
                            "INSERT OR REPLACE INTO matches VALUES (?, ?, ?, ?)",
                            (pair_id, r, c, data),
                        )
                    rows = src._conn.execute(
                        "SELECT pair_id, rows, cols, data, config, F, E, H, "
                        "qvec, tvec FROM two_view_geometries"
                    ).fetchall()
                    for row in rows:
                        dst._conn.execute(
                            "INSERT OR REPLACE INTO two_view_geometries "
                            "VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?, ?)",
                            row,
                        )
                finally:
                    src.close()
    finally:
        dst.close()


def make_feature_shard(database_path, shard_idx: int) -> Path:
    """Create an empty shard DB carrying the canonical image/camera rows
    (so shard writers can resolve image ids without touching the main DB)."""
    shard = shard_database_path(database_path, shard_idx)
    if shard.exists():
        shard.unlink()
    src = Database(database_path)
    dst = Database(shard)
    try:
        with DatabaseTransaction(dst):
            for cam in src.read_all_cameras():
                dst.write_camera(cam, use_camera_id=True)
            for img in src.read_all_images():
                dst.write_image(img, use_image_id=True)
    finally:
        src.close()
        dst.close()
    return shard


def extract_features_sharded(
    database_path,
    image_path,
    process_id: int = 0,
    num_processes: int = 1,
    **extract_kwargs,
):
    """P3 data-parallel extraction: this process extracts its image shard
    into <db>.shard<k>. Run on every host, then `merge_feature_shards` on
    one host. Single-process: plain extract_features into the main DB.
    """
    from pycolmap_tpu.pipeline.extract_features import extract_features

    if num_processes <= 1:
        return extract_features(database_path, image_path, **extract_kwargs)

    # images must be imported once (idempotent) before sharding
    db = Database(database_path)
    try:
        names = sorted(img.name for img in db.read_all_images())
    finally:
        db.close()
    mine = partition_round_robin(names, num_processes, process_id)
    shard = make_feature_shard(database_path, process_id)
    return extract_features(
        shard, image_path, image_names=mine, **extract_kwargs
    )


def match_exhaustive_sharded(
    database_path,
    process_id: int = 0,
    num_processes: int = 1,
    sift_options=None,
    verification_options=None,
):
    """P1 pair-parallel matching: this process matches + verifies its shard
    of the exhaustive pair list, reading features from the canonical DB and
    writing matches/two-view geometries into <db>.shard<k>. Run on every
    host, then `merge_match_shards` on one host.
    """
    from pycolmap_tpu.estimators.two_view_geometry import TwoViewGeometryOptions
    from pycolmap_tpu.features.matcher import SiftMatchingOptions
    from pycolmap_tpu.pipeline.match_features import (
        _match_and_verify_pairs,
        match_exhaustive,
    )

    if num_processes <= 1:
        return match_exhaustive(database_path)

    db = Database(database_path)
    try:
        image_ids = sorted(img.image_id for img in db.read_all_images())
        pairs = [
            (i, j) for k, i in enumerate(image_ids) for j in image_ids[k + 1 :]
        ]
        mine = partition_pairs(pairs, num_processes, process_id)
        shard = shard_database_path(database_path, process_id)
        if shard.exists():
            shard.unlink()
        out = Database(shard)
        try:
            return _match_and_verify_pairs(
                db,
                mine,
                sift_options or SiftMatchingOptions(),
                verification_options or TwoViewGeometryOptions(),
                db_out=out,
            )
        finally:
            out.close()
    finally:
        db.close()
