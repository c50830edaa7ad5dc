"""Feature matching + geometric verification pipelines.

API parity: pycolmap/pipeline/match_features.h — the four pairing
strategies: ``match_exhaustive`` (:219, ExhaustiveMatchingOptions :102-108),
``match_sequential`` (:228, SequentialMatchingOptions :110-152),
``match_spatial`` (:237, SpatialMatchingOptions :154-175),
``match_vocabtree`` (:246, VocabTreeMatchingOptions :177-214), and
``verify_matches`` (:51-68).

Pair-parallel design (SURVEY.md §2c P1): the pair list is generated on the
host; each pair's descriptor matching is one MXU matmul and its geometric
verification one batched LORANSAC — both device-side. Block scheduling
mirrors the reference's cache-friendly ``block_size`` blocking.
"""

from __future__ import annotations

import itertools
from collections import defaultdict

import numpy as np

from pycolmap_tpu.estimators.two_view_geometry import (
    TwoViewGeometryConfiguration,
    TwoViewGeometryOptions,
    estimate_calibrated_two_view_geometry,
    estimate_two_view_geometry,
)
from pycolmap_tpu.features.matcher import (
    SiftMatchingOptions,
    match_descriptors,
    match_descriptors_batch,
    match_guided,
)
from pycolmap_tpu.scene import Database
from pycolmap_tpu.utils.options import BaseOptions, options_dataclass


@options_dataclass
class ExhaustiveMatchingOptions(BaseOptions):
    block_size: int = 50


@options_dataclass
class SequentialMatchingOptions(BaseOptions):
    overlap: int = 10
    quadratic_overlap: bool = True
    loop_detection: bool = False
    loop_detection_period: int = 10
    loop_detection_num_images: int = 50
    loop_detection_num_nearest_neighbors: int = 1
    loop_detection_num_checks: int = 256
    loop_detection_num_images_after_verification: int = 0
    loop_detection_max_num_features: int = -1
    vocab_tree_path: str = ""


@options_dataclass
class SpatialMatchingOptions(BaseOptions):
    ignore_z: bool = True
    max_num_neighbors: int = 50
    max_distance: float = 100.0


@options_dataclass
class VocabTreeMatchingOptions(BaseOptions):
    num_images: int = 100
    num_nearest_neighbors: int = 5
    num_checks: int = 256
    num_images_after_verification: int = 0
    max_num_features: int = -1
    vocab_tree_path: str = ""
    match_list_path: str = ""


class _FeatureCache:
    """Host-side cache of per-image keypoints/descriptors/cameras."""

    def __init__(self, db: Database):
        self.db = db
        self.keypoints = {}
        self.descriptors = {}
        self.cameras = {}
        self.image_cam = {}

    def load(self, image_id: int):
        if image_id not in self.keypoints:
            self.keypoints[image_id] = self.db.read_keypoints(image_id)
            self.descriptors[image_id] = self.db.read_descriptors(image_id)
        return self.keypoints[image_id], self.descriptors[image_id]

    def camera_of(self, image_id: int):
        if image_id not in self.image_cam:
            img = self.db.read_image(image_id)
            self.image_cam[image_id] = img.camera_id
        cam_id = self.image_cam[image_id]
        if cam_id not in self.cameras:
            self.cameras[cam_id] = self.db.read_camera(cam_id)
        return self.cameras[cam_id]


_BATCH_VERIFY_SIZE = 16  # pairs verified per device program
_BATCH_MATCH_SIZE = 64  # pairs descriptor-matched per dispatch chunk


class _PairMatcher:
    """Shared match+verify engine behind every pairing strategy.

    Geometric verification runs pair-parallel: blocks of pairs are estimated
    in one compiled program (estimators/batch_two_view.py, SURVEY §2c P1);
    guided matching falls back to the per-pair path for the few pairs that
    request it. ``run(pairs)`` returns per-pair pass/fail in order.
    """

    def __init__(self, db, matching_options, verification_options,
                 verbose=False, db_out=None):
        self.db = db
        self.db_out = db_out if db_out is not None else db
        self.matching_options = matching_options
        self.verification_options = verification_options
        self.verbose = verbose
        self.cache = _FeatureCache(db)

    def run(self, pairs) -> list:
        """Match + verify `pairs`; returns [bool passed] aligned to pairs."""
        from pycolmap_tpu.estimators.batch_two_view import verify_pairs_batch

        mopt, vopt = self.matching_options, self.verification_options
        results = {}
        block = []  # (id1, id2, pair_data dict, d1, d2, kp1, kp2)

        def flush():
            if not block:
                return
            geoms = verify_pairs_batch([b[2] for b in block], vopt)
            for (id1, id2, p, d1, d2, kp1, kp2), g in zip(block, geoms):
                if mopt.guided_matching and g.config not in (
                    int(TwoViewGeometryConfiguration.UNDEFINED),
                    int(TwoViewGeometryConfiguration.DEGENERATE),
                ):
                    guided = match_guided(
                        d1, d2, kp1[:, :2], kp2[:, :2], g, mopt,
                        max_error=vopt.ransac.max_error,
                    )
                    if len(guided) > len(g.inlier_matches):
                        g2 = estimate_calibrated_two_view_geometry(
                            p["cam1"], kp1[:, :2], p["cam2"], kp2[:, :2],
                            guided, vopt,
                        )
                        if len(g2.inlier_matches) > len(g.inlier_matches):
                            g = g2
                self.db_out.write_two_view_geometry(id1, id2, g)
                results[(id1, id2)] = (
                    len(g.inlier_matches) >= vopt.min_num_inliers
                )
                if self.verbose:
                    print(
                        f"pair ({id1}, {id2}): {len(p['matches'])} "
                        f"matches, {len(g.inlier_matches)} inliers, "
                        f"config {g.config}"
                    )
            block.clear()

        pairs = list(pairs)
        # pair-parallel matching: descriptor matching for a whole chunk of
        # pairs is one (or a few, per shape bucket) device dispatches
        for s in range(0, len(pairs), _BATCH_MATCH_SIZE):
            chunk = pairs[s:s + _BATCH_MATCH_SIZE]
            feats = [
                (self.cache.load(id1), self.cache.load(id2))
                for id1, id2 in chunk
            ]
            matches_l = match_descriptors_batch(
                [(f1[1], f2[1]) for f1, f2 in feats], mopt
            )
            for (image_id1, image_id2), ((kp1, d1), (kp2, d2)), matches in zip(
                chunk, feats, matches_l
            ):
                self.db_out.write_matches(image_id1, image_id2, matches)
                if len(matches) < vopt.min_num_inliers:
                    results[(image_id1, image_id2)] = False
                    continue
                block.append(
                    (
                        image_id1, image_id2,
                        {
                            "x1_px": kp1[matches[:, 0], :2],
                            "x2_px": kp2[matches[:, 1], :2],
                            "cam1": self.cache.camera_of(image_id1),
                            "cam2": self.cache.camera_of(image_id2),
                            "matches": matches,
                        },
                        d1, d2, kp1, kp2,
                    )
                )
                if len(block) >= _BATCH_VERIFY_SIZE:
                    flush()
        flush()
        self.db_out.commit()
        return [results.get(p, False) for p in pairs]

    def run_ranked(self, ranked, cap_after_verification: int = 0) -> int:
        """Retrieval-ranked matching: per query image, candidates are
        verified in descending retrieval-score order; when
        cap_after_verification > 0, a query stops submitting candidates
        after that many PASS verification (num_images_after_verification
        semantics, ref match_features.h:177-214 — the reference retrieves
        num_images, spatially verifies, keeps the best subset; here
        verification IS the spatial check, so capping per-query successes
        reproduces the work bound). Pairs already processed under an earlier
        query are not re-verified but count toward the cap.

        ranked: [(query_id, [(match_id, score), ...])].
        """
        num_verified = 0
        done: dict = {}
        for query_id, cands in ranked:
            passed = 0
            todo = [
                (min(query_id, m), max(query_id, m)) for m, _ in cands
            ]
            pos = 0
            while pos < len(todo):
                if cap_after_verification > 0 and passed >= cap_after_verification:
                    break
                # submit candidates in blocks; under a cap, never submit
                # more than the successes still needed (each may pass)
                limit = _BATCH_VERIFY_SIZE
                if cap_after_verification > 0:
                    limit = min(limit, cap_after_verification - passed)
                chunk = []
                while pos < len(todo) and len(chunk) < limit:
                    key = todo[pos]
                    pos += 1
                    if key in done:
                        passed += int(done[key])
                        if (cap_after_verification > 0
                                and passed >= cap_after_verification):
                            break
                    else:
                        chunk.append(key)
                if chunk:
                    for key, ok in zip(chunk, self.run(chunk)):
                        done[key] = ok
                        passed += int(ok)
                        num_verified += int(ok)
        return num_verified


def _match_and_verify_pairs(
    db: Database,
    pairs,
    matching_options: SiftMatchingOptions,
    verification_options: TwoViewGeometryOptions,
    verbose: bool = False,
    db_out: Database = None,
):
    matcher = _PairMatcher(
        db, matching_options, verification_options, verbose, db_out
    )
    return sum(matcher.run(pairs))


def match_exhaustive(
    database_path,
    sift_options: SiftMatchingOptions = None,
    matching_options: ExhaustiveMatchingOptions = None,
    verification_options: TwoViewGeometryOptions = None,
    device=None,
    verbose: bool = False,
):
    """All N(N-1)/2 pairs in block order (ref: match_features.h:219-227)."""
    if sift_options is None:
        sift_options = SiftMatchingOptions()
    if matching_options is None:
        matching_options = ExhaustiveMatchingOptions()
    if verification_options is None:
        verification_options = TwoViewGeometryOptions()
    db = Database(database_path)
    try:
        image_ids = [img.image_id for img in db.read_all_images()]
        bs = matching_options.block_size
        pairs = []
        # block-partitioned order for cache reuse (ref: block_size semantics)
        for b1 in range(0, len(image_ids), bs):
            for b2 in range(b1, len(image_ids), bs):
                for i in image_ids[b1 : b1 + bs]:
                    for j in image_ids[b2 : b2 + bs]:
                        if i < j:
                            pairs.append((i, j))
        return _match_and_verify_pairs(
            db, pairs, sift_options, verification_options, verbose
        )
    finally:
        db.close()


def match_sequential(
    database_path,
    sift_options: SiftMatchingOptions = None,
    matching_options: SequentialMatchingOptions = None,
    verification_options: TwoViewGeometryOptions = None,
    device=None,
    verbose: bool = False,
):
    """Window + quadratic overlap pairs (ref: match_features.h:110-152, :228).

    Loop detection via the vocab-tree retrieval module when enabled.
    """
    if sift_options is None:
        sift_options = SiftMatchingOptions()
    if matching_options is None:
        matching_options = SequentialMatchingOptions()
    if verification_options is None:
        verification_options = TwoViewGeometryOptions()
    db = Database(database_path)
    try:
        images = db.read_all_images()
        # sequential order = sorted by name (upstream orders by name)
        images = sorted(images, key=lambda im: im.name)
        ids = [im.image_id for im in images]
        pairs = set()
        n = len(ids)
        for i in range(n):
            for k in range(1, matching_options.overlap + 1):
                if i + k < n:
                    pairs.add((min(ids[i], ids[i + k]), max(ids[i], ids[i + k])))
                if matching_options.quadratic_overlap:
                    q = i + (1 << k)
                    if q < n:
                        pairs.add((min(ids[i], ids[q]), max(ids[i], ids[q])))
        matcher = _PairMatcher(
            db, sift_options, verification_options, verbose
        )
        num = sum(matcher.run(sorted(pairs)))
        if matching_options.loop_detection:
            from pycolmap_tpu.features.retrieval import detect_loops

            ranked = detect_loops(
                db, ids,
                period=matching_options.loop_detection_period,
                num_images=matching_options.loop_detection_num_images,
                num_nearest_neighbors=(
                    matching_options.loop_detection_num_nearest_neighbors
                ),
                num_checks=matching_options.loop_detection_num_checks,
                max_num_features=(
                    matching_options.loop_detection_max_num_features
                ),
                vocab_tree_path=matching_options.vocab_tree_path,
            )
            # drop candidates already matched by the sequential window
            ranked = [
                (q, [(m, s) for m, s in cands
                     if (min(q, m), max(q, m)) not in pairs])
                for q, cands in ranked
            ]
            num += matcher.run_ranked(
                ranked,
                cap_after_verification=(
                    matching_options.loop_detection_num_images_after_verification
                ),
            )
        return num
    finally:
        db.close()


def match_spatial(
    database_path,
    sift_options: SiftMatchingOptions = None,
    matching_options: SpatialMatchingOptions = None,
    verification_options: TwoViewGeometryOptions = None,
    device=None,
    verbose: bool = False,
):
    """Prior-position kNN pairs (ref: match_features.h:154-175, :237)."""
    if sift_options is None:
        sift_options = SiftMatchingOptions()
    if matching_options is None:
        matching_options = SpatialMatchingOptions()
    if verification_options is None:
        verification_options = TwoViewGeometryOptions()
    db = Database(database_path)
    try:
        images = db.read_all_images()
        pos = {}
        for im in images:
            if im.cam_from_world_prior is not None:
                c = im.cam_from_world_prior.inverse().translation
                if matching_options.ignore_z:
                    c = np.array([c[0], c[1], 0.0])
                pos[im.image_id] = c
        ids = list(pos.keys())
        if len(ids) < 2:
            return 0
        P = np.stack([pos[i] for i in ids])
        pairs = set()
        d2 = np.sum((P[:, None] - P[None, :]) ** 2, axis=-1)
        np.fill_diagonal(d2, np.inf)
        max_d2 = matching_options.max_distance**2
        for a in range(len(ids)):
            order = np.argsort(d2[a])[: matching_options.max_num_neighbors]
            for b in order:
                if d2[a, b] <= max_d2:
                    pairs.add((min(ids[a], ids[b]), max(ids[a], ids[b])))
        return _match_and_verify_pairs(
            db, sorted(pairs), sift_options, verification_options, verbose
        )
    finally:
        db.close()


def match_vocabtree(
    database_path,
    sift_options: SiftMatchingOptions = None,
    matching_options: VocabTreeMatchingOptions = None,
    verification_options: TwoViewGeometryOptions = None,
    device=None,
    verbose: bool = False,
):
    """Visual-retrieval pairs (ref: match_features.h:177-214, :246)."""
    if sift_options is None:
        sift_options = SiftMatchingOptions()
    if matching_options is None:
        matching_options = VocabTreeMatchingOptions()
    if verification_options is None:
        verification_options = TwoViewGeometryOptions()
    from pycolmap_tpu.features.retrieval import retrieve_ranked_pairs

    db = Database(database_path)
    try:
        ids = [im.image_id for im in db.read_all_images()]
        if matching_options.match_list_path:
            # explicit pair list file: "name1 name2" per line (ref
            # VocabTreeMatchingOptions::match_list_path)
            with open(matching_options.match_list_path) as f:
                name_pairs = [ln.split() for ln in f if ln.strip()]
            by_name = {
                im.name: im.image_id for im in db.read_all_images()
            }
            pairs = sorted(
                {
                    (min(by_name[a], by_name[b]), max(by_name[a], by_name[b]))
                    for a, b in name_pairs
                    if a in by_name and b in by_name
                }
            )
            return _match_and_verify_pairs(
                db, pairs, sift_options, verification_options, verbose
            )
        ranked = retrieve_ranked_pairs(
            db, ids,
            num_images=matching_options.num_images,
            max_num_features=matching_options.max_num_features,
            num_nearest_neighbors=matching_options.num_nearest_neighbors,
            num_checks=matching_options.num_checks,
            vocab_tree_path=matching_options.vocab_tree_path,
        )
        matcher = _PairMatcher(
            db, sift_options, verification_options, verbose
        )
        return matcher.run_ranked(
            ranked,
            cap_after_verification=(
                matching_options.num_images_after_verification
            ),
        )
    finally:
        db.close()


def verify_matches(
    database_path,
    pairs,
    options: TwoViewGeometryOptions = None,
):
    """Geometric verification of existing matches for given (name1, name2)
    or (id1, id2) pairs (ref: match_features.h:51-68)."""
    if options is None:
        options = TwoViewGeometryOptions()
    db = Database(database_path)
    try:
        cache = _FeatureCache(db)
        resolved = []
        for a, b in pairs:
            if isinstance(a, str):
                a = db.image_id_from_name(a)
                b = db.image_id_from_name(b)
            if a is None or b is None:
                continue
            resolved.append((a, b))
        num = 0
        for image_id1, image_id2 in resolved:
            matches = db.read_matches(image_id1, image_id2)
            kp1, _ = cache.load(image_id1)
            kp2, _ = cache.load(image_id2)
            cam1 = cache.camera_of(image_id1)
            cam2 = cache.camera_of(image_id2)
            g = estimate_calibrated_two_view_geometry(
                cam1, kp1[:, :2], cam2, kp2[:, :2], matches, options
            )
            db.write_two_view_geometry(image_id1, image_id2, g)
            if len(g.inlier_matches) >= options.min_num_inliers:
                num += 1
        db.commit()
        return num
    finally:
        db.close()
