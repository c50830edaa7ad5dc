"""HKM vocab-tree retrieval: tree training/quantization, inverted-index
scoring, planted-loop recovery, and the vocabtree matching pipeline
(ref: pipeline/match_features.h:177-214, colmap/retrieval)."""

import numpy as np
import pytest

from pycolmap_tpu.features.retrieval import (
    InvertedIndex,
    VocabTree,
    build_visual_index,
    detect_loops,
    retrieve_pairs,
    retrieve_ranked_pairs,
)
from pycolmap_tpu.scene import Camera, Database, Image


def _clustered_descs(rng, n_clusters, per_cluster, noise=6):
    """Unit-float descriptor sets with planted cluster structure."""
    bases = rng.integers(20, 235, (n_clusters, 128))
    descs = []
    labels = []
    for c in range(n_clusters):
        d = bases[c][None, :] + rng.integers(-noise, noise, (per_cluster, 128))
        descs.append(np.clip(d, 0, 255))
        labels += [c] * per_cluster
    raw = np.concatenate(descs).astype(np.float32)
    raw /= np.maximum(np.linalg.norm(raw, axis=1, keepdims=True), 1e-9)
    return raw, np.array(labels)


class TestVocabTree:
    def test_train_quantize_cluster_purity(self):
        rng = np.random.default_rng(0)
        descs, labels = _clustered_descs(rng, 16, 40)
        tree = VocabTree.train(descs, branching=4, depth=2, seed=0)
        assert tree.num_words == 16
        words = tree.quantize(descs)[:, 0]
        # same-cluster descriptors should mostly share a word
        purity = 0
        for c in range(16):
            w = words[labels == c]
            purity += np.max(np.bincount(w, minlength=16))
        assert purity / len(descs) > 0.9

    def test_soft_assignment_shape(self):
        rng = np.random.default_rng(1)
        descs, _ = _clustered_descs(rng, 4, 10)
        tree = VocabTree.train(descs, branching=4, depth=2, seed=0)
        words = tree.quantize(descs, num_neighbors=3)
        assert words.shape == (len(descs), 3)
        # first column is the exact nearest word
        assert np.array_equal(words[:, 0], tree.quantize(descs)[:, 0])

    def test_beam_descent_matches_flat(self, monkeypatch):
        import pycolmap_tpu.features.retrieval as R

        rng = np.random.default_rng(2)
        descs, _ = _clustered_descs(rng, 16, 30)
        tree = VocabTree.train(descs, branching=4, depth=2, seed=0)
        flat = tree.quantize(descs)[:, 0]
        monkeypatch.setattr(R, "_FLAT_QUANT_MAX_WORDS", 1)
        beam = tree.quantize(descs, num_checks=64)[:, 0]  # full-width beam
        assert np.mean(flat == beam) > 0.95

    def test_save_load_roundtrip(self, tmp_path):
        rng = np.random.default_rng(3)
        descs, _ = _clustered_descs(rng, 4, 10)
        tree = VocabTree.train(descs, branching=2, depth=3, seed=0)
        p = tmp_path / "vocab.npz"
        tree.save(p)
        tree2 = VocabTree.load(p)
        assert tree2.branching == 2 and tree2.depth == 3
        assert np.array_equal(
            tree.quantize(descs)[:, 0], tree2.quantize(descs)[:, 0]
        )


class TestInvertedIndex:
    def test_query_ranks_shared_content_first(self):
        idx = InvertedIndex(num_words=32)
        rng = np.random.default_rng(0)
        # images 0/1 share words, image 2 disjoint
        idx.add_image(10, np.array([1, 2, 3, 4, 1, 2]))
        idx.add_image(11, np.array([1, 2, 3, 5]))
        idx.add_image(12, np.array([20, 21, 22]))
        idx.finalize()
        ranked = idx.query_row(0, 5)
        assert ranked[0][0] == 11
        assert all(m != 12 for m, _ in ranked)  # no shared words -> untouched

    def test_idf_downweights_ubiquitous_words(self):
        idx = InvertedIndex(num_words=16)
        # word 0 appears everywhere (stop word); distinctive words decide
        idx.add_image(0, np.array([0, 1]))
        idx.add_image(1, np.array([0, 1]))
        idx.add_image(2, np.array([0, 2]))
        idx.add_image(3, np.array([0, 2]))
        idx.finalize()
        ranked = idx.query_row(0, 3)
        assert ranked[0][0] == 1


def _make_place_db(db_path, place_of_image, descs_per_image=60, seed=0):
    """Database of images whose descriptors come from per-'place' clusters."""
    rng = np.random.default_rng(seed)
    n_places = max(place_of_image) + 1
    bases = rng.integers(20, 235, (n_places, descs_per_image, 128))
    cam = Camera.create(0, "SIMPLE_PINHOLE", 500.0, 640, 480)
    db = Database(db_path)
    cam_id = db.write_camera(cam)
    ids = []
    for i, place in enumerate(place_of_image):
        iid = db.write_image(Image(name=f"im{i:03d}.png", camera_id=cam_id))
        ids.append(iid)
        d = bases[place] + rng.integers(-5, 5, (descs_per_image, 128))
        db.write_keypoints(
            iid, rng.uniform(0, 480, (descs_per_image, 2)).astype(np.float32)
        )
        db.write_descriptors(iid, np.clip(d, 0, 255).astype(np.uint8))
    db.commit()
    return db, ids


class TestRetrievalPipeline:
    def test_planted_loop_recovered(self, tmp_path):
        # sequence of 30 distinct places; image 27 revisits place 3
        places = list(range(27)) + [3, 27, 28]
        db, ids = _make_place_db(tmp_path / "db.db", places)
        ranked = detect_loops(db, ids, period=1, num_images=3)
        db.close()
        hits = {
            (q, m) for q, cands in ranked for m, _ in cands
        }
        assert (ids[27], ids[3]) in hits or (ids[3], ids[27]) in hits

    def test_retrieve_pairs_groups_same_place(self, tmp_path):
        # 3 places x 3 images each
        places = [0, 0, 0, 1, 1, 1, 2, 2, 2]
        db, ids = _make_place_db(tmp_path / "db.db", places)
        pairs = retrieve_pairs(db, ids, num_images=2)
        db.close()
        assert len(pairs) > 0
        same = sum(
            1 for a, b in pairs
            if places[ids.index(a)] == places[ids.index(b)]
        )
        assert same / len(pairs) > 0.8

    def test_ranked_pairs_scores_descend(self, tmp_path):
        places = [0, 0, 1, 1]
        db, ids = _make_place_db(tmp_path / "db.db", places)
        ranked = retrieve_ranked_pairs(db, ids, num_images=3)
        db.close()
        assert len(ranked) == 4
        for _q, cands in ranked:
            scores = [s for _, s in cands]
            assert scores == sorted(scores, reverse=True)

    def test_vocab_tree_path_persists(self, tmp_path):
        places = [0, 0, 1, 1]
        db, ids = _make_place_db(tmp_path / "db.db", places)
        vt = tmp_path / "tree.npz"
        tree1, _ = build_visual_index(db, ids, vocab_tree_path=str(vt))
        assert vt.exists()
        tree2, _ = build_visual_index(db, ids, vocab_tree_path=str(vt))
        db.close()
        for l1, l2 in zip(tree1.levels, tree2.levels):
            assert np.array_equal(l1, l2)


class TestVocabTreeMatching:
    def test_match_vocabtree_e2e(self, tmp_path):
        from test_pipeline_matchers import make_feature_db

        from pycolmap_tpu.pipeline.match_features import (
            VocabTreeMatchingOptions,
            match_vocabtree,
        )

        db_path = tmp_path / "db.db"
        make_feature_db(db_path, num_images=5)
        opts = VocabTreeMatchingOptions()
        opts.num_images = 3
        n = match_vocabtree(db_path, matching_options=opts)
        assert n >= 3
        db = Database(db_path)
        assert db.num_verified_image_pairs >= 3
        db.close()

    def test_num_images_after_verification_caps(self, tmp_path):
        from test_pipeline_matchers import make_feature_db

        from pycolmap_tpu.pipeline.match_features import (
            VocabTreeMatchingOptions,
            match_vocabtree,
        )

        db_path = tmp_path / "db.db"
        make_feature_db(db_path, num_images=6)
        opts = VocabTreeMatchingOptions()
        opts.num_images = 5
        opts.num_images_after_verification = 1
        match_vocabtree(db_path, matching_options=opts)
        db = Database(db_path)
        # the cap bounds verified pairs: well under the uncapped ~n*overlap
        assert 1 <= db.num_verified_image_pairs <= 6
        db.close()


def test_loop_scene_closure_candidates(tmp_path):
    """mode='loop' synthetic scenes: sequential pairs + quadratic spacings
    exist, no wrap-around pairs, and retrieval finds the seam revisit
    (the C4/C5 loop-closure path of scripts/scale_test.py)."""
    import sqlite3

    from test_incremental_mapping import make_synthetic_database

    from pycolmap_tpu.features.retrieval import detect_loops
    from pycolmap_tpu.scene import Database

    db_path = tmp_path / "loop.db"
    make_synthetic_database(
        db_path, num_images=120, num_points=5000, mode="loop",
        match_overlap=6,
    )
    con = sqlite3.connect(db_path)
    gaps = set()
    for (pid,) in con.execute("select pair_id from two_view_geometries"):
        i1, i2 = pid // 2147483647, pid % 2147483647
        gaps.add(abs(i2 - i1))
    con.close()
    assert 1 in gaps and 6 in gaps
    # some quadratic spacing beyond the linear window (deep-band points
    # stay visible across wider separations)
    assert any(g > 6 for g in gaps)
    assert 119 not in gaps and 118 not in gaps  # no wrap-around matching

    db = Database(db_path)
    try:
        ids = [
            im.image_id
            for im in sorted(db.read_all_images(), key=lambda im: im.name)
        ]
        ranked = detect_loops(
            db, ids, period=1, num_images=3, min_sequence_gap=30,
            min_score=0.12,
        )
    finally:
        db.close()
    hits = {(q, m) for q, cands in ranked for m, _ in cands}
    # the seam: first and last frames see the same scene arc
    assert any(
        (min(q, m), max(q, m)) in {(ids[0], ids[-1]), (ids[1], ids[-1]),
                                   (ids[0], ids[-2]), (ids[1], ids[-2])}
        for q, m in hits
    )


class TestDeviceRetrievalPaths:
    """Device-side batched quantization + HKM levels (r5: retrieval moved
    on-device; these run the same jitted functions on the CPU backend)."""

    def test_quantize_batch_device_matches_flat_host(self):
        from pycolmap_tpu.features import retrieval as rt

        rng = np.random.default_rng(0)
        centers = rt._unit_rows(
            rng.normal(size=(64, 128)).astype(np.float32)
        )
        d_u8 = rng.integers(0, 256, (500, 128)).astype(np.uint8)
        got = rt.quantize_batch_device(d_u8, centers, 1)[:, 0]
        exp = np.argmax(
            rt._unit_rows(d_u8.astype(np.float32)) @ centers.T, axis=1
        )
        assert (got == exp).mean() > 0.999  # f32 tie-breaks only

    def test_quantize_batch_device_topk(self):
        from pycolmap_tpu.features import retrieval as rt

        rng = np.random.default_rng(1)
        centers = rt._unit_rows(
            rng.normal(size=(32, 128)).astype(np.float32)
        )
        d_u8 = rng.integers(0, 256, (100, 128)).astype(np.uint8)
        got = rt.quantize_batch_device(d_u8, centers, 3)
        sims = rt._unit_rows(d_u8.astype(np.float32)) @ centers.T
        exp = np.argsort(-sims, axis=1)[:, :3]
        assert (got == exp).mean() > 0.99

    def test_hkm_level_device_converges_to_clusters(self):
        import jax.numpy as jnp

        from pycolmap_tpu.features import retrieval as rt

        rng = np.random.default_rng(2)
        B, K = 4, 4
        true = rt._unit_rows(rng.normal(size=(K, 16)).astype(np.float32))
        labels = rng.integers(0, K, 256)
        descs = rt._unit_rows(
            (true[labels] + rng.normal(0, 0.05, (256, 16))).astype(
                np.float32
            )
        )
        if rt._hkm_level_jit is None:
            rt._hkm_level_jit = rt._jit_hkm_level()
        seed_idx = [np.nonzero(labels == k)[0][0] for k in range(K)]
        centers0 = descs[seed_idx]
        centers, child = rt._hkm_level_jit(
            jnp.asarray(descs), jnp.zeros(256, jnp.int32),
            jnp.asarray(centers0), B, K, 8, 4,
        )
        centers = np.asarray(centers)
        child = np.asarray(child)
        # every cluster recovered: each true center has a near-identical
        # learned center, and assignments agree with the labels
        sim = centers @ true.T
        assert (sim.max(axis=0) > 0.99).all()
        remap = sim.argmax(axis=0)
        assert (remap[labels] == child).mean() > 0.95

    def test_device_trained_tree_retrieves(self):
        """End-to-end: force the device-train path on the CPU backend and
        check retrieval quality survives."""
        from pycolmap_tpu.features import retrieval as rt

        rng = np.random.default_rng(3)
        anchors = rng.integers(20, 235, (80, 128))
        sample = rt._unit_rows(
            (
                np.repeat(anchors, 8, axis=0)
                + rng.integers(-4, 5, (640, 128))
            ).astype(np.float32)
        )
        tree = rt.VocabTree.train(
            sample, branching=4, depth=2, use_device=True
        )
        assert tree.num_words == 16
        # two noisy views of the same anchors quantize consistently
        v1 = rt._unit_rows(
            (anchors + rng.integers(-4, 5, anchors.shape)).astype(np.float32)
        )
        v2 = rt._unit_rows(
            (anchors + rng.integers(-4, 5, anchors.shape)).astype(np.float32)
        )
        w1 = tree.quantize(v1)[:, 0]
        w2 = tree.quantize(v2)[:, 0]
        assert (w1 == w2).mean() > 0.8
