"""Visual retrieval: k-means vocabulary + TF-IDF scoring for pair selection.

TPU-native stand-in for the reference's HKM vocab-tree retrieval
(ref: pipeline/match_features.h:177-214 VocabTreeMatchingOptions; upstream
colmap/retrieval). Instead of loading a pretrained vocab-tree file, the
vocabulary is trained on the fly from the database's own descriptors with a
few batched k-means iterations (assignment = one MXU matmul), then images are
scored by cosine similarity of their TF-IDF bag-of-words vectors.
"""

from __future__ import annotations

import numpy as np

from pycolmap_tpu.features.matcher import _to_unit_float


def _kmeans(descs: np.ndarray, k: int, iters: int = 10, seed: int = 0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    idx = rng.choice(len(descs), size=min(k, len(descs)), replace=False)
    centers = descs[idx].copy()
    d = jnp.asarray(descs)
    for _ in range(iters):
        c = jnp.asarray(centers)
        sim = jnp.dot(d, c.T, preferred_element_type=jnp.float32)
        assign = np.asarray(jnp.argmax(sim, axis=1))
        for j in range(len(centers)):
            sel = descs[assign == j]
            if len(sel):
                v = sel.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 1e-12:
                    centers[j] = v / n
    return centers


def _quantize(descs: np.ndarray, centers: np.ndarray) -> np.ndarray:
    import jax.numpy as jnp

    sim = jnp.dot(
        jnp.asarray(descs), jnp.asarray(centers).T, preferred_element_type=jnp.float32
    )
    return np.asarray(jnp.argmax(sim, axis=1))


def build_bow_index(db, image_ids, num_words: int = 256, max_num_features: int = -1,
                    seed: int = 0):
    """Train vocabulary + compute TF-IDF vectors for all images."""
    sample = []
    per_image_descs = {}
    rng = np.random.default_rng(seed)
    for iid in image_ids:
        d = _to_unit_float(db.read_descriptors(iid))
        if max_num_features > 0 and len(d) > max_num_features:
            d = d[rng.choice(len(d), max_num_features, replace=False)]
        per_image_descs[iid] = d
        if len(d):
            take = min(len(d), 512)
            sample.append(d[rng.choice(len(d), take, replace=False)])
    if not sample:
        return None, {}
    sample = np.concatenate(sample)
    k = min(num_words, len(sample))
    centers = _kmeans(sample, k, seed=seed)

    # TF vectors
    tf = {}
    df = np.zeros(len(centers))
    for iid, d in per_image_descs.items():
        if len(d) == 0:
            tf[iid] = np.zeros(len(centers), dtype=np.float32)
            continue
        words = _quantize(d, centers)
        hist = np.bincount(words, minlength=len(centers)).astype(np.float32)
        tf[iid] = hist / max(hist.sum(), 1)
        df += hist > 0
    idf = np.log(max(len(image_ids), 1) / np.maximum(df, 1))
    vecs = {}
    for iid, t in tf.items():
        v = t * idf
        n = np.linalg.norm(v)
        vecs[iid] = v / n if n > 1e-12 else v
    return centers, vecs


def retrieve_pairs(db, image_ids, num_images: int = 100,
                   max_num_features: int = -1) -> list:
    """Top-num_images most similar images per query -> pair list."""
    _, vecs = build_bow_index(db, image_ids, max_num_features=max_num_features)
    if not vecs:
        return []
    ids = [i for i in image_ids if i in vecs]
    V = np.stack([vecs[i] for i in ids])
    sim = V @ V.T
    np.fill_diagonal(sim, -np.inf)
    pairs = set()
    for a in range(len(ids)):
        order = np.argsort(-sim[a])[:num_images]
        for b in order:
            if np.isfinite(sim[a, b]):
                pairs.add((min(ids[a], ids[b]), max(ids[a], ids[b])))
    return sorted(pairs)


def detect_loops(db, ordered_image_ids, period: int = 10, num_images: int = 50):
    """Loop-closure candidates for sequential matching: every `period`-th
    image queries the BoW index (ref: SequentialMatchingOptions loop_*)."""
    _, vecs = build_bow_index(db, ordered_image_ids)
    if not vecs:
        return []
    ids = [i for i in ordered_image_ids if i in vecs]
    V = np.stack([vecs[i] for i in ids])
    sim = V @ V.T
    pairs = set()
    pos = {iid: k for k, iid in enumerate(ids)}
    for k in range(0, len(ids), max(period, 1)):
        order = np.argsort(-sim[k])[: num_images + 1]
        for b in order:
            if b == k:
                continue
            # loops = far-apart in sequence order
            if abs(b - k) > 20:
                pairs.add((min(ids[k], ids[b]), max(ids[k], ids[b])))
    return sorted(pairs)
