"""Feature tests: SIFT extraction contract + matcher semantics."""

import numpy as np
import pytest

from pycolmap_tpu.features import (
    Sift,
    SiftExtractionOptions,
    SiftMatchingOptions,
    match_descriptors,
    match_guided,
)


def blob_image(seed=0, H=200, W=260, n=40):
    rng = np.random.default_rng(seed)
    img = np.zeros((H, W), dtype=np.float32)
    y, x = np.mgrid[0:H, 0:W]
    for _ in range(n):
        cx, cy = rng.uniform(20, W - 20), rng.uniform(20, H - 20)
        sigma = rng.uniform(2, 6)
        amp = rng.uniform(0.3, 1.0) * rng.choice([-1, 1])
        img += amp * np.exp(-((x - cx) ** 2 + (y - cy) ** 2) / (2 * sigma**2))
    return (img - img.min()) / (img.max() - img.min())


@pytest.fixture(scope="module")
def sift():
    opts = SiftExtractionOptions()
    opts.max_num_features = 1000
    return Sift(opts)


class TestSift:
    def test_contract(self, sift):
        """Nx4 keypoints + Nx128 ~unit-norm descriptors (feature/sift.h:68-79)."""
        kps, descs = sift.extract(blob_image())
        assert kps.ndim == 2 and kps.shape[1] == 4
        assert descs.shape == (len(kps), 128)
        assert len(kps) > 20
        norms = np.linalg.norm(descs, axis=1)
        # descriptors are uint8-quantized on device (ref storage format,
        # feature/sift.h:76-78): ~unit norm within quantization error
        assert np.all(np.abs(norms - 1.0) < 5e-3)
        # keypoints inside the image
        assert np.all(kps[:, 0] >= 0) and np.all(kps[:, 0] < 260)
        assert np.all(kps[:, 2] > 0)  # positive scales

    def test_uint8_and_float_inputs_agree(self, sift):
        img = blob_image(1)
        kps_f, _ = sift.extract(img)
        kps_u, _ = sift.extract((img * 255).astype(np.uint8))
        assert abs(len(kps_f) - len(kps_u)) <= max(3, 0.05 * len(kps_f))

    def test_affine_shape(self):
        """estimate_affine_shape: valid shapes, still matchable features."""
        from pycolmap_tpu.features import match_descriptors as md

        opts = SiftExtractionOptions()
        opts.max_num_features = 800
        opts.estimate_affine_shape = True
        s = Sift(opts)
        img = blob_image(7)
        kps, descs = s.extract(img)
        assert len(kps) > 20
        assert np.isfinite(descs).all()
        # affine-adapted features still match across a small shift
        kps2, descs2 = s.extract(np.roll(img, 4, axis=1))
        m = md(descs, descs2)
        assert len(m) > 0.4 * min(len(kps), len(kps2))

    def test_extract_batch_matches_single(self, sift):
        """vmapped batch path returns the same features as per-image calls."""
        imgs = [blob_image(s) for s in (3, 4, 5)]
        singles = [sift.extract(im) for im in imgs]
        batched = sift.extract_batch(imgs)
        for (k1, d1), (k2, d2) in zip(singles, batched):
            assert len(k1) == len(k2)
            np.testing.assert_allclose(k1, k2, atol=1e-3)
            np.testing.assert_allclose(d1, d2, atol=2e-3)

    def test_shift_repeatability(self, sift):
        img = blob_image(2)
        kps1, d1 = sift.extract(img)
        shift = 5
        kps2, d2 = sift.extract(np.roll(img, shift, axis=1))
        m = match_descriptors(d1, d2)
        assert len(m) > 0.5 * min(len(kps1), len(kps2))
        dx = kps2[m[:, 1], 0] - kps1[m[:, 0], 0]
        good = np.abs(dx - shift) < 1.5
        assert good.mean() > 0.85


class TestMatcher:
    def test_exact_self_match(self):
        rng = np.random.default_rng(0)
        d = rng.normal(size=(50, 128)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        opts = SiftMatchingOptions()
        opts.max_ratio = 0.99
        m = match_descriptors(d, d, opts)
        assert len(m) == 50
        assert np.all(m[:, 0] == m[:, 1])

    def test_ratio_test_rejects_ambiguous(self):
        rng = np.random.default_rng(1)
        base = rng.normal(size=128).astype(np.float32)
        base /= np.linalg.norm(base)
        # two targets at equal, noticeable distance from the query on
        # opposite sides -> ratio = 1 -> rejected by the 0.8 ratio test
        perp = rng.normal(size=128).astype(np.float32)
        perp -= perp @ base * base
        perp /= np.linalg.norm(perp)
        t1 = base + 0.2 * perp
        t2 = base - 0.2 * perp
        d2 = np.stack([t1 / np.linalg.norm(t1), t2 / np.linalg.norm(t2)])
        m = match_descriptors(base[None], d2)
        assert len(m) == 0

    def test_batch_matches_single(self):
        """match_descriptors_batch agrees with per-pair match_descriptors
        across mixed sizes (shape-bucket grouping + padding masks)."""
        from pycolmap_tpu.features.matcher import match_descriptors_batch

        rng = np.random.default_rng(5)
        pairs = []
        for n1, n2 in [(50, 80), (300, 300), (40, 500), (80, 50), (0, 60)]:
            d1 = rng.normal(size=(n1, 128)).astype(np.float32)
            d2 = rng.normal(size=(n2, 128)).astype(np.float32)
            # plant shared descriptors so real matches exist
            k = min(n1, n2) // 2
            if k:
                d2[:k] = d1[:k] + rng.normal(0, 0.05, (k, 128))
            pairs.append((d1, d2))
        batch = match_descriptors_batch(pairs)
        for (d1, d2), mb in zip(pairs, batch):
            ms = match_descriptors(d1, d2)
            assert np.array_equal(np.asarray(mb), np.asarray(ms))

    def test_cross_check(self):
        rng = np.random.default_rng(2)
        d1 = rng.normal(size=(30, 128)).astype(np.float32)
        d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
        d2 = np.concatenate([d1, d1[:1] + 0.001])  # duplicate breaks symmetry
        d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
        opts = SiftMatchingOptions()
        opts.cross_check = True
        m = match_descriptors(d1, d2, opts)
        assert len(m) <= 30

    def test_uint8_descriptors(self):
        rng = np.random.default_rng(3)
        d = rng.normal(size=(40, 128)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        d_u8 = np.clip(np.round(d * 512), 0, 255).astype(np.uint8)
        opts = SiftMatchingOptions()
        opts.max_ratio = 0.99
        m = match_descriptors(d_u8, d_u8, opts)
        assert len(m) >= 35
