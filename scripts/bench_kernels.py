"""Kernel throughput: SIFT extraction and descriptor matching on the device."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax

    from pycolmap_tpu.features import Sift, SiftExtractionOptions, match_descriptors
    from pycolmap_tpu.features.matcher import SiftMatchingOptions

    print("backend:", jax.devices()[0])
    rng = np.random.default_rng(0)

    for H, W in ((480, 640), (768, 1024)):
        img = rng.uniform(0, 1, (H, W)).astype(np.float32)
        # smooth it a bit so there are detectable blobs
        from scipy.ndimage import gaussian_filter

        img = gaussian_filter(img, 2.0)
        img = (img - img.min()) / (img.max() - img.min())
        opts = SiftExtractionOptions()
        opts.max_num_features = 4096
        sift = Sift(opts)
        kps, descs = sift.extract(img)  # compile
        t0 = time.perf_counter()
        n = 5
        for _ in range(n):
            kps, descs = sift.extract(img)
        dt = (time.perf_counter() - t0) / n
        print(
            f"SIFT {W}x{H}: {dt*1e3:.0f} ms/image ({1/dt:.1f} img/s), "
            f"{len(kps)} keypoints"
        )
        for B in (4,):
            imgs = [
                gaussian_filter(
                    rng.uniform(0, 1, (H, W)).astype(np.float32), 2.0
                )
                for _ in range(B)
            ]
            sift.extract_batch(imgs)  # compile
            t0 = time.perf_counter()
            n = 3
            for _ in range(n):
                out = sift.extract_batch(imgs)
            dt = (time.perf_counter() - t0) / n / B
            print(
                f"SIFT {W}x{H} batch={B}: {dt*1e3:.0f} ms/image "
                f"({1/dt:.1f} img/s)"
            )

    for N in (2048, 8192):
        d1 = rng.normal(size=(N, 128)).astype(np.float32)
        d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
        d2 = d1 + 0.05 * rng.normal(size=(N, 128)).astype(np.float32)
        d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
        mo = SiftMatchingOptions()
        match_descriptors(d1, d2, mo)  # compile
        t0 = time.perf_counter()
        n = 10
        for _ in range(n):
            m = match_descriptors(d1, d2, mo)
        dt = (time.perf_counter() - t0) / n
        print(
            f"match {N}x{N}: {dt*1e3:.0f} ms/pair ({1/dt:.1f} pairs/s), "
            f"{len(m)} matches"
        )


if __name__ == "__main__":
    main()
