"""Whole-extract SIFT dispatch experiments (r5): where do the ~80 ms go?

Compares, at 960x1280 u8 with pipelined unique inputs:
  A. baseline: _cached_extract(numpy) per image, sync at end (bench.py path)
  B. pre-device_put: jax.device_put all images first, then dispatch
  C. double-buffer: device_put(i+1) issued before dispatching extract(i)
  D. extract_batch (the production extract_features path after the r5
     pipelined rewrite)

Run on the real TPU: PYTHONPATH=/root/repo:/root/.axon_site python
scripts/profile_sift_dispatch.py
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax

    from pycolmap_tpu.features.sift import (
        Sift,
        SiftExtractionOptions,
        _cached_extract,
        _extract_jit,
    )

    H, W = 960, 1280

    def make_u8(seed):
        r = np.random.default_rng(seed)
        base = r.normal(0.5, 0.15, (H // 8, W // 8))
        img = np.kron(base, np.ones((8, 8))) + r.normal(0, 0.05, (H, W))
        return (np.clip(img, 0, 1) * 255).astype(np.uint8)

    s = Sift(SiftExtractionOptions())
    imgs = [make_u8(i) for i in range(16)]
    params = s._static_params(H, W)
    print("warm (first call may compile)...", flush=True)
    t0 = time.perf_counter()
    out = _cached_extract(_extract_jit, "sift1", imgs[0], params)
    jax.block_until_ready(out)
    print(f"warm call: {time.perf_counter() - t0:.1f}s", flush=True)

    def run_A(idxs):
        t0 = time.perf_counter()
        outs = [
            _cached_extract(_extract_jit, "sift1", imgs[i], params)
            for i in idxs
        ]
        for o in outs:
            jax.block_until_ready(o)
        return (time.perf_counter() - t0) / len(idxs)

    def run_B(idxs):
        t0 = time.perf_counter()
        dev = [jax.device_put(imgs[i]) for i in idxs]
        outs = [_cached_extract(_extract_jit, "sift1", d, params) for d in dev]
        for o in outs:
            jax.block_until_ready(o)
        return (time.perf_counter() - t0) / len(idxs)

    def run_C(idxs):
        t0 = time.perf_counter()
        outs = []
        nxt = jax.device_put(imgs[idxs[0]])
        for j, i in enumerate(idxs):
            cur = nxt
            if j + 1 < len(idxs):
                nxt = jax.device_put(imgs[idxs[j + 1]])
            outs.append(_cached_extract(_extract_jit, "sift1", cur, params))
        for o in outs:
            jax.block_until_ready(o)
        return (time.perf_counter() - t0) / len(idxs)

    def run_D(idxs):
        t0 = time.perf_counter()
        s.extract_batch([imgs[i] for i in idxs])
        return (time.perf_counter() - t0) / len(idxs)

    for name, fn in (("A base", run_A), ("B preput", run_B),
                     ("C dbl-buf", run_C), ("D batchAPI", run_D)):
        # unique input sets per rep defeat the tunnel result cache
        r1 = fn([1, 2, 3, 4, 5, 6])
        r2 = fn([7, 8, 9, 10, 11, 12])
        r3 = fn([13, 14, 15, 2, 4, 6])
        print(
            f"{name}: {min(r1, r2, r3) * 1e3:.1f} ms/img "
            f"(reps {r1*1e3:.0f}/{r2*1e3:.0f}/{r3*1e3:.0f})",
            flush=True,
        )

    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
