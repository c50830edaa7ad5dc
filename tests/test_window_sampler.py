"""Window-sampler Pallas kernel vs the XLA bilinear-gather reference.

The kernel runs in interpreter mode here (tests are CPU); the compiled
path is exercised on TPU by scripts/bench_kernels.py and the e2e scale runs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pycolmap_tpu.features import window_sampler as ws


def _make_case(rng, K=16, G=16, H=480, W=640, support=28.0, edge=False):
    vol = rng.normal(size=(2, H, W)).astype(np.float32)
    volp = np.asarray(ws.pad_volume(jnp.asarray(vol)))
    if edge:
        cx = rng.uniform(-10, W + 10, (K, 1, 1))
        cy = rng.uniform(1, H - 2, (K, 1, 1))
    else:
        cx = rng.uniform(support + 2, W - support - 2, (K, 1, 1))
        cy = rng.uniform(support + 2, H - support - 2, (K, 1, 1))
    off = rng.uniform(-support, support, (2, K, G, G))
    xs = (cx + off[0]).astype(np.float32)
    ys = np.clip(cy + off[1], 0.0, H - 1.001).astype(np.float32)
    ch0 = np.zeros(K, np.int32)
    return volp, ch0, ys, xs


@pytest.mark.parametrize("edge", [False, True])
def test_sampler_matches_reference(edge):
    rng = np.random.default_rng(3)
    volp, ch0, ys, xs = _make_case(rng, edge=edge)
    wins = ws.window_sizes(28.0)
    assert wins is not None
    out0, out1 = ws.sample_windows(
        jnp.asarray(volp), jnp.asarray(ch0), jnp.asarray(ys), jnp.asarray(xs),
        *wins, interpret=True,
    )
    ref0, ref1 = ws.sample_windows_reference(
        jnp.asarray(volp), jnp.asarray(ch0), jnp.asarray(ys), jnp.asarray(xs)
    )
    np.testing.assert_allclose(np.asarray(out0), np.asarray(ref0), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(ref1), atol=2e-5)


def test_sampler_channel_pairs():
    """Batched use: per-keypoint channel base selects the right image."""
    rng = np.random.default_rng(5)
    H, W, K, G = 256, 384, 8, 16
    vols = rng.normal(size=(4, H, W)).astype(np.float32)  # 2 images x 2 ch
    volp = np.asarray(ws.pad_volume(jnp.asarray(vols)))
    cx = rng.uniform(30, W - 30, (K, 1, 1))
    cy = rng.uniform(30, H - 30, (K, 1, 1))
    off = rng.uniform(-20, 20, (2, K, G, G))
    xs = (cx + off[0]).astype(np.float32)
    ys = (cy + off[1]).astype(np.float32)
    ch0 = (2 * (np.arange(K) % 2)).astype(np.int32)
    wins = ws.window_sizes(20.0)
    out0, out1 = ws.sample_windows(
        jnp.asarray(volp), jnp.asarray(ch0), jnp.asarray(ys), jnp.asarray(xs),
        *wins, interpret=True,
    )
    ref0, ref1 = ws.sample_windows_reference(
        jnp.asarray(volp), jnp.asarray(ch0), jnp.asarray(ys), jnp.asarray(xs)
    )
    np.testing.assert_allclose(np.asarray(out0), np.asarray(ref0), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(ref1), atol=2e-5)


def test_sampler_bf16_close():
    """bf16 packed-matmul path stays within quantization-irrelevant error
    of the f32 reference (default on TPU; see _bf16_default)."""
    rng = np.random.default_rng(7)
    volp, ch0, ys, xs = _make_case(rng)
    wins = ws.window_sizes(28.0)
    out0, out1 = ws.sample_windows(
        jnp.asarray(volp), jnp.asarray(ch0), jnp.asarray(ys), jnp.asarray(xs),
        *wins, interpret=True, bf16=True,
    )
    ref0, ref1 = ws.sample_windows_reference(
        jnp.asarray(volp), jnp.asarray(ch0), jnp.asarray(ys), jnp.asarray(xs)
    )
    # bf16 rel err ~0.4%; gradient magnitudes are O(1) here
    np.testing.assert_allclose(np.asarray(out0), np.asarray(ref0), atol=0.05)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(ref1), atol=0.05)


def test_window_sizes_gating():
    assert ws.window_sizes(30.0) == (72, 256)
    wy, wx = ws.window_sizes(75.0)
    assert wy >= 2 * 75 + 2 and wx in (256, 384, 512)
    assert ws.window_sizes(300.0) is None  # falls back to XLA path
