"""SIFT feature extraction as batched JAX/XLA kernels.

TPU-native replacement for the reference's VLFeat-CPU / SiftGPU extractors
(ref: pycolmap/feature/sift.h:31-118, pipeline/extract_features.h:64-139).
Contract matches ``Sift.extract`` (feature/sift.h:41-80): grayscale array in,
(keypoints Nx4 [x, y, scale, orientation], descriptors Nx128 float ~unit
norm) out.

Design (fixed shapes everywhere — XLA-friendly):
- Gaussian pyramid: separable convolutions (XLA conv = MXU work);
- DoG extrema: 3x3x3 max/min via reduce_window, thresholds as masks;
- subpixel refinement: one 3x3x3 quadratic fit (closed-form 3x3 solve);
- per-octave top-K keypoint budget by scale (COLMAP keeps largest-scale
  features when over budget), padded with a validity mask;
- orientation histograms and 4x4x8 descriptors from a fixed 16x16 sample
  grid bilinearly gathered at scale-dependent positions — one gather +
  einsum per octave instead of VLFeat's per-keypoint loops;
- L1_ROOT / L2 normalization (ref: extract_features.h Normalization).

Every stage is jit; per-image-resolution compilation is cached.
"""

from __future__ import annotations

import enum
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from pycolmap_tpu.utils.options import BaseOptions, options_dataclass


class Normalization(enum.IntEnum):
    L1_ROOT = 0
    L2 = 1


@options_dataclass
class SiftExtractionOptions(BaseOptions):
    """Defaults mirror reference SiftExtractionOptions (extract_features.h:64-139)."""

    max_image_size: int = 3200
    max_num_features: int = 8192
    first_octave: int = -1
    num_octaves: int = 4
    octave_resolution: int = 3
    peak_threshold: float = 0.02 / 3
    edge_threshold: float = 10.0
    estimate_affine_shape: bool = False
    upright: bool = False
    darkness_adaptivity: bool = False
    domain_size_pooling: bool = False
    dsp_min_scale: float = 1.0 / 6
    dsp_max_scale: float = 3.0
    dsp_num_scales: int = 10
    normalization: Normalization = Normalization.L1_ROOT
    max_num_orientations: int = 2
    num_threads: int = -1
    use_gpu: bool = True
    gpu_index: str = "-1"


_SIGMA0 = 1.6  # base blur of octave level 0
_SIGMA_N = 0.5  # nominal blur of the input image
_ORI_BINS = 36
_DESC_SPATIAL = 4  # 4x4 descriptor bins
_DESC_ORI = 8
_GRID = 16  # sample grid per side for orientation/descriptor


def _gaussian_kernel1d(sigma: float):
    radius = max(int(math.ceil(4.0 * sigma)), 1)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _band_matrix(n: int, k: np.ndarray, dtype):
    """Banded Toeplitz [n, n] from symmetric taps k (edge-renormalized).

    Gaussian blur as a dense matmul: single-channel conv_general_dilated
    runs ~1% of peak on TPU (no channels for the MXU to tile), while an
    [H, W] x [W, W] contraction is pure systolic work — measured 80 ms ->
    ~2 ms for a 960x1280 octave build. Rows renormalize so edges match
    replicate padding closely."""
    r = (len(k) - 1) // 2
    i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    off = j - i
    # unrolled tap comparisons: a take() here is a [n*n]-index gather,
    # which TPUs run at <1 GB/s
    B = jnp.zeros((n, n), jnp.float32)
    for t in range(len(k)):
        B = B + jnp.where(off == t - r, float(k[t]), 0.0)
    B = B.astype(dtype)
    return B / jnp.sum(B, axis=1, keepdims=True)


def _blur(img, sigma: float):
    """Separable Gaussian blur of [..., H, W] via two banded matmuls (MXU)."""
    if sigma < 1e-6:
        return img
    k = _gaussian_kernel1d(sigma)
    H, W = img.shape[-2], img.shape[-1]
    BW = _band_matrix(W, k, img.dtype)
    BH = _band_matrix(H, k, img.dtype)
    out = jnp.einsum("...hw,wv->...hv", img, BW)
    return jnp.einsum("hu,...uw->...hw", BH, out)


def _upsample2(img):
    h, w = img.shape
    return jax.image.resize(img, (2 * h, 2 * w), method="bilinear")


def _downsample2(img):
    return img[::2, ::2]


def _build_octave(base, S: int):
    """base: level-0 gaussian of the octave. Returns gauss [S+3, H, W].

    Every level is blurred DIRECTLY from the base (Gaussian semigroup:
    blur(base, sqrt(sigma_s^2 - sigma_0^2))) instead of chaining level ->
    level: the levels become independent, so both separable passes run as
    ONE batched [L, W, W] / [L, H, H] MXU contraction instead of S+2
    dependent matmul pairs (the chain serializes the MXU and was the
    dominant build cost). Numerics differ from the incremental chain only
    by discrete-kernel composition error (<<DoG peak threshold)."""
    H, W = base.shape
    deltas = [
        math.sqrt(max((_SIGMA0 * 2.0 ** (s / S)) ** 2 - _SIGMA0**2, 1e-8))
        for s in range(1, S + 3)
    ]
    kernels = [_gaussian_kernel1d(d) for d in deltas]
    BW = jnp.stack([_band_matrix(W, k, base.dtype) for k in kernels])
    BH = jnp.stack([_band_matrix(H, k, base.dtype) for k in kernels])
    tmp = jnp.einsum("hw,lwv->lhv", base, BW)  # [L-1, H, W]
    out = jnp.einsum("lhu,luv->lhv", BH, tmp)
    return jnp.concatenate([base[None], out])


def _detect_octave(gauss, dog, S: int, peak_threshold, edge_threshold, max_kps: int):
    """One octave: detect + refine extrema.

    Returns (xys [K, 3] (x, y, level_float) in octave coords, scale_rel [K],
    response [K], mask [K]).
    """
    L, H, W = dog.shape

    # 3D extremum test, separable shift-max/min (3D reduce_window lowers
    # poorly on TPU; three roll-max passes are plain VPU sweeps). roll
    # wrap-around only affects border rows/cols/levels, all excluded below.
    def _nb(a, op):
        for ax in (0, 1, 2):
            a = op(a, op(jnp.roll(a, 1, axis=ax), jnp.roll(a, -1, axis=ax)))
        return a

    mx = _nb(dog, jnp.maximum)
    mn = _nb(dog, jnp.minimum)
    is_ext = ((dog >= mx) | (dog <= mn)) & (jnp.abs(dog) > 0.8 * peak_threshold)
    # restrict to interior
    lev = jax.lax.broadcasted_iota(jnp.int32, dog.shape, 0)
    row = jax.lax.broadcasted_iota(jnp.int32, dog.shape, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, dog.shape, 2)
    border = 4
    interior = (
        (lev >= 1) & (lev <= S)
        & (row >= border) & (row < H - border)
        & (col >= border) & (col < W - border)
    )
    is_ext = is_ext & interior

    # finite-difference derivatives (full grids; cheap vector ops)
    def shift(a, dl, dr, dc):
        return jnp.roll(a, (-dl, -dr, -dc), axis=(0, 1, 2))

    d = dog
    gl = 0.5 * (shift(d, 1, 0, 0) - shift(d, -1, 0, 0))
    gr = 0.5 * (shift(d, 0, 1, 0) - shift(d, 0, -1, 0))
    gc = 0.5 * (shift(d, 0, 0, 1) - shift(d, 0, 0, -1))
    hll = shift(d, 1, 0, 0) + shift(d, -1, 0, 0) - 2 * d
    hrr = shift(d, 0, 1, 0) + shift(d, 0, -1, 0) - 2 * d
    hcc = shift(d, 0, 0, 1) + shift(d, 0, 0, -1) - 2 * d
    hlr = 0.25 * (
        shift(d, 1, 1, 0) + shift(d, -1, -1, 0) - shift(d, 1, -1, 0) - shift(d, -1, 1, 0)
    )
    hlc = 0.25 * (
        shift(d, 1, 0, 1) + shift(d, -1, 0, -1) - shift(d, 1, 0, -1) - shift(d, -1, 0, 1)
    )
    hrc = 0.25 * (
        shift(d, 0, 1, 1) + shift(d, 0, -1, -1) - shift(d, 0, 1, -1) - shift(d, 0, -1, 1)
    )

    # solve 3x3 H x = -g in closed form on component planes (order: level,
    # row, col). NOTE: jnp.linalg.solve here would batch-LU [L,H,W,3,3]
    # arrays whose 3x3 minor dims pad to (4,128) TPU tiles — a measured 57x
    # memory expansion (~12 GB at 640x480) that OOMs the chip. The cofactor
    # form is pure elementwise math on full-size planes.
    a, b_, c_ = hll + 1e-6, hlr, hlc
    d2, e_ = hrr + 1e-6, hrc
    f_ = hcc + 1e-6
    # symmetric H = [[a, b, c], [b, d, e], [c, e, f]]
    A = d2 * f_ - e_ * e_
    B = c_ * e_ - b_ * f_
    C = b_ * e_ - c_ * d2
    D = a * f_ - c_ * c_
    E = b_ * c_ - a * e_
    F = a * d2 - b_ * b_
    det = a * A + b_ * B + c_ * C
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    off_l = -(A * gl + B * gr + C * gc) / det
    off_r = -(B * gl + D * gr + E * gc) / det
    off_c = -(C * gl + E * gr + F * gc) / det
    offset = jnp.stack([off_l, off_r, off_c], axis=-1)
    g = jnp.stack([gl, gr, gc], axis=-1)
    offset = jnp.clip(offset, -0.5, 0.5)
    refined = d + 0.5 * jnp.sum(g * offset, axis=-1)

    # edge response on the spatial 2x2 Hessian
    tr = hrr + hcc
    det = hrr * hcc - hrc * hrc
    r = edge_threshold
    edge_ok = (det > 0) & (tr * tr * r < (r + 1) ** 2 * det)

    valid = is_ext & edge_ok & (jnp.abs(refined) > peak_threshold)

    # per-octave top-K by scale (then response) — COLMAP keeps largest scales.
    # approx_max_k: hardware-binned selection, ~10x faster than the full
    # sort top_k over the L*H*W volume; recall loss only reorders which of
    # the lowest-scale keypoints survive the budget
    lev_f = lev.astype(jnp.float32) + offset[..., 0]
    scale_rel = _SIGMA0 * (2.0 ** (lev_f / S))  # in octave pixel units
    sel_key = jnp.where(valid, scale_rel, -jnp.inf).reshape(-1)
    topv, topi = jax.lax.approx_max_k(sel_key, max_kps, recall_target=0.95)
    mask = jnp.isfinite(topv) & (topv > 0)

    li = topi // (H * W)
    ri = (topi % (H * W)) // W
    ci = topi % W
    off_sel = offset.reshape(-1, 3)[topi]
    x = ci.astype(jnp.float32) + off_sel[:, 2]
    y = ri.astype(jnp.float32) + off_sel[:, 1]
    lev_sel = li.astype(jnp.float32) + off_sel[:, 0]
    resp = refined.reshape(-1)[topi]
    scale_sel = _SIGMA0 * (2.0 ** (lev_sel / S))
    level_idx = jnp.clip(jnp.round(lev_sel).astype(jnp.int32), 1, S)
    return x, y, lev_sel, level_idx, scale_sel, resp, mask


def _bilinear_gather(img, ys, xs):
    """img [H, W] or [H, W, C]; ys/xs [...] float coords. Zero pad outside."""
    H, W = img.shape[0], img.shape[1]
    chan = img.ndim == 3
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    dx = xs - x0
    dy = ys - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    if chan:
        dx = dx[..., None]
        dy = dy[..., None]

    def get(yi, xi):
        ok = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yi = jnp.clip(yi, 0, H - 1)
        xi = jnp.clip(xi, 0, W - 1)
        vals = img[yi, xi]
        return jnp.where(ok[..., None] if chan else ok, vals, 0.0)

    return (
        get(y0i, x0i) * (1 - dy) * (1 - dx)
        + get(y0i, x0i + 1) * (1 - dy) * dx
        + get(y0i + 1, x0i) * dy * (1 - dx)
        + get(y0i + 1, x0i + 1) * dy * dx
    )


def _octave_gradients(gauss):
    """Central-difference gradients, channel-major flat volume [2, L*H, W(p)].

    Magnitude/angle are computed AT THE SAMPLED POINTS, not here: arctan2
    over the full volume cost ~30 ms/octave on TPU and bilinear
    interpolation of wrapped angles is wrong across the ±pi seam anyway —
    interpolating (gx, gy) then taking atan2 is both faster and correct.
    The [2, L*H, W] layout feeds the Pallas window sampler (one channel-pair
    DMA per keypoint); rows/cols are zero-padded to its alignment."""
    from pycolmap_tpu.features.window_sampler import pad_volume

    L, H, W = gauss.shape
    gx = 0.5 * (jnp.roll(gauss, -1, axis=2) - jnp.roll(gauss, 1, axis=2))
    gy = 0.5 * (jnp.roll(gauss, -1, axis=1) - jnp.roll(gauss, 1, axis=1))
    return pad_volume(jnp.stack([gx, gy]).reshape(2, L * H, W))


def _max_scale_rel(S: int) -> float:
    """Static bound on scale_rel: lev_sel <= S + 0.5 (see _detect_octave)."""
    return _SIGMA0 * 2.0 ** ((S + 0.5) / S)


def _sample_grad(grad2, H, W, level_idx, sy, sx, support_px: float):
    """Sample (gx, gy) at per-keypoint grid positions from the flat volume.

    grad2: [2, LHp, Wp] padded channel-major gradients; level_idx [K];
    sy/sx [K, G, G] level-local coords; support_px: static bound on
    |sample - keypoint| in px, selects the Pallas window size (falls back
    to the XLA gather path on CPU or oversized supports). sy is clamped
    inside the level so the bilinear footprint cannot bleed across level
    boundaries (vol[level] under vmap would materialize per-keypoint level
    copies — measured 25 GB at 1024x768 with 2048 keypoints).
    """
    from pycolmap_tpu.features import window_sampler as ws

    ys = jnp.clip(sy, 0.0, H - 1.001) + level_idx[:, None, None].astype(
        jnp.float32
    ) * H
    ch0 = jnp.zeros(level_idx.shape, jnp.int32)
    wins = ws.window_sizes(support_px)
    if wins is None or not ws._use_pallas():
        return ws.sample_windows_reference(grad2, ch0, ys, sx)
    return ws.sample_windows(grad2, ch0, ys, sx, *wins)


def _orientations(grad2, H, W, S, x, y, level_idx, scale_rel, mask,
                  max_num_orientations, affine=None):
    """36-bin Gaussian-weighted orientation histogram per keypoint.

    grad2: [2, LHp, Wp] flat channel-major gradients; affine: optional
    [K, 2, 2] shape matrices — sampling and gradients move to the
    affine-normalized frame (VLFeat covdet computes orientations after
    shape adaptation). Returns (orients [K, O], ori_mask).
    """
    K = x.shape[0]
    G = _GRID
    win_factor = 1.5
    radius = 3.0 * win_factor * scale_rel  # [K]
    support = 3.0 * win_factor * _max_scale_rel(S) * (2.45 if affine is not None else 1.0)
    # fixed sample grid in [-1, 1]
    u = (jnp.arange(G, dtype=jnp.float32) + 0.5) / G * 2.0 - 1.0
    uu, vv = jnp.meshgrid(u, u)  # [G, G]
    if affine is None:
        sx = x[:, None, None] + radius[:, None, None] * uu[None]
        sy = y[:, None, None] + radius[:, None, None] * vv[None]
    else:
        A = affine
        sx = x[:, None, None] + radius[:, None, None] * (
            A[:, 0, 0, None, None] * uu[None] + A[:, 0, 1, None, None] * vv[None]
        )
        sy = y[:, None, None] + radius[:, None, None] * (
            A[:, 1, 0, None, None] * uu[None] + A[:, 1, 1, None, None] * vv[None]
        )

    # one windowed sample pass per keypoint, then mag/angle on samples
    g0, g1 = _sample_grad(grad2, H, W, level_idx, sy, sx, support)
    if affine is not None:
        A = affine
        gx = A[:, 0, 0, None, None] * g0 + A[:, 1, 0, None, None] * g1
        gy = A[:, 0, 1, None, None] * g0 + A[:, 1, 1, None, None] * g1
        g0, g1 = gx, gy
    m = jnp.sqrt(g0**2 + g1**2 + 1e-12)
    a = jnp.arctan2(g1, g0)
    # Gaussian weight in window coords
    dist2 = uu[None] ** 2 + vv[None] ** 2
    w = jnp.exp(-dist2 / (2 * (2.0 / 3.0) ** 2))  # sigma = 1.5σ over radius 4.5σ
    wm = m * w[None]
    # histogram: soft-assign to 36 bins
    bins = (a / (2 * jnp.pi) + 0.5) * _ORI_BINS  # [K,G,G] in [0,36)
    b0 = jnp.floor(bins - 0.5)
    frac = bins - 0.5 - b0
    b0i = jnp.mod(b0.astype(jnp.int32), _ORI_BINS)
    b1i = jnp.mod(b0i + 1, _ORI_BINS)
    # unrolled-bin reduction: per bin, one [K, G*G] masked sum on the VPU.
    # The one-hot formulation materialized two [K, 256, 36] f32 tensors and
    # contracted them as K tiny-batched gemms (~1% MXU utilization — the
    # einsum pattern ARCHITECTURE.md warns about).
    flat_w0 = (wm * (1 - frac)).reshape(K, -1)
    flat_w1 = (wm * frac).reshape(K, -1)
    b0f = b0i.reshape(K, -1)
    b1f = b1i.reshape(K, -1)
    hist = jnp.stack(
        [
            jnp.sum(
                flat_w0 * (b0f == b) + flat_w1 * (b1f == b), axis=1
            )
            for b in range(_ORI_BINS)
        ],
        axis=1,
    )  # [K, 36]
    # smooth histogram (6 passes of [1/3,1/3,1/3], as in VLFeat)
    for _ in range(6):
        hist = (jnp.roll(hist, 1, axis=1) + hist + jnp.roll(hist, -1, axis=1)) / 3.0
    # peaks
    left = jnp.roll(hist, 1, axis=1)
    right = jnp.roll(hist, -1, axis=1)
    hmax = jnp.max(hist, axis=1, keepdims=True)
    is_peak = (hist > left) & (hist > right) & (hist >= 0.8 * hmax)
    # top-O peaks by value
    peak_val = jnp.where(is_peak, hist, -jnp.inf)
    top_vals, top_bins = jax.lax.top_k(peak_val, max_num_orientations)
    ori_mask = jnp.isfinite(top_vals) & mask[:, None]
    # parabolic interpolation
    hl = jnp.take_along_axis(hist, jnp.mod(top_bins - 1, _ORI_BINS), axis=1)
    hc = jnp.take_along_axis(hist, top_bins, axis=1)
    hr = jnp.take_along_axis(hist, jnp.mod(top_bins + 1, _ORI_BINS), axis=1)
    denom = hl - 2 * hc + hr
    di = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (hl - hr) / denom, 0.0)
    bin_f = top_bins.astype(jnp.float32) + di
    theta = (bin_f + 0.5) / _ORI_BINS * 2 * jnp.pi - jnp.pi
    return theta, ori_mask


def _affine_shapes(grad2, H, W, S, x, y, level_idx, scale_rel, mask,
                   num_iters: int = 5):
    """Second-moment affine shape adaptation (VLFeat covdet
    AffineShapeEstimator semantics; ref: extract_features.h
    estimate_affine_shape option).

    Iterates A <- A @ mu^{-1/2} where mu is the Gaussian-windowed second
    moment matrix of the affinely-warped patch, normalized to det(A) = 1.
    Returns (A [K, 2, 2], ok [K]): ok marks converged, well-conditioned
    shapes (anisotropy <= 6, upstream rejection threshold).
    """
    G = _GRID
    u = (jnp.arange(G, dtype=jnp.float32) + 0.5) / G * 2.0 - 1.0
    uu, vv = jnp.meshgrid(u, u)
    w = jnp.exp(-(uu**2 + vv**2) / (2 * (2.0 / 3.0) ** 2))
    radius = 3.0 * 1.5 * scale_rel  # same window as orientation estimation
    support = 3.0 * 1.5 * _max_scale_rel(S) * 2.45  # A cond-gated at 6
    K = x.shape[0]
    eye = jnp.broadcast_to(jnp.eye(2, dtype=jnp.float32), (K, 2, 2))

    def step(carry, _):
        A, q = carry
        sx = x[:, None, None] + radius[:, None, None] * (
            A[:, 0, 0, None, None] * uu[None] + A[:, 0, 1, None, None] * vv[None]
        )
        sy = y[:, None, None] + radius[:, None, None] * (
            A[:, 1, 0, None, None] * uu[None] + A[:, 1, 1, None, None] * vv[None]
        )
        g0, g1 = _sample_grad(grad2, H, W, level_idx, sy, sx, support)
        # warped-patch gradients: d/du I(x + r A u) ~ A^T g
        gx = A[:, 0, 0, None, None] * g0 + A[:, 1, 0, None, None] * g1
        gy = A[:, 0, 1, None, None] * g0 + A[:, 1, 1, None, None] * g1
        Mxx = jnp.sum(w * gx * gx, axis=(1, 2))
        Mxy = jnp.sum(w * gx * gy, axis=(1, 2))
        Myy = jnp.sum(w * gy * gy, axis=(1, 2))
        tr = Mxx + Myy
        det = jnp.maximum(Mxx * Myy - Mxy * Mxy, 1e-20)
        # anisotropy q = lambda_min / lambda_max
        disc = jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0))
        lmax = 0.5 * (tr + disc)
        lmin = 0.5 * (tr - disc)
        q = lmin / jnp.maximum(lmax, 1e-20)
        # inverse square root of the 2x2 SPD M (closed form), det-normalized
        sdet = jnp.sqrt(det)
        s = jnp.sqrt(jnp.maximum(tr + 2 * sdet, 1e-20))
        # sqrt(M) = (M + sqrt(det) I) / s; W = sqrt(M)^-1 scaled to det 1
        w00 = (Myy + sdet) / s
        w01 = -Mxy / s
        w11 = (Mxx + sdet) / s
        wdet = jnp.maximum(w00 * w11 - w01 * w01, 1e-20)
        n = jnp.sqrt(wdet)
        Wm = jnp.stack(
            [
                jnp.stack([w00 / n, w01 / n], -1),
                jnp.stack([w01 / n, w11 / n], -1),
            ],
            -2,
        )
        A_new = jnp.einsum("kij,kjl->kil", A, Wm)
        good = jnp.isfinite(A_new).all(axis=(1, 2)) & (tr > 1e-12)
        A = jnp.where(good[:, None, None], A_new, A)
        return (A, q), None

    (A, q), _ = jax.lax.scan(step, (eye, jnp.ones(K)), None, length=num_iters)
    # condition of A itself: singular-value ratio via A^T A eigenvalues
    AtA_tr = jnp.einsum("kij,kij->k", A, A)
    AtA_det = (A[:, 0, 0] * A[:, 1, 1] - A[:, 0, 1] * A[:, 1, 0]) ** 2
    disc = jnp.sqrt(jnp.maximum(AtA_tr**2 - 4 * AtA_det, 0.0))
    cond = jnp.sqrt(
        (AtA_tr + disc) / jnp.maximum(AtA_tr - disc, 1e-20)
    )
    ok = mask & jnp.isfinite(A).all(axis=(1, 2)) & (cond <= 6.0)
    return A, ok


def _precompute_descriptor_weights():
    """Constant spatial bilinear weights from the 16x16 grid to 4x4 bins."""
    G = _GRID
    D = _DESC_SPATIAL
    # sample positions in bin units: [-D/2, D/2]
    u = (np.arange(G) + 0.5) / G * D - D / 2  # in bins
    W = np.zeros((G * G, D * D), dtype=np.float32)
    for i in range(G):
        for j in range(G):
            # bilinear weight to each bin center (-1.5, -0.5, .5, 1.5)
            for bi in range(D):
                for bj in range(D):
                    cy = bi - (D - 1) / 2
                    cx = bj - (D - 1) / 2
                    wy = max(0.0, 1.0 - abs(u[i] - cy))
                    wx = max(0.0, 1.0 - abs(u[j] - cx))
                    W[i * G + j, bi * D + bj] = wy * wx
    # Gaussian window over the descriptor support
    sigma = D / 2.0
    g = np.exp(-(u[None, :] ** 2 + u[:, None] ** 2) / (2 * sigma**2))
    return W * g.reshape(-1, 1).astype(np.float32)


_DESC_W = _precompute_descriptor_weights()  # [256, 16]


def _frame_matrix(theta, affine=None):
    """Per-keypoint 2x2 patch->image sampling frame T = A @ R(theta).

    affine: optional [K, 2, 2] shape matrices from affine adaptation
    (identity when None — plain rotated SIFT frames)."""
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    R = jnp.stack(
        [jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], -2
    )  # [K, 2, 2]
    if affine is None:
        return R
    return jnp.einsum("kij,kjl->kil", affine, R)


def _descriptors(grad2, H, W, S, x, y, level_idx, scale_rel, theta,
                 normalization, affine=None, support_scale: float = 1.0):
    """Fixed-grid SIFT descriptors. x,y,scale per keypoint-orientation.

    grad2: [2, LHp, Wp] flat channel-major gradients; x,y [K]; theta [K];
    affine: optional [K, 2, 2] shape matrices (estimate_affine_shape);
    support_scale: static bound on extra scaling of scale_rel by the caller
    (domain-size pooling). Returns [K, 128] float32.
    """
    K = x.shape[0]
    G = _GRID
    D = _DESC_SPATIAL
    mag_factor = 3.0  # bin width = 3 * sigma
    half = D / 2 * mag_factor * scale_rel  # descriptor support half-width
    support = (
        D / 2 * mag_factor * _max_scale_rel(S) * support_scale
        * math.sqrt(2.0)  # rotated grid corners
        * (2.45 if affine is not None else 1.0)
    )
    u = (jnp.arange(G, dtype=jnp.float32) + 0.5) / G * 2.0 - 1.0
    uu, vv = jnp.meshgrid(u, u)
    T = _frame_matrix(theta, affine)  # [K, 2, 2]
    ox = half[:, None, None] * (
        T[:, 0, 0, None, None] * uu[None] + T[:, 0, 1, None, None] * vv[None]
    )
    oy = half[:, None, None] * (
        T[:, 1, 0, None, None] * uu[None] + T[:, 1, 1, None, None] * vv[None]
    )
    sx = x[:, None, None] + ox
    sy = y[:, None, None] + oy

    g0, g1 = _sample_grad(grad2, H, W, level_idx, sy, sx, support)
    # gradients in the patch frame: g_p = T^T g (for T = R this reduces to
    # the classic angle - theta)
    gpx = T[:, 0, 0, None, None] * g0 + T[:, 1, 0, None, None] * g1
    gpy = T[:, 0, 1, None, None] * g0 + T[:, 1, 1, None, None] * g1
    m = jnp.sqrt(gpx**2 + gpy**2 + 1e-12)
    a = jnp.arctan2(gpy, gpx)
    obin = jnp.mod(a / (2 * jnp.pi) * _DESC_ORI, _DESC_ORI)
    b0 = jnp.floor(obin)
    frac = obin - b0
    b0i = jnp.mod(b0.astype(jnp.int32), _DESC_ORI)
    b1i = jnp.mod(b0i + 1, _DESC_ORI)
    # per-orientation-bin masked weights, laid out [K, 8, S] so the spatial
    # binning is ONE [K*8, S] x [S, 16] MXU matmul (the previous
    # one-hot + "kso,st->kto" einsum materialized [K, 256, 8] one-hots and
    # ran K tiny-batched gemms at ~1% MXU utilization)
    m_f = m.reshape(K, -1)
    w0_f = (1 - frac).reshape(K, -1) * m_f
    w1_f = frac.reshape(K, -1) * m_f
    b0f = b0i.reshape(K, -1)
    b1f = b1i.reshape(K, -1)
    ow_t = jnp.stack(
        [
            w0_f * (b0f == o) + w1_f * (b1f == o)
            for o in range(_DESC_ORI)
        ],
        axis=1,
    )  # [K, 8, S]
    Sn = ow_t.shape[-1]
    desc = (
        ow_t.reshape(K * _DESC_ORI, Sn) @ jnp.asarray(_DESC_W)
    ).reshape(K, _DESC_ORI, -1).transpose(0, 2, 1)  # [K, 16, 8]
    desc = desc.reshape(K, -1)
    # normalize: L2 -> clamp 0.2 -> renormalize
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=1, keepdims=True), 1e-12)
    desc = jnp.minimum(desc, 0.2)
    if normalization == int(Normalization.L1_ROOT):
        desc = desc / jnp.maximum(jnp.sum(desc, axis=1, keepdims=True), 1e-12)
        desc = jnp.sqrt(desc)
    else:
        desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=1, keepdims=True), 1e-12)
    return desc


_EXTRACT_STATICS = (
    "height", "width", "num_octaves", "S", "first_octave",
    "per_octave_kps", "max_num_orientations", "normalization", "upright",
    "peak_threshold", "edge_threshold", "dsp_scales", "affine_shape",
)


def _extract_core(
    image, height, width, num_octaves, S, first_octave, per_octave_kps,
    max_num_orientations, normalization, upright, peak_threshold, edge_threshold,
    dsp_scales=(), affine_shape=False,
):
    """Full SIFT for one image. Returns padded keypoints/descs + mask."""
    img = image.astype(jnp.float32)
    if image.dtype == jnp.uint8:
        # uint8 input crosses the remote tunnel 4x smaller than f32 (the
        # 960x1280 f32 upload alone cost ~100 ms of the 185 ms whole-
        # extract wall, r4); normalize on device
        img = img * (1.0 / 255.0)

    # base image at first octave
    if first_octave < 0:
        base = _upsample2(img)
        base_sigma = 2.0 * _SIGMA_N
    else:
        base = img
        base_sigma = _SIGMA_N
    delta = math.sqrt(max(_SIGMA0**2 - base_sigma**2, 0.01))
    base = _blur(base, delta)

    all_out = []
    octave_scale = 2.0 ** first_octave
    for o in range(num_octaves):
        gauss = _build_octave(base, S)
        dog = gauss[1:] - gauss[:-1]
        # keypoint counts scale with octave pixel count (~4x decay per
        # octave); a flat per-octave budget burned the orient/desc stages
        # on masked slots of the deep octaves (ROADMAP r3 Performance #2)
        oct_budget = max(256, per_octave_kps >> o)
        x, y, lev_f, level_idx, scale_rel, resp, mask = _detect_octave(
            gauss, dog, S, peak_threshold, edge_threshold, oct_budget
        )
        oh, ow = gauss.shape[1], gauss.shape[2]
        grad = _octave_gradients(gauss)  # [2, LHp, Wp]
        if affine_shape:
            A, mask = _affine_shapes(
                grad, oh, ow, S, x, y, level_idx, scale_rel, mask
            )
        else:
            A = None
        if upright:
            theta = jnp.zeros((x.shape[0], 1), dtype=jnp.float32)
            ori_mask = mask[:, None]
        else:
            theta, ori_mask = _orientations(
                grad, oh, ow, S, x, y, level_idx, scale_rel, mask,
                max_num_orientations, affine=A,
            )
        O = theta.shape[1]
        # expand keypoints per orientation
        xe = jnp.repeat(x[:, None], O, 1).reshape(-1)
        ye = jnp.repeat(y[:, None], O, 1).reshape(-1)
        le = jnp.repeat(level_idx[:, None], O, 1).reshape(-1)
        se = jnp.repeat(scale_rel[:, None], O, 1).reshape(-1)
        th = theta.reshape(-1)
        me = ori_mask.reshape(-1)
        Ae = (
            jnp.repeat(A[:, None], O, 1).reshape(-1, 2, 2)
            if A is not None
            else None
        )
        if O > 1:
            # shrink the descriptor budget to 1.5x the keypoint budget
            # WITHOUT sorting (argsort cost ~145 ms/extract, top_k with
            # k~n little better): detection emits keypoints valid-first,
            # so reorder orientation-MAJOR — all first orientations (valid
            # -first by construction), then the extra orientations of only
            # the top half of keypoints (highest scale/response, the ones
            # COLMAP keeps under budget pressure). Pure slicing/concat.
            Nk = x.shape[0]
            take = (Nk >> 1) // max(O - 1, 1)

            def compact(a2):
                # a2 [Nk, O, ...] -> [Nk + (O-1)*take, ...]
                return jnp.concatenate(
                    [a2[:, 0]] + [a2[:take, o] for o in range(1, O)]
                )

            resh = lambda a: a.reshape((Nk, O) + a.shape[1:])  # noqa: E731
            xe = compact(resh(xe))
            ye = compact(resh(ye))
            le = compact(resh(le))
            se = compact(resh(se))
            th = compact(resh(th))
            me = compact(resh(me))
            if Ae is not None:
                Ae = compact(resh(Ae))
        if dsp_scales:
            # domain-size pooling (ref: extract_features.h dsp_* options):
            # average descriptors over scaled supports, then renormalize
            acc = None
            fmax = max(dsp_scales)
            for f in dsp_scales:
                d = _descriptors(
                    grad, oh, ow, S, xe, ye, le, se * f, th, normalization,
                    affine=Ae, support_scale=fmax,
                )
                acc = d if acc is None else acc + d
            desc = acc / len(dsp_scales)
            desc = desc / jnp.maximum(
                jnp.linalg.norm(desc, axis=1, keepdims=True), 1e-12
            )
            if normalization == int(Normalization.L1_ROOT):
                desc = desc * desc  # undo sqrt before re-normalizing in L1
                desc = desc / jnp.maximum(
                    jnp.sum(desc, axis=1, keepdims=True), 1e-12
                )
                desc = jnp.sqrt(desc)
        else:
            desc = _descriptors(
                grad, oh, ow, S, xe, ye, le, se, th, normalization, affine=Ae
            )
        # map to input-image coordinates
        kp_x = xe * octave_scale
        kp_y = ye * octave_scale
        kp_scale = se * octave_scale
        all_out.append((kp_x, kp_y, kp_scale, th, desc, me))
        # next octave
        base = _downsample2(gauss[S])
        octave_scale *= 2.0

    kp_x = jnp.concatenate([a[0] for a in all_out])
    kp_y = jnp.concatenate([a[1] for a in all_out])
    kp_s = jnp.concatenate([a[2] for a in all_out])
    kp_t = jnp.concatenate([a[3] for a in all_out])
    descs = jnp.concatenate([a[4] for a in all_out])
    masks = jnp.concatenate([a[5] for a in all_out])
    # quantize on device: uint8 descriptors are the reference's storage
    # format (feature/sift.h:76-78, /512 on read) and cut the result
    # transfer 4x — D2H through the remote tunnel ran at ~45 MB/s
    descs_u8 = jnp.clip(jnp.round(descs * 512.0), 0, 255).astype(jnp.uint8)
    return kp_x, kp_y, kp_s, kp_t, descs_u8, masks


_extract_jit = functools.partial(jax.jit, static_argnames=_EXTRACT_STATICS)(
    _extract_core
)


def _cached_extract(jf, tag, arr, params):
    """Dispatch an extraction jit through the persistent executable cache
    (utils/aot_cache.py): the extractor's XLA program is the largest
    non-BA compile a fresh pipeline process pays."""
    import sys as _sys

    from pycolmap_tpu.features import window_sampler as _ws
    from pycolmap_tpu.utils import aot_cache

    statics = dict(zip(_EXTRACT_STATICS, params))
    salt = aot_cache.source_salt(_sys.modules[__name__], _ws)
    return aot_cache.cached_call(jf, tag, salt, statics, arr)


class Sift:
    """In-memory SIFT extractor (API parity: feature/sift.h class Sift)."""

    def __init__(self, options: SiftExtractionOptions = None, device=None):
        self.options = options if options is not None else SiftExtractionOptions()

    @staticmethod
    def _to_gray_float(image: np.ndarray) -> np.ndarray:
        img = np.asarray(image)
        if img.ndim == 3:
            img = img.mean(axis=2)
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0
        else:
            img = img.astype(np.float32)
            if img.max() > 2.0:  # 0..255 float input
                img = img / 255.0
        return img

    @staticmethod
    def _to_device_input(image: np.ndarray) -> np.ndarray:
        """Keep grayscale uint8 images raw: the device normalizes, and the
        H2D transfer is 4x smaller (the dominant whole-extract cost through
        the remote tunnel). Everything else goes through the float path."""
        img = np.asarray(image)
        if img.ndim == 2 and img.dtype == np.uint8:
            return img
        if img.ndim == 3 and img.dtype == np.uint8:
            # integer mean keeps the u8 transfer win; <=1/255 off the
            # float mean, far below SIFT's noise floor
            return (
                img.astype(np.uint16).sum(axis=2) // img.shape[2]
            ).astype(np.uint8)
        return Sift._to_gray_float(image)

    def _static_params(self, h: int, w: int):
        opts = self.options
        max_dim = max(h, w) * (2 if opts.first_octave < 0 else 1)
        num_octaves = min(
            opts.num_octaves, max(1, int(math.log2(max_dim)) - 3)
        )
        per_octave = max(256, opts.max_num_features // max(num_octaves, 1))
        if opts.domain_size_pooling:
            dsp_scales = tuple(
                float(x)
                for x in np.linspace(
                    opts.dsp_min_scale, opts.dsp_max_scale,
                    max(2, min(opts.dsp_num_scales, 10)),
                )
            )
        else:
            dsp_scales = ()
        return (
            h, w, num_octaves, opts.octave_resolution, opts.first_octave,
            per_octave, opts.max_num_orientations,
            int(opts.normalization), opts.upright,
            float(opts.peak_threshold), float(opts.edge_threshold),
            dsp_scales, bool(opts.estimate_affine_shape),
        )

    def _postprocess(self, kp_x, kp_y, kp_s, kp_t, descs, mask):
        kps = np.stack([kp_x, kp_y, kp_s, kp_t], axis=1)[mask]
        descs = descs[mask].astype(np.float32) / 512.0  # u8 -> ref float scale
        # global budget: keep largest-scale features (COLMAP semantics)
        if len(kps) > self.options.max_num_features:
            order = np.argsort(-kps[:, 2], kind="stable")[
                : self.options.max_num_features
            ]
            order = np.sort(order)
            kps = kps[order]
            descs = descs[order]
        return kps.astype(np.float32), descs.astype(np.float32)

    def extract(self, image: np.ndarray):
        """image: HxW uint8 or float (0..1 or 0..255 float also accepted).

        Returns (keypoints Nx4 [x, y, scale, orientation], descriptors
        Nx128 float32).
        """
        img = self._to_device_input(image)
        h, w = img.shape
        out = _cached_extract(_extract_jit, "sift1", img,
                              self._static_params(h, w))
        kp_x, kp_y, kp_s, kp_t, descs, mask = jax.device_get(out)
        return self._postprocess(kp_x, kp_y, kp_s, kp_t, descs, mask)

    def extract_batch(self, images):
        """Batched extraction of SAME-SIZE images (pipelined dispatches).

        images: sequence of HxW arrays with identical shapes. Returns a list
        of (keypoints Nx4, descriptors Nx128) tuples.

        Dispatches the SINGLE-image program once per image and only syncs at
        the end: each image's H2D upload overlaps the previous image's
        compute, which measured ~1.5x faster per image than one stacked
        [B, H, W] program (the stack is one large serialized upload, and the
        unrolled B-image trace serializes compute too — 120 vs 80 ms/img at
        960x1280 through the remote tunnel, BASELINE.md r5). Also keeps one
        compile signature ("sift1") instead of two.
        """
        if not images:
            return []
        grays = [self._to_device_input(im) for im in images]
        h, w = grays[0].shape
        for g in grays:
            if g.shape != (h, w):
                raise ValueError("extract_batch requires same-size images")
        params = self._static_params(h, w)
        outs = [
            _cached_extract(_extract_jit, "sift1", g, params) for g in grays
        ]
        return [
            self._postprocess(*jax.device_get(out)) for out in outs
        ]


def extract_sift(image, options: SiftExtractionOptions = None):
    """Functional one-shot API."""
    return Sift(options).extract(image)
