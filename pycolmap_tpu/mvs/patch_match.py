"""PatchMatch multi-view stereo as batched JAX kernels.

TPU-native replacement for the reference's CUDA PatchMatch
(ref: pycolmap/pipeline/mvs.h:21-41, options :94-180; upstream
colmap/mvs/patch_match_cuda). Differences from the serial CUDA design,
chosen for the XLA compilation model:

- red/black checkerboard propagation updates half of all pixels per step as
  one fused tensor op (no per-pixel scan);
- each candidate plane (current, 4 propagated neighbor planes, perturbed
  depth/normal, random) is scored against ALL pixels and ALL source views at
  once; bilateral-NCC window statistics are accumulated over static window
  offsets via jnp.roll (ref-side) + bilinear gathers (source-side);
- per-view costs are aggregated by the mean of the best half of views
  (the batched stand-in for upstream's per-pixel view sampling).

Plane parameterization: depth d along the pixel ray + unit normal n in the
reference camera frame; the plane-induced warp into source view k is
  q_s ~ K_s (R_k r_q - t_k (n . r_q) / (d (n . r_p))),  r = K_r^-1 q.
"""

from __future__ import annotations

import functools
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from pycolmap_tpu.utils.options import BaseOptions, options_dataclass


@options_dataclass
class PatchMatchOptions(BaseOptions):
    """Mirrors reference PatchMatchOptions (pipeline/mvs.h:94-180)."""

    max_image_size: int = -1
    gpu_index: str = "-1"
    depth_min: float = -1.0
    depth_max: float = -1.0
    window_radius: int = 5
    window_step: int = 2
    sigma_spatial: float = -1.0
    sigma_color: float = 0.2
    num_samples: int = 15
    ncc_sigma: float = 0.6
    min_triangulation_angle: float = 1.0
    incident_angle_sigma: float = 0.9
    num_iterations: int = 5
    geom_consistency: bool = True
    geom_consistency_regularizer: float = 0.3
    geom_consistency_max_cost: float = 3.0
    filter: bool = True
    filter_min_ncc: float = 0.1
    filter_min_triangulation_angle: float = 3.0
    filter_min_num_consistent: int = 2
    filter_geom_consistency_max_cost: float = 1.0
    cache_size: float = 32.0
    allow_missing_files: bool = False
    write_consistency_graph: bool = False


def _window_offsets(radius: int, step: int):
    r = np.arange(-radius, radius + 1, step)
    dy, dx = np.meshgrid(r, r, indexing="ij")
    return list(zip(dy.ravel().tolist(), dx.ravel().tolist()))


def _bilinear(img, ys, xs):
    """img [H, W]; ys/xs [...] float coords; zero outside + validity mask."""
    H, W = img.shape
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    dx = xs - x0
    dy = ys - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    ok = (x0i >= 0) & (x0i < W - 1) & (y0i >= 0) & (y0i < H - 1)
    x0c = jnp.clip(x0i, 0, W - 2)
    y0c = jnp.clip(y0i, 0, H - 2)
    v = (
        img[y0c, x0c] * (1 - dy) * (1 - dx)
        + img[y0c, x0c + 1] * (1 - dy) * dx
        + img[y0c + 1, x0c] * dy * (1 - dx)
        + img[y0c + 1, x0c + 1] * dy * dx
    )
    return jnp.where(ok, v, 0.0), ok


def _random_normals(key, shape, rays):
    """Random unit normals facing the camera (n . ray < 0)."""
    k1, k2 = jax.random.split(key)
    # sample in the hemisphere around -ray via perturbation
    v = jax.random.normal(k1, (3,) + shape)
    v = v / jnp.maximum(jnp.sqrt(jnp.sum(v * v, axis=0)), 1e-9)
    dot = jnp.sum(v * rays, axis=0)
    v = jnp.where(dot[None] > 0, -v, v)
    return v


@functools.partial(
    jax.jit,
    static_argnames=("num_iterations", "window_radius", "window_step"),
)
def patch_match_kernel(
    key, ref, srcs, rays, Ks_all, R_rel, t_rel,
    depth0, normal0, depth_min, depth_max,
    sigma_color, ncc_sigma,
    num_iterations, window_radius, window_step,
):
    """Run PatchMatch for one reference image.

    ref [H, W]; srcs [K, H, W]; rays [3, H, W] (K_r^-1 pixel rays);
    Ks_all [K, 3, 3] source calibrations; R_rel [K,3,3], t_rel [K,3];
    depth0 [H, W]; normal0 [3, H, W].
    Returns (depth, normal [3,H,W], cost [H, W]).
    """
    H, W = ref.shape
    K = srcs.shape[0]
    offsets = _window_offsets(window_radius, window_step)
    nw = len(offsets)

    yy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    parity = (
        jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        + jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    ) % 2

    # bilateral weights + ref window statistics depend only on ref: for each
    # offset, weight w = exp(-|dI|/sigma_color) * exp(-d2/(2 sg^2))
    sg = (window_radius / 1.5) ** 2
    w_list = []
    refs_list = []
    for (dy, dx) in offsets:
        ref_q = jnp.roll(ref, (-dy, -dx), axis=(0, 1))
        w = jnp.exp(-jnp.abs(ref_q - ref) / sigma_color) * np.exp(
            -(dy * dy + dx * dx) / (2 * sg)
        )
        w_list.append(w)
        refs_list.append(ref_q)

    w_sum = sum(w_list)
    ref_mean = sum(w * r for w, r in zip(w_list, refs_list)) / w_sum
    ref_var = (
        sum(w * r * r for w, r in zip(w_list, refs_list)) / w_sum - ref_mean**2
    )
    ref_var = jnp.maximum(ref_var, 1e-6)

    def plane_cost(depth, normal):
        """Aggregated matching cost [H, W] for plane (depth, normal)."""
        ndotr = jnp.sum(normal * rays, axis=0)  # [H, W]
        denom = depth * jnp.where(jnp.abs(ndotr) < 1e-6, -1e-6, ndotr)

        cost_views = []
        for k in range(K):
            Rk = R_rel[k]
            tk = t_rel[k]
            Kk = Ks_all[k]
            # accumulate weighted stats of warped src + cross term
            s_sum = jnp.zeros((H, W))
            s2_sum = jnp.zeros((H, W))
            rs_sum = jnp.zeros((H, W))
            wv_sum = jnp.zeros((H, W)) + 1e-9
            for (dy, dx), w, ref_q in zip(offsets, w_list, refs_list):
                r_q = jnp.roll(rays, (-dy, -dx), axis=(1, 2))  # [3, H, W]
                ndotq = jnp.sum(normal * r_q, axis=0)
                # m = R r_q - t (n.r_q)/(d (n.r_p))
                scale = ndotq / denom
                m0 = (
                    Rk[0, 0] * r_q[0] + Rk[0, 1] * r_q[1] + Rk[0, 2] * r_q[2]
                    - tk[0] * scale
                )
                m1 = (
                    Rk[1, 0] * r_q[0] + Rk[1, 1] * r_q[1] + Rk[1, 2] * r_q[2]
                    - tk[1] * scale
                )
                m2 = (
                    Rk[2, 0] * r_q[0] + Rk[2, 1] * r_q[1] + Rk[2, 2] * r_q[2]
                    - tk[2] * scale
                )
                z = jnp.where(jnp.abs(m2) < 1e-9, 1e-9, m2)
                u = Kk[0, 0] * (m0 / z) + Kk[0, 2]
                v = Kk[1, 1] * (m1 / z) + Kk[1, 2]
                s, ok = _bilinear(srcs[k], v - 0.5, u - 0.5)
                wk = w * ok * (m2 > 0)
                s_sum = s_sum + wk * s
                s2_sum = s2_sum + wk * s * s
                rs_sum = rs_sum + wk * ref_q * s
                wv_sum = wv_sum + wk
            src_mean = s_sum / wv_sum
            src_var = jnp.maximum(s2_sum / wv_sum - src_mean**2, 1e-6)
            covar = rs_sum / wv_sum - ref_mean * src_mean
            ncc = covar / jnp.sqrt(ref_var * src_var)
            cost = 1.0 - jnp.clip(ncc, -1.0, 1.0)
            # views with too little valid support get max cost
            cost = jnp.where(wv_sum > 0.2 * w_sum, cost, 2.0)
            cost_views.append(cost)

        costs = jnp.stack(cost_views)  # [K, H, W]
        costs = jnp.sort(costs, axis=0)
        top = max(1, (K + 1) // 2)
        return jnp.mean(costs[:top], axis=0)

    def neighbor_plane_depth(depth, normal, dy, dx):
        """Depth induced at each pixel by the (dy,dx)-neighbor's plane."""
        d_n = jnp.roll(depth, (dy, dx), axis=(0, 1))
        n_n = jnp.roll(normal, (dy, dx), axis=(1, 2))
        ray_n = jnp.roll(rays, (dy, dx), axis=(1, 2))
        num = d_n * jnp.sum(n_n * ray_n, axis=0)
        den = jnp.sum(n_n * rays, axis=0)
        d = num / jnp.where(jnp.abs(den) < 1e-6, -1e-6, den)
        return jnp.clip(d, depth_min, depth_max), n_n

    def step(carry, inputs):
        depth, normal, cost = carry
        key, color = inputs
        keys = jax.random.split(key, 4)

        cands = []
        for (dy, dx) in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            cands.append(neighbor_plane_depth(depth, normal, dy, dx))
        # perturbed depth
        pert = jax.random.uniform(keys[0], (H, W), minval=-0.1, maxval=0.1)
        cands.append((jnp.clip(depth * (1 + pert), depth_min, depth_max), normal))
        # perturbed normal
        dn = 0.3 * jax.random.normal(keys[1], (3, H, W))
        n_p = normal + dn
        n_p = n_p / jnp.maximum(jnp.sqrt(jnp.sum(n_p * n_p, axis=0)), 1e-9)
        n_p = jnp.where(jnp.sum(n_p * rays, axis=0)[None] > 0, -n_p, n_p)
        cands.append((depth, n_p))
        # fully random plane
        d_r = jax.random.uniform(
            keys[2], (H, W), minval=depth_min, maxval=depth_max
        )
        cands.append((d_r, _random_normals(keys[3], (H, W), rays)))

        for d_c, n_c in cands:
            c_c = plane_cost(d_c, n_c)
            better = (c_c < cost) & (parity == color)
            depth = jnp.where(better, d_c, depth)
            normal = jnp.where(better[None], n_c, normal)
            cost = jnp.where(better, c_c, cost)
        return (depth, normal, cost), None

    cost0 = plane_cost(depth0, normal0)
    schedule_keys = jax.random.split(key, 2 * num_iterations)
    colors = jnp.tile(jnp.array([0, 1]), num_iterations)
    (depth, normal, cost), _ = jax.lax.scan(
        step, (depth0, normal0, cost0), (schedule_keys, colors)
    )
    return depth, normal, cost
