"""PatchMatch multi-view stereo as batched JAX kernels.

TPU-native replacement for the reference's CUDA PatchMatch
(ref: pycolmap/pipeline/mvs.h:21-41, options :94-180; upstream
colmap/mvs/patch_match_cuda). Differences from the serial CUDA design,
chosen for the XLA compilation model:

- red/black checkerboard propagation updates half of all pixels per step as
  one fused tensor op (no per-pixel scan);
- each candidate plane (current, 4 propagated neighbor planes, perturbed
  depth/normal, random) is scored against ALL pixels and ALL source views at
  once; bilateral-NCC window statistics are accumulated by a lax.scan over
  the (precomputed, shifted) window planes, with sources vmapped — the
  compiled graph is one window-body regardless of window size;
- per-view costs are aggregated by per-pixel view-selection weights
  w_k = exp(-c_k^2 / (2 sigma_v^2)) refreshed from the current plane each
  red/black step — the dense batched analog of upstream's Monte-Carlo
  per-pixel view sampling (Zheng et al., upstream patch_match_cuda.cu);
- the geometric-consistency pass re-runs the optimization with an added
  per-view forward-backward reprojection-error term
  ``geom_w * min(err_px, geom_max_cost)`` (upstream ComputeGeomConsistencyCost),
  initialized from the photometric pass and reading its depth maps.

Plane parameterization: depth d along the pixel ray + unit normal n in the
reference camera frame; the plane-induced warp into source view k is
  q_s ~ K_s (R_k r_q + t_k (n . r_q) / (d (n . r_p))),  r = K_r^-1 q.
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
    return np.stack([dy.ravel(), dx.ravel()], axis=1)  # [nw, 2]


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
    v = jax.random.normal(key, (3,) + shape)
    v = v / jnp.maximum(jnp.sqrt(jnp.sum(v * v, axis=0)), 1e-9)
    dot = jnp.sum(v * rays, axis=0)
    return jnp.where(dot[None] > 0, -v, v)


_VIEW_SIGMA = 0.3  # view-selection weight bandwidth on NCC cost (in [0, 2])


@functools.partial(
    jax.jit,
    static_argnames=("num_iterations", "window_radius", "window_step",
                     "geom_consistency"),
)
def patch_match_kernel(
    key, ref, srcs, rays, Ks_all, R_rel, t_rel,
    depth0, normal0, depth_min, depth_max,
    sigma_color, ncc_sigma,
    num_iterations, window_radius, window_step,
    geom_consistency=False, Kr=None, Ks_inv=None, src_depths=None,
    geom_w=0.3, geom_max_cost=3.0,
):
    """Run PatchMatch for one reference image.

    ref [H, W]; srcs [K, H, W]; rays [3, H, W] (K_r^-1 pixel rays);
    Ks_all [K, 3, 3] source calibrations; R_rel [K,3,3], t_rel [K,3];
    depth0 [H, W]; normal0 [3, H, W]. With geom_consistency: Kr [3, 3]
    reference calibration, Ks_inv [K, 3, 3], src_depths [K, H, W] source
    depth maps from the photometric pass; per-view cost adds
    geom_w * min(fwd-bwd reprojection err, geom_max_cost)
    (ref: pipeline/mvs.h:129-135 geom_consistency options; upstream
    ComputeGeomConsistencyCost).
    Returns (depth, normal [3,H,W], cost [H, W]).
    """
    H, W = ref.shape
    K = srcs.shape[0]
    if geom_consistency:
        # reference pixel coords (for the reprojection error target)
        pxr = Kr[0, 0] * rays[0] / rays[2] + Kr[0, 2]
        pyr = Kr[1, 1] * rays[1] / rays[2] + Kr[1, 2]
    offsets = _window_offsets(window_radius, window_step)
    nw = len(offsets)

    parity = (
        jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        + jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    ) % 2

    # precompute shifted window planes (loop-invariant): [nw, ...]
    sg = (max(window_radius, 1) / 1.5) ** 2
    ref_off = jnp.stack(
        [jnp.roll(ref, (-dy, -dx), axis=(0, 1)) for dy, dx in offsets]
    )  # [nw, H, W]
    rays_off = jnp.stack(
        [jnp.roll(rays, (-dy, -dx), axis=(1, 2)) for dy, dx in offsets]
    )  # [nw, 3, H, W]
    w_spatial = jnp.asarray(
        np.exp(-(offsets[:, 0] ** 2 + offsets[:, 1] ** 2) / (2 * sg)).astype(
            np.float32
        )
    )
    w_off = (
        jnp.exp(-jnp.abs(ref_off - ref[None]) / sigma_color)
        * w_spatial[:, None, None]
    )  # [nw, H, W]

    w_sum = jnp.sum(w_off, axis=0)
    ref_mean = jnp.sum(w_off * ref_off, axis=0) / w_sum
    ref_var = jnp.maximum(
        jnp.sum(w_off * ref_off**2, axis=0) / w_sum - ref_mean**2, 1e-6
    )

    def view_costs(depth, normal):
        """Per-view matching cost [K, H, W] for the plane (depth, normal)."""
        ndotr = jnp.sum(normal * rays, axis=0)
        denom = depth * jnp.where(jnp.abs(ndotr) < 1e-6, -1e-6, ndotr)

        def geom_cost(Rk, tk, Kk, Kki, Dk):
            """Forward-backward reprojection error at the center pixel."""
            scale_c = 1.0 / jnp.maximum(depth, 1e-9)
            c0 = Rk[0, 0] * rays[0] + Rk[0, 1] * rays[1] + Rk[0, 2] * rays[2] + tk[0] * scale_c
            c1 = Rk[1, 0] * rays[0] + Rk[1, 1] * rays[1] + Rk[1, 2] * rays[2] + tk[1] * scale_c
            c2 = Rk[2, 0] * rays[0] + Rk[2, 1] * rays[1] + Rk[2, 2] * rays[2] + tk[2] * scale_c
            zc = jnp.where(jnp.abs(c2) < 1e-9, 1e-9, c2)
            uc = Kk[0, 0] * (c0 / zc) + Kk[0, 2]
            vc = Kk[1, 1] * (c1 / zc) + Kk[1, 2]
            ds, okd = _bilinear(Dk, vc - 0.5, uc - 0.5)
            # backproject source sample, map into the reference frame
            bx = Kki[0, 0] * uc + Kki[0, 2]
            by = Kki[1, 1] * vc + Kki[1, 2]
            d0 = ds * bx - tk[0]
            d1 = ds * by - tk[1]
            d2 = ds - tk[2]
            Xr0 = Rk[0, 0] * d0 + Rk[1, 0] * d1 + Rk[2, 0] * d2
            Xr1 = Rk[0, 1] * d0 + Rk[1, 1] * d1 + Rk[2, 1] * d2
            Xr2 = Rk[0, 2] * d0 + Rk[1, 2] * d1 + Rk[2, 2] * d2
            zr = jnp.where(Xr2 < 1e-9, 1e-9, Xr2)
            ur = Kr[0, 0] * (Xr0 / zr) + Kr[0, 2]
            vr = Kr[1, 1] * (Xr1 / zr) + Kr[1, 2]
            err = jnp.sqrt((ur - pxr) ** 2 + (vr - pyr) ** 2)
            ok = okd & (ds > 0) & (c2 > 0) & (Xr2 > 0)
            return jnp.where(ok, jnp.minimum(err, geom_max_cost), geom_max_cost)

        def per_view(src, Rk, tk, Kk):
            def body(carry, inputs):
                s_sum, s2_sum, rs_sum, wv_sum = carry
                r_q, ref_q, w = inputs  # [3,H,W], [H,W], [H,W]
                ndotq = normal[0] * r_q[0] + normal[1] * r_q[1] + normal[2] * r_q[2]
                scale = ndotq / denom
                # X_q = r_q * (d n.r_p) / (n.r_q); X_s = R X_q + t; in
                # projective form: m = R r_q + t (n.r_q) / (d n.r_p)
                m0 = Rk[0, 0] * r_q[0] + Rk[0, 1] * r_q[1] + Rk[0, 2] * r_q[2] + tk[0] * scale
                m1 = Rk[1, 0] * r_q[0] + Rk[1, 1] * r_q[1] + Rk[1, 2] * r_q[2] + tk[1] * scale
                m2 = Rk[2, 0] * r_q[0] + Rk[2, 1] * r_q[1] + Rk[2, 2] * r_q[2] + tk[2] * scale
                z = jnp.where(jnp.abs(m2) < 1e-9, 1e-9, m2)
                u = Kk[0, 0] * (m0 / z) + Kk[0, 2]
                v = Kk[1, 1] * (m1 / z) + Kk[1, 2]
                s, ok = _bilinear(src, v - 0.5, u - 0.5)
                wk = w * ok * (m2 > 0)
                return (
                    s_sum + wk * s,
                    s2_sum + wk * s * s,
                    rs_sum + wk * ref_q * s,
                    wv_sum + wk,
                ), None

            zero = jnp.zeros((H, W))
            (s_sum, s2_sum, rs_sum, wv_sum), _ = jax.lax.scan(
                body, (zero, zero, zero, zero + 1e-9), (rays_off, ref_off, w_off)
            )
            src_mean = s_sum / wv_sum
            src_var = jnp.maximum(s2_sum / wv_sum - src_mean**2, 1e-6)
            covar = rs_sum / wv_sum - ref_mean * src_mean
            ncc = covar / jnp.sqrt(ref_var * src_var)
            cost = 1.0 - jnp.clip(ncc, -1.0, 1.0)
            return jnp.where(wv_sum > 0.2 * w_sum, cost, 2.0)

        if geom_consistency:
            def per_view_geom(src, Rk, tk, Kk, Kki, Dk):
                return per_view(src, Rk, tk, Kk) + geom_w * geom_cost(
                    Rk, tk, Kk, Kki, Dk
                )

            return jax.vmap(per_view_geom)(
                srcs, R_rel, t_rel, Ks_all, Ks_inv, src_depths
            )
        return jax.vmap(per_view)(srcs, R_rel, t_rel, Ks_all)  # [K, H, W]

    def agg_cost(costs, vw):
        """Per-pixel view-weighted aggregation."""
        return jnp.sum(vw * costs, axis=0) / jnp.maximum(
            jnp.sum(vw, axis=0), 1e-9
        )

    def plane_cost(depth, normal, vw):
        return agg_cost(view_costs(depth, normal), vw)

    def neighbor_plane_depth(depth, normal, dy, dx):
        """Depth induced at each pixel by the (dy,dx)-neighbor's plane."""
        d_n = jnp.roll(depth, (dy, dx), axis=(0, 1))
        n_n = jnp.roll(normal, (dy, dx), axis=(1, 2))
        ray_n = jnp.roll(rays, (dy, dx), axis=(1, 2))
        num = d_n * jnp.sum(n_n * ray_n, axis=0)
        den = jnp.sum(n_n * rays, axis=0)
        d = num / jnp.where(jnp.abs(den) < 1e-6, -1e-6, den)
        return jnp.clip(d, depth_min, depth_max), n_n

    def try_candidate(state, cand, color, vw):
        depth, normal, cost = state
        d_c, n_c = cand
        c_c = plane_cost(d_c, n_c, vw)
        better = (c_c < cost) & (parity == color)
        return (
            jnp.where(better, d_c, depth),
            jnp.where(better[None], n_c, normal),
            jnp.where(better, c_c, cost),
        )

    def step(carry, inputs):
        depth, normal, _ = carry
        key, color = inputs
        keys = jax.random.split(key, 4)
        # refresh per-pixel view-selection weights from the current plane,
        # and re-aggregate its cost under them so comparisons are consistent
        cv = view_costs(depth, normal)
        vw = jnp.exp(-(cv * cv) / (2 * _VIEW_SIGMA**2))
        state = (depth, normal, agg_cost(cv, vw))
        for (dy, dx) in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            state = try_candidate(
                state, neighbor_plane_depth(state[0], state[1], dy, dx),
                color, vw,
            )
        pert = jax.random.uniform(keys[0], (H, W), minval=-0.1, maxval=0.1)
        state = try_candidate(
            state,
            (jnp.clip(state[0] * (1 + pert), depth_min, depth_max), state[1]),
            color, vw,
        )
        dn = 0.3 * jax.random.normal(keys[1], (3, H, W))
        n_p = state[1] + dn
        n_p = n_p / jnp.maximum(jnp.sqrt(jnp.sum(n_p * n_p, axis=0)), 1e-9)
        n_p = jnp.where(jnp.sum(n_p * rays, axis=0)[None] > 0, -n_p, n_p)
        state = try_candidate(state, (state[0], n_p), color, vw)
        d_r = jax.random.uniform(
            keys[2], (H, W), minval=depth_min, maxval=depth_max
        )
        state = try_candidate(
            state, (d_r, _random_normals(keys[3], (H, W), rays)), color, vw
        )
        return state, None

    schedule_keys = jax.random.split(key, 2 * num_iterations)
    colors = jnp.tile(jnp.array([0, 1]), num_iterations)
    (depth, normal, cost), _ = jax.lax.scan(
        step, (depth0, normal0, jnp.zeros((H, W))), (schedule_keys, colors)
    )
    return depth, normal, cost
