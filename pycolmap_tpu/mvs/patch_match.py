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

Two implementations of the per-view window cost share this module:
``view_costs_xla`` (pure XLA; gathers through HBM) and the Pallas banded
kernel in pm_kernels.py (VMEM-resident source bands + MXU tent-matmul
sampling; ~zero gathers). The Pallas path needs a pinhole reference
calibration ``Kr`` and per-tile-coherent candidate depths; it is selected
on TPU backends (env PYCOLMAP_TPU_PM_PALLAS=0/1/auto overrides).
"""

from __future__ import annotations

import functools
import os

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


def _pm_pallas_enabled() -> bool:
    """Whether patch_match_kernel should use the Pallas banded kernel.

    PYCOLMAP_TPU_PM_PALLAS: "0"/"off" forces the XLA path, "1"/"on" forces
    Pallas (interpret mode on CPU), default "auto" = Pallas on TPU only.
    """
    mode = os.environ.get("PYCOLMAP_TPU_PM_PALLAS", "auto").lower()
    if mode in ("0", "off", "false"):
        return False
    if mode in ("1", "on", "true", "interpret"):
        return True
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def _pm_view_params(R_rel, t_rel, Ks_all, Kr, sigma_color, geom_w,
                    geom_max_cost):
    """Pack per-view scalars into the pm_kernels [K, 32] SMEM row layout."""
    K = R_rel.shape[0]
    f32 = lambda x: jnp.asarray(x, jnp.float32)  # noqa: E731
    fx, fy = Ks_all[:, 0, 0], Ks_all[:, 1, 1]
    cx, cy = Ks_all[:, 0, 2], Ks_all[:, 1, 2]
    kr_row = jnp.stack([Kr[0, 0], Kr[1, 1], Kr[0, 2], Kr[1, 2]])
    scal = jnp.stack(
        [f32(sigma_color), f32(geom_w), f32(geom_max_cost)]
    )
    rows = jnp.concatenate(
        [
            R_rel.reshape(K, 9),
            t_rel,
            jnp.stack([fx, fy, cx, cy], axis=1),
            jnp.broadcast_to(kr_row, (K, 4)),
            jnp.broadcast_to(scal, (K, 3)),
            jnp.stack([1.0 / fx, 1.0 / fy, -cx / fx, -cy / fy], axis=1),
            jnp.zeros((K, 5)),
        ],
        axis=1,
    )
    return rows.astype(jnp.float32)


def view_costs_xla(
    depth, normal, srcs, rays, R_rel, t_rel, Ks_all,
    rays_off, ref_off, w_off, w_sum, ref_mean, ref_var,
    geom_consistency, Kr, Ks_inv, src_depths, geom_w, geom_max_cost,
):
    """Per-view matching cost [K, H, W] for the plane field (depth, normal).

    Reference XLA formulation: bilateral-NCC statistics accumulated by a
    lax.scan over precomputed shifted window planes (rays_off/ref_off/w_off
    [nw, ...]), vmapped over source views. Window samples use roll-based
    shifted planes, so pixels within the window radius of the border see
    wrapped values; the Pallas path (pm_kernels) matches this function on
    interior pixels.
    """
    H, W = depth.shape
    ndotr = jnp.sum(normal * rays, axis=0)
    denom = depth * jnp.where(jnp.abs(ndotr) < 1e-6, -1e-6, ndotr)
    if geom_consistency:
        # reference pixel coords (for the reprojection error target)
        pxr = Kr[0, 0] * rays[0] / rays[2] + Kr[0, 2]
        pyr = Kr[1, 1] * rays[1] / rays[2] + Kr[1, 2]

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


def make_pallas_view_costs(
    ref, srcs, rays, Ks_all, R_rel, t_rel, Kr,
    w_off, ref_off, w_sum, ref_mean, ref_var, offsets, sigma_color,
    geom_consistency, src_depths, geom_w, geom_max_cost, window_radius,
    interpret=None, pack_pairs=True,
):
    """Build a view_costs(depth, normal) closure over the Pallas kernel.

    Pads inputs to the pm_kernels band/tile geometry once (loop-invariant:
    the bilateral window weights w_off and w_off*ref_off stream into the
    kernel per tile, so in-kernel work is just warp + gather-sample +
    accumulate) and per call computes center-warp fields -> per-tile band
    origins -> banded gather cost kernel. Matches view_costs_xla on
    interior pixels whose warped windows fit the per-tile source band.
    """
    from pycolmap_tpu.mvs import pm_kernels as pmk

    H, W = ref.shape
    Hp = max(-(-H // 8) * 8, pmk.BAND_Y)
    Wp = max(-(-W // 128) * 128, pmk.BAND_X)
    pad3 = ((0, 0), (0, Hp - H), (0, Wp - W))
    src_pad = jnp.pad(srcs, pad3)
    stats_pad = jnp.pad(jnp.stack([w_sum, ref_mean, ref_var]), pad3)
    w_pad = jnp.pad(w_off, pad3)
    wr_pad = jnp.pad(w_off * ref_off, pad3)
    if geom_consistency:
        sdep_pad = jnp.pad(src_depths, pad3)
    else:
        sdep_pad = src_pad  # placeholder of the right shape (unused)
    params = _pm_view_params(
        R_rel, t_rel, Ks_all, Kr, sigma_color, geom_w, geom_max_cost
    )
    m_base = jnp.einsum("kij,jhw->kihw", R_rel, rays)  # loop-invariant
    offs = jnp.asarray(np.asarray(offsets), jnp.float32)  # [nw, 2] (dy, dx)
    if interpret is None:
        interpret = pmk.interpret_default()

    def view_costs(depth, normal):
        d_pad = jnp.pad(depth, ((0, Hp - H), (0, Wp - W)))
        n_pad = jnp.pad(normal, ((0, 0), (0, Hp - H), (0, Wp - W)))
        # center-pixel warp field (scale = 1/d at the center ray)
        m = m_base + t_rel[:, :, None, None] / jnp.maximum(depth, 1e-9)
        z = jnp.where(jnp.abs(m[:, 2]) < 1e-9, 1e-9, m[:, 2])
        u_c = (
            Ks_all[:, 0, 0, None, None] * (m[:, 0] / z)
            + Ks_all[:, 0, 2, None, None] - 0.5
        )
        v_c = (
            Ks_all[:, 1, 1, None, None] * (m[:, 1] / z)
            + Ks_all[:, 1, 2, None, None] - 0.5
        )
        bad = m[:, 2] <= 0
        u_c = jnp.where(bad, jnp.float32(1e9), u_c)
        v_c = jnp.where(bad, jnp.float32(1e9), v_c)
        y0, x0 = pmk.band_origins(v_c, u_c, Hp, Wp, window_radius)
        cost = pmk.pm_view_costs_pallas(
            src_pad, sdep_pad, w_pad, wr_pad, d_pad, n_pad, stats_pad,
            params, offs, y0, x0, H, W,
            geom=geom_consistency, interpret=interpret,
            pack_pairs=pack_pairs,
        )
        return cost[:, :H, :W]

    return view_costs


@functools.partial(
    jax.jit,
    static_argnames=("num_iterations", "window_radius", "window_step",
                     "geom_consistency", "pallas"),
)
def patch_match_kernel(
    key, ref, srcs, rays, Ks_all, R_rel, t_rel,
    depth0, normal0, depth_min, depth_max,
    sigma_color, ncc_sigma,
    num_iterations, window_radius, window_step,
    geom_consistency=False, Kr=None, Ks_inv=None, src_depths=None,
    geom_w=0.3, geom_max_cost=3.0, pallas=None,
):
    """Run PatchMatch for one reference image.

    ref [H, W]; srcs [K, H, W]; rays [3, H, W] (K_r^-1 pixel rays);
    Ks_all [K, 3, 3] source calibrations; R_rel [K,3,3], t_rel [K,3];
    depth0 [H, W]; normal0 [3, H, W]. With geom_consistency: Ks_inv
    [K, 3, 3], src_depths [K, H, W] source depth maps from the photometric
    pass; per-view cost adds geom_w * min(fwd-bwd reprojection err,
    geom_max_cost) (ref: pipeline/mvs.h:129-135 geom_consistency options;
    upstream ComputeGeomConsistencyCost). Kr [3, 3] reference calibration:
    required for geom_consistency and for the Pallas fast path.
    pallas: force (True/False) or auto-select (None) the Pallas cost kernel;
    resolved at trace time, so pass it explicitly to defeat the jit cache.
    Returns (depth, normal [3,H,W], cost [H, W]).
    """
    H, W = ref.shape
    offsets = _window_offsets(window_radius, window_step)

    parity = (
        jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        + jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    ) % 2

    # precompute shifted window planes (loop-invariant): [nw, ...]
    sg = (max(window_radius, 1) / 1.5) ** 2
    ref_off = jnp.stack(
        [jnp.roll(ref, (-dy, -dx), axis=(0, 1)) for dy, dx in offsets]
    )  # [nw, H, W]
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

    use_pallas = (Kr is not None) and (
        pallas if pallas is not None else _pm_pallas_enabled()
    )
    if use_pallas:
        view_costs = make_pallas_view_costs(
            ref, srcs, rays, Ks_all, R_rel, t_rel, Kr,
            w_off, ref_off, w_sum, ref_mean, ref_var, offsets, sigma_color,
            geom_consistency, src_depths, geom_w, geom_max_cost,
            window_radius,
        )
    else:
        rays_off = jnp.stack(
            [jnp.roll(rays, (-dy, -dx), axis=(1, 2)) for dy, dx in offsets]
        )  # [nw, 3, H, W]

        def view_costs(depth, normal):
            return view_costs_xla(
                depth, normal, srcs, rays, R_rel, t_rel, Ks_all,
                rays_off, ref_off, w_off, w_sum, ref_mean, ref_var,
                geom_consistency, Kr, Ks_inv, src_depths,
                geom_w, geom_max_cost,
            )

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

    def random_depths(key_t, key_j):
        """Random-search depth candidates.

        The Pallas path draws one depth per 8x128 tile (so a tile's warped
        window footprint stays inside its source band) plus a +-10%
        per-pixel jitter for intra-tile diversity; the XLA path draws
        per-pixel, matching upstream's per-pixel random search.
        """
        if not use_pallas:
            return jax.random.uniform(
                key_t, (H, W), minval=depth_min, maxval=depth_max
            )
        nty, ntx = -(-H // 8), -(-W // 128)
        d_t = jax.random.uniform(
            key_t, (nty, ntx), minval=depth_min, maxval=depth_max
        )
        d_r = jnp.repeat(jnp.repeat(d_t, 8, axis=0), 128, axis=1)[:H, :W]
        jit_px = jax.random.uniform(key_j, (H, W), minval=0.9, maxval=1.1)
        return jnp.clip(d_r * jit_px, depth_min, depth_max)

    def step(carry, inputs):
        depth, normal, _ = carry
        key, color = inputs
        keys = jax.random.split(key, 5)
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
        d_r = random_depths(keys[2], keys[4])
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
