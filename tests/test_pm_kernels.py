"""Pallas PatchMatch cost kernel vs the XLA reference formulation.

The banded tent-matmul kernel (mvs/pm_kernels.py) must reproduce
view_costs_xla on interior pixels (the XLA path's roll-based window planes
wrap at borders; the kernel zero-pads). Runs in interpreter mode (CPU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pycolmap_tpu.mvs import patch_match as pm
from pycolmap_tpu.mvs import pm_kernels as pmk


def _texture(rng, H, W, n_waves=12):
    """Smooth band-limited texture in [0, 1] (differentiable NCC surface)."""
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    img = np.zeros((H, W), np.float32)
    for _ in range(n_waves):
        fy, fx = rng.uniform(-0.5, 0.5, 2)
        ph = rng.uniform(0, 2 * np.pi)
        img += rng.uniform(0.2, 1.0) * np.sin(fy * yy + fx * xx + ph)
    img -= img.min()
    return (img / img.max()).astype(np.float32)


def _scene(H=40, W=60, K=2, seed=0):
    rng = np.random.default_rng(seed)
    f = 55.0
    Kmat = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    pix = np.stack([xx + 0.5, yy + 0.5, np.ones_like(xx)])
    rays = np.einsum(
        "ij,jhw->ihw", np.linalg.inv(Kmat), pix
    ).astype(np.float32)
    ref = _texture(rng, H, W)
    srcs = np.stack([_texture(rng, H, W, 10) for _ in range(K)])
    th = 0.03
    Rz = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0],
         [0, 0, 1]], np.float32,
    )
    R_rel = np.stack([np.eye(3, dtype=np.float32), Rz])[:K]
    t_rel = np.array([[0.3, 0.1, 0.0], [-0.2, 0.05, 0.02]], np.float32)[:K]
    return ref, srcs, rays, Kmat, R_rel, t_rel


def _window_stats(ref, offsets, sg, sigma_color):
    ref_off = jnp.stack(
        [jnp.roll(ref, (-dy, -dx), axis=(0, 1)) for dy, dx in offsets]
    )
    rays = None  # unused here
    w_spatial = jnp.asarray(
        np.exp(
            -(offsets[:, 0] ** 2 + offsets[:, 1] ** 2) / (2 * sg)
        ).astype(np.float32)
    )
    w_off = (
        jnp.exp(-jnp.abs(ref_off - ref[None]) / sigma_color)
        * w_spatial[:, None, None]
    )
    w_sum = jnp.sum(w_off, axis=0)
    ref_mean = jnp.sum(w_off * ref_off, axis=0) / w_sum
    ref_var = jnp.maximum(
        jnp.sum(w_off * ref_off**2, axis=0) / w_sum - ref_mean**2, 1e-6
    )
    return ref_off, w_off, w_sum, ref_mean, ref_var


def _compare(geom, depth_field, normal_field, radius=2, step=2, atol=None,
             pack_pairs=True):
    # the default bf16-pair-packed band quantizes samples at 2^-9 relative
    # (r5, ROADMAP Perf #3): cost noise up to ~2e-2 on the [0, 2] scale;
    # pack_pairs=False keeps the exact-f32 path at 5e-3
    if atol is None:
        atol = 2.5e-2 if pack_pairs else 5e-3
    H, W, K = 40, 60, 2
    ref, srcs, rays, Kmat, R_rel, t_rel = _scene(H, W, K)
    offsets = pm._window_offsets(radius, step)
    sg = (max(radius, 1) / 1.5) ** 2
    sigma_color = jnp.float32(0.2)
    ref_j = jnp.asarray(ref)
    ref_off, w_off, w_sum, ref_mean, ref_var = _window_stats(
        ref_j, offsets, sg, sigma_color
    )
    rays_j = jnp.asarray(rays)
    rays_off = jnp.stack(
        [jnp.roll(rays_j, (-dy, -dx), axis=(1, 2)) for dy, dx in offsets]
    )
    depth = jnp.asarray(depth_field(H, W).astype(np.float32))
    normal = jnp.asarray(normal_field(rays).astype(np.float32))
    src_depths = jnp.asarray(
        np.broadcast_to(np.asarray(depth)[None], (K, H, W)).copy()
    )
    Ks_inv = jnp.asarray(np.stack([np.linalg.inv(Kmat)] * K))
    geom_w, geom_max = jnp.float32(0.3), jnp.float32(3.0)

    c_xla = pm.view_costs_xla(
        depth, normal, jnp.asarray(srcs), rays_j, jnp.asarray(R_rel),
        jnp.asarray(t_rel), jnp.asarray(np.stack([Kmat] * K)),
        rays_off, ref_off, w_off, w_sum, ref_mean, ref_var,
        geom, jnp.asarray(Kmat), Ks_inv, src_depths, geom_w, geom_max,
    )
    vc_pallas = pm.make_pallas_view_costs(
        ref_j, jnp.asarray(srcs), rays_j, jnp.asarray(np.stack([Kmat] * K)),
        jnp.asarray(R_rel), jnp.asarray(t_rel), jnp.asarray(Kmat),
        w_off, ref_off, w_sum, ref_mean, ref_var, offsets, sigma_color,
        geom, src_depths, geom_w, geom_max, radius, interpret=True,
        pack_pairs=pack_pairs,
    )
    c_pal = vc_pallas(depth, normal)
    assert c_pal.shape == (K, H, W)
    m = radius + 1
    a = np.asarray(c_xla)[:, m:-m, m:-m]
    b = np.asarray(c_pal)[:, m:-m, m:-m]
    # interior pixels whose window the XLA path could actually sample
    valid = a < 1.99
    assert valid.mean() > 0.7
    np.testing.assert_allclose(b[valid], a[valid], atol=atol, rtol=0)
    return a, b, valid


def test_pm_pallas_matches_xla_photometric():
    _compare(
        geom=False,
        depth_field=lambda H, W: np.full((H, W), 5.0),
        normal_field=lambda rays: -rays / np.linalg.norm(rays, axis=0),
    )


def test_pm_pallas_exact_path_matches_xla():
    # unpacked band: exact-f32 bilinear must match the XLA reference tightly
    _compare(
        geom=False,
        depth_field=lambda H, W: np.full((H, W), 5.0),
        normal_field=lambda rays: -rays / np.linalg.norm(rays, axis=0),
        pack_pairs=False,
    )


def test_pm_pallas_matches_xla_slanted_plane():
    def slanted(rays):
        n = np.array([0.35, 0.15, -1.0], np.float32)
        n /= np.linalg.norm(n)
        return np.broadcast_to(n[:, None, None], rays.shape).copy()

    def ramp(H, W):
        return 4.0 + 2.0 * np.linspace(0, 1, W)[None, :] * np.ones((H, 1))

    _compare(geom=False, depth_field=ramp, normal_field=slanted)


def test_pm_pallas_matches_xla_geometric():
    _compare(
        geom=True,
        depth_field=lambda H, W: np.full((H, W), 5.0),
        normal_field=lambda rays: -rays / np.linalg.norm(rays, axis=0),
    )


def test_pm_gather_row_sample_exact():
    """The chunked lane-gather sampler is exact bilinear on random bands."""
    rng = np.random.default_rng(3)
    band = rng.uniform(0, 1, (pmk.BAND_Y, pmk.BAND_X)).astype(np.float32)
    rv = rng.uniform(0, pmk.BAND_Y - 1.01, pmk.TILE_X).astype(np.float32)
    ru = rng.uniform(0, pmk.BAND_X - 1.01, pmk.TILE_X).astype(np.float32)
    chunks, chunks1 = pmk._band_chunks(jnp.asarray(band))
    out = np.asarray(
        pmk._gather_row_sample(
            chunks, chunks1, jnp.asarray(rv), jnp.asarray(ru),
            jnp.ones(pmk.TILE_X, bool),
        )
    )
    y0 = np.floor(rv).astype(int)
    x0 = np.floor(ru).astype(int)
    fy, fx = rv - y0, ru - x0
    ref = (
        band[y0, x0] * (1 - fy) * (1 - fx)
        + band[y0, x0 + 1] * (1 - fy) * fx
        + band[y0 + 1, x0] * fy * (1 - fx)
        + band[y0 + 1, x0 + 1] * fy * fx
    )
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_band_origins_alignment():
    K, H, W = 2, 40, 60
    Hp, Wp = 64, 384
    rng = np.random.default_rng(0)
    v_c = jnp.asarray(rng.uniform(-50, 100, (K, H, W)).astype(np.float32))
    u_c = jnp.asarray(rng.uniform(-50, 700, (K, H, W)).astype(np.float32))
    y0, x0 = pmk.band_origins(v_c, u_c, Hp, Wp, radius=5)
    T = (Hp // 8) * (Wp // 128)
    assert y0.shape == (K, T) and x0.shape == (K, T)
    y0n, x0n = np.asarray(y0), np.asarray(x0)
    assert ((y0n % 8) == 0).all() and ((x0n % 128) == 0).all()
    assert (y0n >= 0).all() and (y0n <= Hp - pmk.BAND_Y).all()
    assert (x0n >= 0).all() and (x0n <= Wp - pmk.BAND_X).all()


@pytest.mark.slow
def test_patch_match_kernel_pallas_end_to_end():
    """Full red/black kernel with the Pallas cost path (interpret mode):
    a perfectly consistent constant-depth scene keeps low interior cost."""
    H, W, K = 40, 60, 2
    ref, srcs, rays, Kmat, R_rel, t_rel = _scene(H, W, K)
    # render sources as exact warps of the reference plane at depth 5
    # (identity-pose sources sampling the same texture keeps this simple:
    # use the reference itself as both sources with zero motion)
    srcs = np.stack([ref] * K)
    R_rel = np.stack([np.eye(3, dtype=np.float32)] * K)
    t_rel = np.zeros((K, 3), np.float32)
    depth0 = np.full((H, W), 5.0, np.float32)
    normal0 = (-rays / np.linalg.norm(rays, axis=0)).astype(np.float32)
    depth, normal, cost = pm.patch_match_kernel(
        jax.random.PRNGKey(0),
        jnp.asarray(ref), jnp.asarray(srcs), jnp.asarray(rays),
        jnp.asarray(np.stack([Kmat] * K)), jnp.asarray(R_rel),
        jnp.asarray(t_rel),
        jnp.asarray(depth0), jnp.asarray(normal0),
        jnp.float32(1.0), jnp.float32(10.0),
        jnp.float32(0.2), jnp.float32(0.6),
        1, 2, 2,
        Kr=jnp.asarray(Kmat), pallas=True,
    )
    assert depth.shape == (H, W) and normal.shape == (3, H, W)
    inner = np.asarray(cost)[4:-4, 4:-4]
    assert np.median(inner) < 0.5
