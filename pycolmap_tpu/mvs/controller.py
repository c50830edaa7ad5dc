"""PatchMatch stereo controller + geometric consistency filtering.

Orchestrates per-image PatchMatch over a COLMAP-undistorted workspace
(ref: pipeline/mvs.h:21-41 patch_match_stereo semantics): photometric pass
for every image, then a geometric-consistency pass that cross-validates
depths between views and writes ``geometric`` maps.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from pycolmap_tpu.mvs.depth_map_io import (
    depth_map_path,
    normal_map_path,
    write_mat,
    read_mat,
)
from pycolmap_tpu.mvs.patch_match import PatchMatchOptions, patch_match_kernel
from pycolmap_tpu.mvs.workspace import MVSModel
from pycolmap_tpu.pipeline.images import read_image_gray
from pycolmap_tpu.utils import logging as _logging


def _prepare_image_data(model, iid, image_dir, max_size):
    m = model.images[iid]
    img = read_image_gray(Path(image_dir) / m.name)
    if max_size > 0 and max(img.shape) > max_size:
        scale = max_size / max(img.shape)
        nh, nw = int(img.shape[0] * scale), int(img.shape[1] * scale)
        img = np.asarray(
            jax.image.resize(jnp.asarray(img), (nh, nw), method="bilinear")
        )
    K = m.K.copy()
    K[0] *= img.shape[1] / m.width
    K[1] *= img.shape[0] / m.height
    return img, K


def patch_match_stereo(
    workspace_path,
    workspace_format: str = "COLMAP",
    pmvs_option_name: str = "option-all",
    options: PatchMatchOptions = None,
):
    """Compute photometric + geometric depth/normal maps for all images."""
    if options is None:
        options = PatchMatchOptions()
    log = _logging.get_logger()
    workspace_path = Path(workspace_path)
    image_dir = workspace_path / "images"
    for sub in ("stereo/depth_maps", "stereo/normal_maps"):
        (workspace_path / sub).mkdir(parents=True, exist_ok=True)

    model = MVSModel(workspace_path)
    images = {}
    for iid, m in model.images.items():
        img, K = _prepare_image_data(model, iid, image_dir, options.max_image_size)
        images[iid] = (img.astype(np.float32), K)

    # ---- photometric pass -------------------------------------------------
    for iid, m in model.images.items():
        if not m.src_ids:
            continue
        ref_img, Kr = images[iid]
        H, W = ref_img.shape
        srcs = []
        Ks_all = []
        R_rel = []
        t_rel = []
        for sid in m.src_ids:
            s = model.images[sid]
            src_img, Ksrc = images[sid]
            if src_img.shape != ref_img.shape:
                src_img = np.asarray(
                    jax.image.resize(jnp.asarray(src_img), (H, W), "bilinear")
                )
            srcs.append(src_img)
            Ks_all.append(Ksrc)
            Rr = s.R @ m.R.T
            R_rel.append(Rr)
            t_rel.append(s.t - Rr @ m.t)
        srcs = np.stack(srcs)
        Ks_all = np.stack(Ks_all)
        R_rel = np.stack(R_rel)
        t_rel = np.stack(t_rel)

        Kr_inv = np.linalg.inv(Kr)
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
        pix = np.stack([xx + 0.5, yy + 0.5, np.ones_like(xx)])
        rays = np.einsum("ij,jhw->ihw", Kr_inv, pix).astype(np.float32)

        d_min = options.depth_min if options.depth_min > 0 else m.depth_min
        d_max = options.depth_max if options.depth_max > 0 else m.depth_max
        if d_max <= d_min:
            d_min, d_max = 0.1, 100.0

        rng = np.random.default_rng(iid)
        depth0 = rng.uniform(d_min, d_max, (H, W)).astype(np.float32)
        n0 = -rays / np.maximum(np.linalg.norm(rays, axis=0), 1e-9)
        normal0 = n0.astype(np.float32)

        depth, normal, cost = patch_match_kernel(
            jax.random.PRNGKey(iid),
            jnp.asarray(ref_img), jnp.asarray(srcs), jnp.asarray(rays),
            jnp.asarray(Ks_all.astype(np.float32)),
            jnp.asarray(R_rel.astype(np.float32)),
            jnp.asarray(t_rel.astype(np.float32)),
            jnp.asarray(depth0), jnp.asarray(normal0),
            jnp.float32(d_min), jnp.float32(d_max),
            jnp.float32(options.sigma_color), jnp.float32(options.ncc_sigma),
            int(options.num_iterations), int(options.window_radius),
            int(options.window_step),
        )
        depth = np.asarray(depth)
        normal = np.asarray(normal)
        cost = np.asarray(cost)
        if options.filter:
            bad = cost > (1.0 - options.filter_min_ncc)
            depth = np.where(bad, 0.0, depth)
        write_mat(depth_map_path(workspace_path, m.name, "photometric"), depth)
        write_mat(
            normal_map_path(workspace_path, m.name, "photometric"),
            normal.transpose(1, 2, 0),
        )
        log.info(
            f"patch_match {m.name}: {np.mean(depth > 0)*100:.0f}% valid depth"
        )

    # ---- geometric consistency pass --------------------------------------
    if options.geom_consistency:
        geometric_consistency_filter(workspace_path, model, images, options)


def geometric_consistency_filter(workspace_path, model, images, options):
    """Cross-view depth agreement -> geometric depth maps (upstream
    geom_consistency semantics, vectorized over whole maps)."""
    depths = {}
    for iid, m in model.images.items():
        p = depth_map_path(workspace_path, m.name, "photometric")
        if p.exists():
            depths[iid] = read_mat(p)
    for iid, m in model.images.items():
        if iid not in depths:
            continue
        d_ref = depths[iid]
        H, W = d_ref.shape
        ref_img, Kr = images[iid]
        Kr_inv = np.linalg.inv(Kr)
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
        pix = np.stack([xx + 0.5, yy + 0.5, np.ones_like(xx)])
        rays = np.einsum("ij,jhw->ihw", Kr_inv, pix)
        X_cam = rays * d_ref[None]
        # to world
        X_w = np.einsum("ji,jhw->ihw", m.R, X_cam - m.t[:, None, None])
        num_consistent = np.zeros((H, W), dtype=np.int32)
        for sid in m.src_ids:
            if sid not in depths:
                continue
            s = model.images[sid]
            src_img, Ksrc = images[sid]
            Xs = np.einsum("ij,jhw->ihw", s.R, X_w) + s.t[:, None, None]
            z = Xs[2]
            u = Ksrc[0, 0] * Xs[0] / np.maximum(z, 1e-9) + Ksrc[0, 2]
            v = Ksrc[1, 1] * Xs[1] / np.maximum(z, 1e-9) + Ksrc[1, 2]
            ui = np.round(u - 0.5).astype(int)
            vi = np.round(v - 0.5).astype(int)
            hs, ws = depths[sid].shape
            ok = (z > 0) & (ui >= 0) & (ui < ws) & (vi >= 0) & (vi < hs)
            d_src = np.zeros((H, W))
            d_src[ok] = depths[sid][vi[ok], ui[ok]]
            rel_err = np.abs(d_src - z) / np.maximum(z, 1e-9)
            num_consistent += (ok & (d_src > 0) & (rel_err < 0.01)).astype(
                np.int32
            )
        d_geo = np.where(
            num_consistent >= options.filter_min_num_consistent, d_ref, 0.0
        )
        write_mat(depth_map_path(workspace_path, m.name, "geometric"), d_geo)
        n_path = normal_map_path(workspace_path, m.name, "photometric")
        if n_path.exists():
            write_mat(
                normal_map_path(workspace_path, m.name, "geometric"),
                read_mat(n_path),
            )
