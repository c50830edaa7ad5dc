"""PatchMatch stereo controller: photometric + geometric passes.

Orchestrates per-image PatchMatch over a COLMAP-undistorted workspace
(ref: pipeline/mvs.h:21-41 patch_match_stereo semantics). Pass structure
mirrors the upstream controller: a photometric pass for every image, then —
when ``geom_consistency`` — a second PatchMatch pass whose cost adds the
forward-backward reprojection-error term against the photometric depth maps
of the source views, initialized from the image's own photometric result
(upstream patch_match_controller.cc ProcessProblem). Optional count-based
filtering and consistency-graph output follow.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from pycolmap_tpu.mvs.consistency_graph import (
    consistency_graph_path,
    write_consistency_graph,
)
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


def _image_problem(model, images, iid):
    """Per-reference-image geometry: sources, relative poses, rays."""
    m = model.images[iid]
    ref_img, Kr = images[iid]
    H, W = ref_img.shape
    srcs, Ks_all, R_rel, t_rel = [], [], [], []
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
    Ks_all = np.stack(Ks_all).astype(np.float32)
    R_rel = np.stack(R_rel).astype(np.float32)
    t_rel = np.stack(t_rel).astype(np.float32)

    Kr_inv = np.linalg.inv(Kr)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    pix = np.stack([xx + 0.5, yy + 0.5, np.ones_like(xx)])
    rays = np.einsum("ij,jhw->ihw", Kr_inv, pix).astype(np.float32)
    return m, ref_img, Kr, srcs, Ks_all, R_rel, t_rel, rays


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

    def run_pass(kind, photo_depths=None, photo_normals=None):
        results = {}
        for iid, m0 in model.images.items():
            if not m0.src_ids:
                continue
            (m, ref_img, Kr, srcs, Ks_all, R_rel, t_rel, rays) = _image_problem(
                model, images, iid
            )
            H, W = ref_img.shape
            d_min = options.depth_min if options.depth_min > 0 else m.depth_min
            d_max = options.depth_max if options.depth_max > 0 else m.depth_max
            if d_max <= d_min:
                d_min, d_max = 0.1, 100.0

            geom = kind == "geometric"
            if geom:
                depth0 = photo_depths[iid]
                normal0 = photo_normals[iid]
                src_depths = np.stack(
                    [
                        photo_depths.get(sid, np.zeros((H, W), np.float32))
                        for sid in m.src_ids
                    ]
                )
                extra = dict(
                    geom_consistency=True,
                    Kr=jnp.asarray(Kr.astype(np.float32)),
                    Ks_inv=jnp.asarray(
                        np.linalg.inv(Ks_all).astype(np.float32)
                    ),
                    src_depths=jnp.asarray(src_depths),
                    geom_w=jnp.float32(options.geom_consistency_regularizer),
                    geom_max_cost=jnp.float32(
                        options.geom_consistency_max_cost
                    ),
                )
            else:
                rng = np.random.default_rng(iid)
                # one depth draw per 8x128 tile + per-pixel jitter: keeps
                # each tile's warped footprint band-coherent for the Pallas
                # cost kernel while retaining per-pixel sample diversity
                base = rng.uniform(d_min, d_max, (-(-H // 8), -(-W // 128)))
                depth0 = np.repeat(np.repeat(base, 8, 0), 128, 1)[:H, :W]
                depth0 = np.clip(
                    depth0 * rng.uniform(0.9, 1.1, (H, W)), d_min, d_max
                ).astype(np.float32)
                n0 = -rays / np.maximum(np.linalg.norm(rays, axis=0), 1e-9)
                normal0 = n0.astype(np.float32)
                extra = dict(Kr=jnp.asarray(Kr.astype(np.float32)))

            depth, normal, cost = patch_match_kernel(
                jax.random.PRNGKey(iid),
                jnp.asarray(ref_img), jnp.asarray(srcs), jnp.asarray(rays),
                jnp.asarray(Ks_all), jnp.asarray(R_rel), jnp.asarray(t_rel),
                jnp.asarray(depth0), jnp.asarray(normal0),
                jnp.float32(d_min), jnp.float32(d_max),
                jnp.float32(options.sigma_color),
                jnp.float32(options.ncc_sigma),
                int(options.num_iterations), int(options.window_radius),
                int(options.window_step),
                **extra,
            )
            results[iid] = (
                np.asarray(depth), np.asarray(normal), np.asarray(cost)
            )
            write_mat(
                depth_map_path(workspace_path, m.name, kind), results[iid][0]
            )
            write_mat(
                normal_map_path(workspace_path, m.name, kind),
                results[iid][1].transpose(1, 2, 0),
            )
            log.info(
                f"patch_match[{kind}] {m.name}: "
                f"{np.mean(results[iid][0] > 0) * 100:.0f}% valid depth"
            )
        return results

    photo = run_pass("photometric")
    if not options.geom_consistency:
        if options.filter:
            for iid, (depth, normal, cost) in photo.items():
                m = model.images[iid]
                bad = cost > (1.0 - options.filter_min_ncc)
                depth = np.where(bad, 0.0, depth)
                write_mat(
                    depth_map_path(workspace_path, m.name, "photometric"),
                    depth,
                )
        return

    photo_depths = {iid: r[0] for iid, r in photo.items()}
    photo_normals = {iid: r[1] for iid, r in photo.items()}
    geo = run_pass("geometric", photo_depths, photo_normals)
    geometric_consistency_filter(
        workspace_path, model, images,
        {iid: r[0] for iid, r in geo.items()},
        {iid: r[2] for iid, r in geo.items()},
        options,
    )


def geometric_consistency_filter(
    workspace_path, model, images, depths, costs, options
):
    """Cross-view depth-agreement filter on the geometric maps + optional
    consistency-graph output (upstream PatchMatch::Run filtering)."""
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
        consistent = np.zeros((len(m.src_ids), H, W), dtype=bool)
        for si, sid in enumerate(m.src_ids):
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
            consistent[si] = ok & (d_src > 0) & (rel_err < 0.01)
        if options.write_consistency_graph:
            write_consistency_graph(
                consistency_graph_path(workspace_path, m.name, "geometric"),
                consistent,
            )
        if options.filter:
            num_consistent = consistent.sum(axis=0)
            keep = num_consistent >= options.filter_min_num_consistent
            if iid in costs:
                # final cost includes the geom term; bound it accordingly
                max_cost = (1.0 - options.filter_min_ncc) + (
                    options.geom_consistency_regularizer
                    * options.geom_consistency_max_cost
                )
                keep &= costs[iid] <= max_cost
            d_geo = np.where(keep, d_ref, 0.0)
            write_mat(
                depth_map_path(workspace_path, m.name, "geometric"), d_geo
            )
