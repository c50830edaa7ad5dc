"""Stereo fusion: consistent depth-map pixels -> dense colored point cloud.

API parity: pycolmap/pipeline/mvs.h:43-90 (``stereo_fusion``,
StereoFusionOptions :193-243). Vectorized re-design of the upstream
consistency-graph traversal: every pixel's backprojection is checked against
all source depth maps at once (reprojection/depth/normal agreement), and
duplicate surface samples are merged by voxel hashing at a resolution tied
to scene scale — the batched analog of the reference's fusion BFS.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from pycolmap_tpu.mvs.depth_map_io import depth_map_path, normal_map_path, read_mat
from pycolmap_tpu.mvs.workspace import MVSModel
from pycolmap_tpu.pipeline.images import read_image_rgb
from pycolmap_tpu.utils import logging as _logging
from pycolmap_tpu.utils.options import BaseOptions, options_dataclass


@options_dataclass
class StereoFusionOptions(BaseOptions):
    """Mirrors reference StereoFusionOptions (pipeline/mvs.h:193-243)."""

    mask_path: str = ""
    num_threads: int = -1
    max_image_size: int = -1
    min_num_pixels: int = 5
    max_num_pixels: int = 10000
    max_traversal_depth: int = 100
    max_reproj_error: float = 2.0
    max_depth_error: float = 0.01
    max_normal_error: float = 10.0
    check_num_images: int = 50
    use_cache: bool = False
    cache_size: float = 32.0
    bounding_box: tuple = None


def stereo_fusion(
    output_path,
    workspace_path,
    workspace_format: str = "COLMAP",
    pmvs_option_name: str = "option-all",
    input_type: str = "geometric",
    options: StereoFusionOptions = None,
):
    """Fuse depth maps into a dense PLY point cloud. Returns (xyz, rgb)."""
    if options is None:
        options = StereoFusionOptions()
    log = _logging.get_logger()
    workspace_path = Path(workspace_path)
    model = MVSModel(workspace_path)

    depths = {}
    normals = {}
    colors = {}
    Ks = {}
    for iid, m in model.images.items():
        p = depth_map_path(workspace_path, m.name, input_type)
        if not p.exists():
            p = depth_map_path(workspace_path, m.name, "photometric")
            if not p.exists():
                continue
        depths[iid] = read_mat(p)
        np_path = normal_map_path(workspace_path, m.name, input_type)
        if not np_path.exists():
            np_path = normal_map_path(workspace_path, m.name, "photometric")
        normals[iid] = read_mat(np_path) if np_path.exists() else None
        img_file = workspace_path / "images" / m.name
        rgb = read_image_rgb(img_file) if img_file.exists() else None
        h, w = depths[iid].shape
        if rgb is not None and rgb.shape[:2] != (h, w):
            from PIL import Image as PILImage

            rgb = np.asarray(
                PILImage.fromarray(rgb).resize((w, h), PILImage.BILINEAR)
            )
        colors[iid] = rgb
        K = m.K.copy()
        K[0] *= w / m.width
        K[1] *= h / m.height
        Ks[iid] = K

    fused_xyz = []
    fused_rgb = []
    fused_normal = []
    fused_vis_counts = []
    fused_vis_flat = []
    min_consistent = max(options.min_num_pixels // 2, 2)
    for iid, m in model.images.items():
        if iid not in depths:
            continue
        d_ref = depths[iid]
        H, W = d_ref.shape
        valid = d_ref > 0
        if not valid.any():
            continue
        K = Ks[iid]
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
        rays = np.stack(
            [
                (xx + 0.5 - K[0, 2]) / K[0, 0],
                (yy + 0.5 - K[1, 2]) / K[1, 1],
                np.ones_like(xx),
            ]
        )
        X_cam = rays * d_ref[None]
        X_w = np.einsum("ji,jhw->ihw", m.R, X_cam - m.t[:, None, None])

        num_consistent = np.zeros((H, W), dtype=np.int32)
        src_flags = []  # (sid, consistent[H, W]) for the .vis output
        cos_max_normal = np.cos(np.deg2rad(options.max_normal_error))
        for sid in m.src_ids[: options.check_num_images]:
            if sid not in depths:
                continue
            s = model.images[sid]
            Ksrc = Ks[sid]
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
            rel = np.abs(d_src - z) / np.maximum(z, 1e-9)
            consistent = ok & (d_src > 0) & (rel < options.max_depth_error)
            # reprojection check (ref StereoFusionOptions::max_reproj_error):
            # the source pixel's own 3D point must land within the
            # threshold of the reference pixel it is supporting
            if np.any(consistent):
                uis = np.clip(ui, 0, ws - 1)
                vis = np.clip(vi, 0, hs - 1)
                rays_s = np.stack(
                    [
                        (uis + 0.5 - Ksrc[0, 2]) / Ksrc[0, 0],
                        (vis + 0.5 - Ksrc[1, 2]) / Ksrc[1, 1],
                        np.ones_like(u),
                    ]
                )
                Xs_pt = rays_s * d_src[None]
                Xw_s = np.einsum(
                    "ji,jhw->ihw", s.R, Xs_pt - s.t[:, None, None]
                )
                Xr = np.einsum("ij,jhw->ihw", m.R, Xw_s) + m.t[:, None, None]
                zr = np.maximum(Xr[2], 1e-9)
                ur = K[0, 0] * Xr[0] / zr + K[0, 2]
                vr = K[1, 1] * Xr[1] / zr + K[1, 2]
                reproj = np.hypot(ur - (xx + 0.5), vr - (yy + 0.5))
                consistent &= reproj < options.max_reproj_error
                # normal agreement (ref max_normal_error), when both views
                # carry normal maps (camera-frame -> world via R^T)
                if normals.get(iid) is not None and normals.get(sid) is not None:
                    n_ref_w = np.einsum("ji,hwj->hwi", m.R, normals[iid])
                    n_src_cam = normals[sid][vis, uis]
                    n_src_w = np.einsum("ji,hwj->hwi", s.R, n_src_cam)
                    cosang = np.sum(n_ref_w * n_src_w, axis=-1)
                    consistent &= cosang > cos_max_normal
            num_consistent += consistent.astype(np.int32)
            src_flags.append((sid, consistent))

        keep = valid & (num_consistent >= min_consistent)
        if not keep.any():
            continue
        pts = X_w[:, keep].T
        # per-point visibility (ref image + consistent sources): the
        # reference's fused.ply.vis payload, consumed by dense Delaunay
        # meshing for sight-ray carving (mvs/meshing.py)
        vis_ids = np.array([iid] + [sid for sid, _ in src_flags], np.uint32)
        vis_mask = np.vstack(
            [np.ones(int(keep.sum()), bool)]
            + [flag[keep] for _, flag in src_flags]
        ).T  # [P, 1 + S], row-major nonzero groups ids per point
        fused_vis_counts.append(vis_mask.sum(axis=1).astype(np.uint32))
        fused_vis_flat.append(vis_ids[np.nonzero(vis_mask)[1]])
        if colors[iid] is not None:
            cols = colors[iid][keep]
        else:
            cols = np.full((len(pts), 3), 128, dtype=np.uint8)
        if normals[iid] is not None:
            n_cam = normals[iid][keep]  # [N, 3] in camera frame
            n_w = n_cam @ m.R  # R^T n
        else:
            # fall back to the (negated) viewing ray
            n_w = -(pts - (-(m.R.T @ m.t))[None, :])
            n_w /= np.maximum(np.linalg.norm(n_w, axis=1, keepdims=True), 1e-9)
        fused_xyz.append(pts)
        fused_rgb.append(cols)
        fused_normal.append(n_w)

    if not fused_xyz:
        xyz = np.zeros((0, 3))
        rgb = np.zeros((0, 3), dtype=np.uint8)
        nrm = np.zeros((0, 3))
        vis_counts = np.zeros(0, np.uint32)
        vis_flat = np.zeros(0, np.uint32)
    else:
        xyz = np.concatenate(fused_xyz)
        rgb = np.concatenate(fused_rgb)
        nrm = np.concatenate(fused_normal)
        vis_counts = np.concatenate(fused_vis_counts)
        vis_flat = np.concatenate(fused_vis_flat)
        # voxel dedup at scene-adaptive resolution
        if len(xyz):
            span = np.percentile(xyz, 95, axis=0) - np.percentile(xyz, 5, axis=0)
            voxel = max(float(np.max(span)) / 2048.0, 1e-6)
            keys = np.floor(xyz / voxel).astype(np.int64)
            _, idx = np.unique(keys, axis=0, return_index=True)
            xyz = xyz[idx]
            rgb = rgb[idx]
            nrm = nrm[idx]
            vis_counts, vis_flat = _select_vis(vis_counts, vis_flat, idx)

    _write_ply(output_path, xyz, rgb, nrm)
    write_fused_vis(str(output_path) + ".vis", vis_counts, vis_flat)
    log.info(f"stereo_fusion: {len(xyz)} fused points -> {output_path}")
    return xyz, rgb


def _cumsum0(a):
    """[0, a0, a0+a1, ...] with int64 accumulation."""
    out = np.zeros(len(a) + 1, np.int64)
    np.cumsum(a, dtype=np.int64, out=out[1:])
    return out


def _select_vis(counts, flat, idx):
    """Subset ragged per-point visibility lists to the selected points."""
    offsets = _cumsum0(counts)
    cnts = counts[idx].astype(np.int64)
    total = int(cnts.sum())
    # ragged gather: each output block = its source start + 0..cnt-1
    block_base = np.repeat(offsets[idx], cnts)
    within = np.arange(total) - np.repeat(_cumsum0(cnts)[:-1], cnts)
    return cnts.astype(np.uint32), flat[block_base + within]


def write_fused_vis(path, counts, flat):
    """COLMAP fused.ply.vis: uint64 N, then per point uint32 count followed
    by that many uint32 image ids (ref mvs/fusion.cc WritePointsVisibility)."""
    counts = np.asarray(counts, np.uint32)
    flat = np.asarray(flat, np.uint32)
    n = len(counts)
    buf = np.empty(n + len(flat), np.uint32)
    # interleave: each point's count sits before its ids
    out_start = _cumsum0(counts)[:-1] + np.arange(n)
    buf[out_start] = counts
    mask = np.ones(len(buf), bool)
    mask[out_start] = False
    buf[mask] = flat
    with open(path, "wb") as f:
        f.write(np.uint64(n).tobytes())
        f.write(buf.astype("<u4").tobytes())


def read_fused_vis(path):
    """Read fused.ply.vis -> (counts uint32 [N], flat uint32 ids)."""
    raw = np.fromfile(path, dtype=np.uint8)
    n = int(np.frombuffer(raw[:8].tobytes(), dtype="<u8")[0])
    buf = np.frombuffer(raw[8:].tobytes(), dtype="<u4")
    counts = np.empty(n, np.uint32)
    pos = 0
    starts = np.empty(n, np.int64)
    # counts are self-delimiting; one pass to locate them
    for i in range(n):
        counts[i] = buf[pos]
        starts[i] = pos + 1
        pos += 1 + int(buf[pos])
    mask = np.ones(len(buf), bool)
    mask[starts - 1] = False
    return counts, buf[mask]


def _write_ply(path, xyz, rgb, normals=None):
    """COLMAP-style fused PLY: position + normal + color per vertex."""
    with open(path, "wb") as f:
        header = (
            "ply\nformat binary_little_endian 1.0\n"
            f"element vertex {len(xyz)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property float nx\nproperty float ny\nproperty float nz\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            "end_header\n"
        )
        f.write(header.encode("ascii"))
        if normals is None:
            normals = np.zeros_like(xyz)
        rec = np.empty(
            len(xyz),
            dtype=np.dtype(
                [("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                 ("nx", "<f4"), ("ny", "<f4"), ("nz", "<f4"),
                 ("r", "u1"), ("g", "u1"), ("b", "u1")]
            ),
        )
        rec["x"], rec["y"], rec["z"] = xyz[:, 0], xyz[:, 1], xyz[:, 2]
        rec["nx"], rec["ny"], rec["nz"] = (
            normals[:, 0], normals[:, 1], normals[:, 2],
        )
        rec["r"], rec["g"], rec["b"] = rgb[:, 0], rgb[:, 1], rgb[:, 2]
        f.write(rec.tobytes())
