"""Incremental triangulator: create/continue/merge/complete/retriangulate tracks.

API parity: pycolmap/sfm/incremental_triangulator.h (object API :81-90,
options :16-72). The reference triangulates one keypoint at a time; here all
candidate tracks of an image are flattened into padded [B, V] view tensors
and triangulated in one jitted kernel (DLT + cheirality + angular-error
inlier test + one reweighted refit) — the batched analog of upstream
Create/Continue semantics.
"""

from __future__ import annotations

import functools
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

from pycolmap_tpu.ops import solvers
from pycolmap_tpu.scene.point2d import INVALID_POINT3D_ID
from pycolmap_tpu.scene.track import Track, TrackElement
from pycolmap_tpu.utils.options import BaseOptions, options_dataclass


@options_dataclass
class IncrementalTriangulatorOptions(BaseOptions):
    """Defaults mirror reference options (incremental_triangulator.h:16-72)."""

    max_transitivity: int = 1
    create_max_angle_error: float = 2.0  # degrees
    continue_max_angle_error: float = 2.0
    merge_max_reproj_error: float = 4.0  # pixels
    complete_max_reproj_error: float = 4.0
    complete_max_transitivity: int = 5
    re_max_angle_error: float = 5.0
    re_min_ratio: float = 0.2
    re_max_trials: int = 1
    min_angle: float = 1.5
    ignore_two_view_tracks: bool = True
    min_focal_length_ratio: float = 0.1
    max_focal_length_ratio: float = 10.0
    max_extra_param: float = 1.0


MAX_TRACK_VIEWS = 16  # padded views per candidate track in the batched kernel


@functools.partial(jax.jit, static_argnames=())
def _triangulate_batch(proj, x_norm, centers, view_mask, max_angle_err_rad,
                       min_tri_angle_rad):
    """Batched robust triangulation.

    proj [B, V, 3, 4]; x_norm [B, V, 2]; centers [B, V, 3];
    view_mask [B, V] (1 = real view). Returns (X [B, 3], inlier [B, V],
    ok [B]).
    """
    w = view_mask
    X = solvers.triangulate_dlt(proj, x_norm, w)

    def eval_views(X):
        Xh = jnp.concatenate([X, jnp.ones_like(X[..., :1])], axis=-1)
        p = jnp.einsum("bvij,bj->bvi", proj, Xh)
        z = p[..., 2]
        front = z > 1e-6
        # angular error between observed and predicted rays
        pred = p / jnp.maximum(
            jnp.linalg.norm(p, axis=-1, keepdims=True), 1e-12
        )
        obs = jnp.concatenate([x_norm, jnp.ones_like(x_norm[..., :1])], axis=-1)
        obs = obs / jnp.maximum(jnp.linalg.norm(obs, axis=-1, keepdims=True), 1e-12)
        cosang = jnp.sum(pred * obs, axis=-1)
        ang_err = jnp.arccos(jnp.clip(cosang, -1.0, 1.0))
        inlier = front & (ang_err <= max_angle_err_rad) & (view_mask > 0)
        return inlier

    inlier1 = eval_views(X)
    # refit with inliers
    X2 = solvers.triangulate_dlt(proj, x_norm, inlier1.astype(proj.dtype))
    use_refit = jnp.sum(inlier1, axis=-1) >= 2
    X = jnp.where(use_refit[:, None], X2, X)
    inlier = eval_views(X)

    # max pairwise triangulation angle among inlier views
    rays = centers - X[:, None, :]
    rays = rays / jnp.maximum(jnp.linalg.norm(rays, axis=-1, keepdims=True), 1e-12)
    cos_pair = jnp.einsum("bvi,bwi->bvw", rays, rays)
    pair_ok = inlier[:, :, None] & inlier[:, None, :]
    ang = jnp.arccos(jnp.clip(cos_pair, -1.0, 1.0))
    ang = jnp.where(pair_ok, ang, 0.0)
    max_ang = jnp.max(ang, axis=(1, 2))

    ok = (jnp.sum(inlier, axis=-1) >= 2) & (max_ang >= min_tri_angle_rad)
    return X, inlier, ok


class IncrementalTriangulator:
    """Operates on a Reconstruction + CorrespondenceGraph (ref object API)."""

    def __init__(self, correspondence_graph, reconstruction,
                 options: IncrementalTriangulatorOptions = None,
                 link_index=None):
        self.graph = correspondence_graph
        self.reconstruction = reconstruction
        self.options = options if options is not None else IncrementalTriangulatorOptions()
        if link_index is None:
            from pycolmap_tpu.sfm.link_index import LinkIndex

            link_index = LinkIndex(correspondence_graph, reconstruction)
        self.link_index = link_index
        self._cam_cache = {}
        self._merge_trials = defaultdict(int)
        self._re_num_trials = defaultdict(int)
        # memoization: skip complete/merge for points whose tracks have not
        # changed since the last pass (the correspondence graph is static, so
        # a point's completion candidates only change when its track does)
        self._completed_at_len = {}
        self._merged_at_len = {}

    # -- helpers -------------------------------------------------------------
    def _camera_ok(self, camera) -> bool:
        o = self.options
        return not camera.has_bogus_params(
            o.min_focal_length_ratio, o.max_focal_length_ratio, o.max_extra_param
        )

    def _norm_xy(self, image_id, point2D_idx):
        """Normalized camera coords of a keypoint (cached per image)."""
        key = image_id
        if key not in self._cam_cache:
            img = self.reconstruction.images[image_id]
            cam = self.reconstruction.cameras[img.camera_id]
            self._cam_cache[key] = np.asarray(
                cam.cam_from_img(img.points2D_xy), dtype=np.float32
            ) if img.num_points2D else np.zeros((0, 2), dtype=np.float32)
        return self._cam_cache[key][point2D_idx]

    def clear_cache(self):
        self._cam_cache.clear()

    # -- main entry: triangulate all keypoints of one image ------------------
    def triangulate_image(self, image_id: int) -> int:
        """Create/continue tracks for every keypoint of the image
        (upstream TriangulateImage). Returns #completed observations."""
        rec = self.reconstruction
        img = rec.images[image_id]
        if not img.registered:
            return 0
        cam = rec.cameras[img.camera_id]
        if not self._camera_ok(cam):
            return 0
        opts = self.options
        num_tris = 0

        # pass 1: classify keypoints -> continuations vs creations.
        # Vectorized: one CSR slice for the whole image + one mask pass per
        # registered image, then a cheap loop over only the active keypoints.
        continue_obs = []  # (point2D_idx, first_pid, all_pids)
        create_cands = []  # (point2D_idx, [(image_id2, point2D_idx2), ...])
        p3d_ids = img.points2D_point3D_ids
        lix = self.link_index
        flat_pid, reg_flag = lix.refresh()
        indptr, nodes = lix.image_edges(image_id, img.num_points2D)
        cimgs = lix.node_image[nodes]
        cidxs = lix.node_idx[nodes]
        E = len(cimgs)
        if E:
            reg_edges = reg_flag[cimgs]
            pid_edges = np.where(reg_edges, flat_pid[nodes], -1)
            cs_link = np.concatenate([[0], np.cumsum(pid_edges >= 0)])
            cs_reg = np.concatenate([[0], np.cumsum(reg_edges)])
            for idx in range(img.num_points2D):
                if p3d_ids[idx] != np.uint64(INVALID_POINT3D_ID):
                    continue
                lo, hi = indptr[idx], indptr[idx + 1]
                if lo == hi or cs_reg[hi] == cs_reg[lo]:
                    continue
                if cs_link[hi] > cs_link[lo]:
                    seg = pid_edges[lo:hi]
                    pids_here = sorted(set(int(p) for p in seg[seg >= 0]))
                    continue_obs.append((idx, pids_here[0], pids_here))
                else:
                    seg_m = reg_edges[lo:hi]
                    reg_views = list(
                        zip(
                            cimgs[lo:hi][seg_m].tolist(),
                            cidxs[lo:hi][seg_m].tolist(),
                        )
                    )
                    create_cands.append((idx, reg_views))

        # pass 2: continuations — check angular error, then add observation
        for idx, pid, all_pids in continue_obs:
            pt = rec.points3D.get(pid)
            if pt is None:
                continue
            ang = self._angular_error(image_id, idx, pt.xyz)
            if ang <= np.deg2rad(opts.continue_max_angle_error):
                rec.add_observation(pid, TrackElement(image_id, idx))
                num_tris += 1
                # merge opportunity when multiple distinct points linked
                for other_pid in all_pids[1:]:
                    if other_pid in rec.points3D and pid in rec.points3D:
                        pid = self._try_merge(pid, other_pid) or pid

        # pass 3: creations — batched robust triangulation
        if create_cands:
            num_tris += self._create_tracks_batched(image_id, create_cands)
        return num_tris

    def _angular_error(self, image_id, point2D_idx, xyz) -> float:
        rec = self.reconstruction
        img = rec.images[image_id]
        p_cam = img.cam_from_world * np.asarray(xyz)
        n = np.linalg.norm(p_cam)
        if n < 1e-12 or p_cam[2] <= 0:
            return np.pi
        pred = p_cam / n
        obs = np.append(self._norm_xy(image_id, point2D_idx), 1.0)
        obs = obs / np.linalg.norm(obs)
        return float(np.arccos(np.clip(np.dot(pred, obs), -1, 1)))

    def _create_tracks_batched(self, image_id, create_cands) -> int:
        rec = self.reconstruction
        opts = self.options
        V = MAX_TRACK_VIEWS
        # pad the candidate batch to a 4x-step bucket so the jitted kernel
        # compiles once per bucket, not once per candidate count
        B = 256
        while B < len(create_cands):
            B *= 4
        proj = np.zeros((B, V, 3, 4), dtype=np.float32)
        x_norm = np.zeros((B, V, 2), dtype=np.float32)
        centers = np.zeros((B, V, 3), dtype=np.float32)
        view_mask = np.zeros((B, V), dtype=np.float32)
        track_views = []

        mat_cache = {}
        center_cache = {}

        def image_mats(iid):
            if iid not in mat_cache:
                t = rec.images[iid].cam_from_world
                mat_cache[iid] = t.matrix().astype(np.float32)
                center_cache[iid] = t.inverse().translation.astype(np.float32)
            return mat_cache[iid], center_cache[iid]

        for b, (idx, reg_views) in enumerate(create_cands):
            views = [(image_id, idx)] + reg_views
            views = views[:V]
            track_views.append(views)
            for v, (iid, kidx) in enumerate(views):
                m, c = image_mats(iid)
                proj[b, v] = m
                centers[b, v] = c
                x_norm[b, v] = self._norm_xy(iid, kidx)
                view_mask[b, v] = 1.0

        X, inlier, ok = _triangulate_batch(
            jnp.asarray(proj), jnp.asarray(x_norm), jnp.asarray(centers),
            jnp.asarray(view_mask),
            jnp.float32(np.deg2rad(opts.create_max_angle_error)),
            jnp.float32(np.deg2rad(opts.min_angle)),
        )
        X = np.asarray(X)
        inlier = np.asarray(inlier)
        ok = np.asarray(ok)

        num = 0
        for b in range(len(create_cands)):
            if not ok[b]:
                continue
            views = track_views[b]
            els = [
                TrackElement(iid, kidx)
                for v, (iid, kidx) in enumerate(views)
                if inlier[b, v]
            ]
            if len(els) < 2:
                continue
            if opts.ignore_two_view_tracks and len(els) == 2:
                continue
            # keypoints may have been claimed by a merge earlier in this loop
            els = [
                el
                for el in els
                if rec.images[el.image_id].points2D_point3D_ids[el.point2D_idx]
                == np.uint64(INVALID_POINT3D_ID)
            ]
            if len(els) < 2:
                continue
            rec.add_point3D(X[b].astype(np.float64), Track(els))
            num += len(els)
        return num

    # -- merge / complete ----------------------------------------------------
    def _try_merge(self, pid1, pid2):
        """Merge two points if the merged point reprojects well everywhere
        (upstream Merge). Returns new id or None."""
        rec = self.reconstruction
        if pid1 == pid2 or pid1 not in rec.points3D or pid2 not in rec.points3D:
            return None
        p1 = rec.points3D[pid1]
        p2 = rec.points3D[pid2]
        n1, n2 = p1.track.length(), p2.track.length()
        merged = (n1 * p1.xyz + n2 * p2.xyz) / (n1 + n2)
        thr = self.options.merge_max_reproj_error
        for pt in (p1, p2):
            for el in pt.track.elements:
                img = rec.images[el.image_id]
                cam = rec.cameras[img.camera_id]
                p_cam = img.cam_from_world * merged
                if p_cam[2] <= 0:
                    return None
                proj = cam.img_from_cam(p_cam[None, :2] / p_cam[2])[0]
                err = np.linalg.norm(proj - img.points2D_xy[el.point2D_idx])
                if err > thr:
                    return None
        # perform merge
        new_id = rec.merge_points3D(pid1, pid2)
        return new_id

    def merge_tracks(self, point3D_ids=None) -> int:
        """Merge pass over given (or all) points via shared correspondences
        (upstream MergeAllTracks). Returns #merged observations."""
        rec = self.reconstruction
        ids = list(point3D_ids) if point3D_ids is not None else list(rec.points3D)
        num = 0
        for pid in ids:
            pt = rec.points3D.get(pid)
            if pt is None:
                continue
            if self._merged_at_len.get(pid) == pt.track.length():
                continue
            self._merged_at_len[pid] = pt.track.length()
            # find linked points through correspondences of track keypoints
            linked = set()
            for el in pt.track.elements:
                cimgs, cidxs = self.graph.find_correspondences_arrays(
                    el.image_id, el.point2D_idx
                )
                for cimg, cidx in zip(cimgs, cidxs):
                    other = rec.images.get(int(cimg))
                    if other is None or not other.registered:
                        continue
                    opid = int(other.points2D_point3D_ids[int(cidx)])
                    if opid != INVALID_POINT3D_ID and opid != pid:
                        linked.add(opid)
            for opid in linked:
                if pid not in rec.points3D:
                    break
                merged = self._try_merge(pid, opid)
                if merged is not None:
                    num += rec.points3D[merged].track.length()
                    pid = merged
        return num

    def complete_tracks(self, point3D_ids=None) -> int:
        """Transitively extend tracks to unlinked keypoints
        (upstream CompleteAllTracks). Returns #completed observations."""
        rec = self.reconstruction
        opts = self.options
        ids = list(point3D_ids) if point3D_ids is not None else list(rec.points3D)
        num = 0
        for pid in ids:
            pt = rec.points3D.get(pid)
            if pt is None:
                continue
            if self._completed_at_len.get(pid) == pt.track.length():
                continue
            queue = [(el.image_id, el.point2D_idx, 0) for el in pt.track.elements]
            seen = {(el.image_id, el.point2D_idx) for el in pt.track.elements}
            while queue:
                iid, kidx, depth = queue.pop()
                if depth >= opts.complete_max_transitivity:
                    continue
                cimgs, cidxs = self.graph.find_correspondences_arrays(iid, kidx)
                for cimg, cidx in zip(cimgs, cidxs):
                    cimg, cidx = int(cimg), int(cidx)
                    if (cimg, cidx) in seen:
                        continue
                    seen.add((cimg, cidx))
                    other = rec.images.get(cimg)
                    if other is None or not other.registered:
                        continue
                    if other.points2D_point3D_ids[cidx] != np.uint64(
                        INVALID_POINT3D_ID
                    ):
                        continue
                    cam = rec.cameras[other.camera_id]
                    p_cam = other.cam_from_world * pt.xyz
                    if p_cam[2] <= 0:
                        continue
                    proj = cam.img_from_cam(p_cam[None, :2] / p_cam[2])[0]
                    err = np.linalg.norm(proj - other.points2D_xy[cidx])
                    if err <= opts.complete_max_reproj_error:
                        rec.add_observation(pid, TrackElement(cimg, cidx))
                        queue.append((cimg, cidx, depth + 1))
                        num += 1
            if pid in rec.points3D:
                self._completed_at_len[pid] = rec.points3D[pid].track.length()
        return num

    def complete_image(self, image_id: int) -> int:
        """Complete tracks seen by one image (upstream CompleteImage)."""
        rec = self.reconstruction
        img = rec.images[image_id]
        pids = {
            int(pid)
            for pid in img.points2D_point3D_ids
            if pid != np.uint64(INVALID_POINT3D_ID)
        }
        return self.complete_tracks(pids)

    # reference binding names (incremental_triangulator.h:81-90)
    def complete_all_tracks(self, point3D_ids=None) -> int:
        return self.complete_tracks(point3D_ids)

    def merge_all_tracks(self, point3D_ids=None) -> int:
        return self.merge_tracks(point3D_ids)

    def retriangulate(self) -> int:
        """Re-triangulate under-reconstructed images (upstream Retriangulate,
        options re_*). Returns #new observations."""
        rec = self.reconstruction
        num = 0
        for iid in rec.reg_image_ids:
            img = rec.images[iid]
            if img.num_points2D == 0:
                continue
            ratio = img.num_points3D / img.num_points2D
            if ratio >= self.options.re_min_ratio:
                continue
            if self._re_num_trials[iid] >= self.options.re_max_trials:
                continue
            self._re_num_trials[iid] += 1
            num += self.triangulate_image(iid)
        return num
