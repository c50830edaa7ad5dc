"""Device-resident bundle-adjustment solver (ROADMAP r3 Performance #1).

`solve_bundle_fast` pays a fixed ~180 ms per solve at C3 scale through the
remote tunnel: host-side bucketize-cache hashing, packed H2D of the point
planes, the dispatch round trip, and a full packed D2H — even when the same
problem is re-solved (bench reps; the mapper's iterative global-refinement
rounds, ref pipeline/sfm.h:194-208 AdjustGlobalBundle loop). This class
keeps BOTH the bucket structure and the parameters device-resident across
re-solves: each `solve()` dispatches the cached packed executable on device
operands, chains the outputs back into the next call's inputs with one tiny
jitted unpack, and fetches only the 3 summary scalars. Parameters are
downloaded once, on `fetch_problem()`.

Reference analog: Ceres keeps its Program/Jacobian structures resident
across Solve() calls within one BundleAdjuster (ref: pipeline/sfm.h:95-103);
COLMAP rebuilds per call because CPU transfers are free — through a PCIe-or
-tunnel-attached accelerator they are not.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from pycolmap_tpu.sfm.bundle_adjustment import BASummary, BundleProblem
from pycolmap_tpu.sfm import ba_kernels as bk


@partial(jax.jit, static_argnames=("npts", "I_pad", "C_pad", "NP"))
def _chain_unpack(packed, intr_prev, npts, I_pad, C_pad, NP):
    """Slice a packed solver result into the next solve's device operands."""
    o = 0
    quat = packed[o:o + 4 * I_pad].reshape(I_pad, 4); o += 4 * I_pad
    trans = packed[o:o + 3 * I_pad].reshape(I_pad, 3); o += 3 * I_pad
    intr_np = packed[o:o + NP * C_pad].reshape(C_pad, NP); o += NP * C_pad
    pts = []
    for P in npts:
        pts.append(packed[o:o + 3 * P].reshape(3, P)); o += 3 * P
    stats = packed[o:o + 3]
    # restore the public intrinsics width (columns >= NP untouched by BA)
    intr = intr_prev.at[:, :NP].set(intr_np)
    return quat, trans, intr, jnp.concatenate(pts, axis=1), stats


@jax.jit
def _perturb(pts_all, eps):
    return pts_all + eps


class ResidentBundleSolver:
    """Re-solvable BA problem with device-resident structure AND parameters.

    Usage::

        solver = ResidentBundleSolver(problem, options, cg_iters=20)
        summary = solver.solve()          # params advance on device
        solver.perturb_points(1e-6)       # optional device-side edit
        summary = solver.solve()          # re-solve from current params
        new_problem = solver.fetch_problem()   # one D2H + write-back

    Single-device path only (mesh distribution goes through solve_bundle).
    """

    def __init__(self, problem: BundleProblem, options, cg_iters: int = 30):
        from pycolmap_tpu.ops.camera_models import CAMERA_MODEL_BY_ID

        if problem.num_obs == 0:
            raise ValueError("empty problem")
        self._problem = problem
        self._options = options
        self._cg_iters = int(cg_iters)
        buckets, pts_host_l, rows_l, sel_l = bk._bucketize_cached(
            problem, None
        )
        if not buckets:
            raise ValueError("no observation buckets")
        self._buckets = buckets
        self._rows_l = rows_l
        self._sel_l = sel_l
        I, C = problem.num_images, problem.num_cameras
        self._I, self._C = I, C
        I_pad = bk._pad_4x(I, 8)
        C_pad = bk._pad_4x(C, 1)
        self._I_pad, self._C_pad = I_pad, C_pad
        cam_quat = np.asarray(problem.cam_quat, np.float32)
        cam_trans = np.asarray(problem.cam_trans, np.float32)
        pose_free = np.asarray(problem.pose_free, np.float32)
        intrinsics = np.asarray(problem.intrinsics, np.float32)
        intr_free = np.asarray(problem.intr_free, np.float32)
        if I_pad > I:
            cam_quat = np.concatenate(
                [cam_quat,
                 np.tile(np.array([[1.0, 0, 0, 0]], np.float32),
                         (I_pad - I, 1))]
            )
            cam_trans = np.concatenate(
                [cam_trans, np.zeros((I_pad - I, 3), np.float32)]
            )
            pose_free = np.concatenate(
                [pose_free, np.zeros((I_pad - I, 6), np.float32)]
            )
        if C_pad > C:
            intrinsics = np.concatenate(
                [intrinsics,
                 np.ones((C_pad - C, intrinsics.shape[1]), np.float32)]
            )
            intr_free = np.concatenate(
                [intr_free,
                 np.zeros((C_pad - C, intr_free.shape[1]), np.float32)]
            )
        img2cam = np.zeros(I_pad, np.int32)
        valid = np.asarray(problem.obs_mask) > 0
        img2cam[np.asarray(problem.obs_image_idx)[valid]] = np.asarray(
            problem.obs_camera_idx
        )[valid]
        self._img2cam = img2cam
        self._pose_free = jax.device_put(pose_free)
        self._intr_free = jax.device_put(intr_free)
        # resident parameters
        self._d_quat = jax.device_put(cam_quat)
        self._d_trans = jax.device_put(cam_trans)
        self._d_intr = jax.device_put(intrinsics)
        self._d_pts_all = jax.device_put(
            np.concatenate(pts_host_l, axis=1)
        )
        self._npts = tuple(b.points.shape[1] for b in buckets)
        self._nts = tuple(b.mask.shape[0] for b in buckets)
        self._NP = CAMERA_MODEL_BY_ID[problem.model_id].num_params
        self._knobs = bk._env_knobs()
        self._last_stats = None

    def perturb_points(self, eps: float) -> None:
        """Add eps to every point coordinate ON DEVICE (no host transfer)."""
        self._d_pts_all = _perturb(self._d_pts_all, jnp.float32(eps))

    def solve(self, max_iterations: int = None) -> BASummary:
        """One LM solve from the current device-resident parameters."""
        options = self._options
        max_iters = int(
            options.max_num_iterations
            if max_iterations is None else max_iterations
        )
        packed = bk._packed_dispatch(
            self._buckets, self._d_pts_all, self._d_quat, self._d_trans,
            self._d_intr, self._pose_free, self._intr_free,
            jnp.float32(options.loss_function_scale), self._img2cam,
            jnp.float32(getattr(options, "eta", 0.1)),
            self._npts, self._nts, self._I_pad, self._C_pad,
            self._problem.model_id, int(options.loss_function_type),
            self._cg_iters, max_iters, self._knobs,
        )
        import sys as _sys

        from pycolmap_tpu.utils import aot_cache

        q, t, intr, pts_all, stats = aot_cache.cached_call(
            _chain_unpack, "ba_chain",
            aot_cache.source_salt(_sys.modules[__name__]),
            dict(npts=self._npts, I_pad=self._I_pad, C_pad=self._C_pad,
                 NP=self._NP),
            packed, self._d_intr,
        )
        self._d_quat, self._d_trans = q, t
        self._d_intr, self._d_pts_all = intr, pts_all
        cost0, cost, it = np.asarray(stats)  # the ONLY blocking fetch
        self._last_stats = (float(cost0), float(cost), int(it))
        return BASummary(
            float(cost0), float(cost), int(it), 2 * self._problem.num_obs
        )

    def fetch_problem(self) -> BundleProblem:
        """Download the current parameters into a BundleProblem (one D2H)."""
        quat, trans, intr, pts_all = jax.device_get(
            (self._d_quat, self._d_trans, self._d_intr, self._d_pts_all)
        )
        problem = self._problem
        points = np.asarray(problem.points).copy()
        offs = np.cumsum((0,) + self._npts)
        for i, (rows, sel) in enumerate(zip(self._rows_l, self._sel_l)):
            vals = pts_all[:, offs[i]:offs[i + 1]].T  # [P, 3]
            points[rows[sel]] = vals[sel]
        return problem._replace(
            cam_quat=quat[:self._I],
            cam_trans=trans[:self._I],
            intrinsics=intr[:self._C],
            points=jnp.asarray(points),
        )
