"""Meshing: Poisson surface reconstruction + Delaunay-based meshing.

API parity: pycolmap/pipeline/meshing.h — ``poisson_meshing`` (:119-133)
and ``sparse/dense_delaunay_meshing`` (:135-165) with reference-compatible
option structs.

Implementation notes (SURVEY.md §2b ranks meshing lowest-priority for TPU):
- Poisson: the screened-Poisson octree of the reference (external
  PoissonRecon) is replaced by a regular-grid spectral solve — splat oriented
  normals into a staggered vector field V, solve lap(chi) = div(V) with FFTs
  (JAX, so the solve itself runs on device), then extract the iso-surface
  with marching tetrahedra (6-tet cube split; simple exact tables).
- Delaunay: scipy.spatial 3-D Delaunay + alpha-shape surface extraction
  (circumradius filter) stands in for the reference's CGAL graph-cut mesher.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from pycolmap_tpu.utils import logging as _logging
from pycolmap_tpu.utils.options import BaseOptions, options_dataclass


@options_dataclass
class PoissonMeshingOptions(BaseOptions):
    """Mirrors reference PoissonMeshingOptions (meshing.h:15-50)."""

    point_weight: float = 1.0
    depth: int = 13
    color: float = 32.0
    trim: float = 10.0
    num_threads: int = -1


@options_dataclass
class DelaunayMeshingOptions(BaseOptions):
    """Mirrors reference DelaunayMeshingOptions (meshing.h:52-117)."""

    max_proj_dist: float = 20.0
    max_depth_dist: float = 2.5
    visibility_sigma: float = 3.0
    distance_sigma_factor: float = 1.0
    quality_regularization: float = 1.0
    max_side_length_factor: float = 25.0
    max_side_length_percentile: float = 95.0
    num_threads: int = -1


def read_fused_ply(path):
    """Read a fused PLY with optional normals. Returns (xyz, normals, rgb)."""
    with open(path, "rb") as f:
        assert f.readline().strip() == b"ply"
        fmt = None
        num = 0
        props = []
        while True:
            line = f.readline().strip().decode("ascii")
            if line.startswith("format"):
                fmt = line.split()[1]
            elif line.startswith("element vertex"):
                num = int(line.split()[2])
            elif line.startswith("element"):
                pass
            elif line.startswith("property"):
                props.append(tuple(line.split()[1:]))
            elif line == "end_header":
                break
        np_types = {"float": "<f4", "double": "<f8", "uchar": "u1", "int": "<i4"}
        names = [n for _, n in props]
        dt = np.dtype([(n, np_types[t]) for t, n in props])
        if fmt == "ascii":
            rows = [f.readline().split() for _ in range(num)]
            rec = np.zeros(num, dtype=dt)
            for k, row in enumerate(rows):
                for (t, n), val in zip(props, row):
                    rec[n][k] = float(val)
        else:
            rec = np.frombuffer(f.read(dt.itemsize * num), dtype=dt)
    xyz = np.stack([rec["x"], rec["y"], rec["z"]], axis=1).astype(np.float64)
    if "nx" in names:
        normals = np.stack([rec["nx"], rec["ny"], rec["nz"]], axis=1).astype(
            np.float64
        )
    else:
        normals = None
    if "red" in names:
        rgb = np.stack([rec["red"], rec["green"], rec["blue"]], axis=1)
    else:
        rgb = None
    return xyz, normals, rgb


def write_mesh_ply(path, vertices, faces):
    with open(path, "wb") as f:
        header = (
            "ply\nformat binary_little_endian 1.0\n"
            f"element vertex {len(vertices)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            f"element face {len(faces)}\n"
            "property list uchar int vertex_index\n"
            "end_header\n"
        )
        f.write(header.encode("ascii"))
        f.write(np.asarray(vertices, dtype="<f4").tobytes())
        fr = np.empty(
            len(faces), dtype=np.dtype([("n", "u1"), ("idx", "<i4", (3,))])
        )
        fr["n"] = 3
        fr["idx"] = np.asarray(faces, dtype=np.int32)
        f.write(fr.tobytes())


# ---------------------------------------------------------------------------
# marching tetrahedra iso-surface extraction
# ---------------------------------------------------------------------------

# 6-tetrahedra decomposition of the unit cube (vertex indices 0..7 where
# vertex v has coords (v&1, (v>>1)&1, (v>>2)&1))
_CUBE_TETS = np.array(
    [
        [0, 5, 1, 6], [0, 1, 3, 6], [0, 3, 2, 6],
        [0, 2, 7, 6], [0, 7, 4, 6], [0, 4, 5, 6],
    ]
)
_CUBE_COORDS = np.array(
    [[(v & 1), (v >> 1) & 1, (v >> 2) & 1] for v in range(8)]
)


def marching_tetrahedra(field: np.ndarray, iso: float, origin, spacing):
    """Extract the iso-surface of a scalar grid. Returns (verts, faces)."""
    F = field - iso
    nx, ny, nz = F.shape
    # cube corner values for all cells [cx, cy, cz, 8]
    corners = np.empty((nx - 1, ny - 1, nz - 1, 8), dtype=F.dtype)
    for v in range(8):
        dx, dy, dz = _CUBE_COORDS[v]
        corners[..., v] = F[dx : nx - 1 + dx, dy : ny - 1 + dy, dz : nz - 1 + dz]

    cell_idx = np.stack(
        np.meshgrid(
            np.arange(nx - 1), np.arange(ny - 1), np.arange(nz - 1),
            indexing="ij",
        ),
        axis=-1,
    ).reshape(-1, 3)
    corners = corners.reshape(-1, 8)
    # only process cells crossing the iso level
    crossing = ~((corners > 0).all(axis=1) | (corners < 0).all(axis=1))
    cell_idx = cell_idx[crossing]
    corners = corners[crossing]
    if len(cell_idx) == 0:
        return np.zeros((0, 3)), np.zeros((0, 3), dtype=np.int32)

    verts = []
    faces = []

    def edge_point(ci, va, vb, fa, fb):
        t = fa / (fa - fb)
        pa = ci + _CUBE_COORDS[va]
        pb = ci + _CUBE_COORDS[vb]
        return pa + t[:, None] * (pb - pa)

    for tet in _CUBE_TETS:
        f4 = corners[:, tet]  # [M, 4]
        inside = f4 < 0
        code = (
            inside[:, 0].astype(int)
            + 2 * inside[:, 1]
            + 4 * inside[:, 2]
            + 8 * inside[:, 3]
        )
        # cases: one vertex inside (tri), two vertices inside (quad = 2 tris)
        for case in range(1, 15):
            sel = code == case
            if not sel.any():
                continue
            ins = [i for i in range(4) if case & (1 << i)]
            outs = [i for i in range(4) if not case & (1 << i)]
            ci = cell_idx[sel]
            fv = f4[sel]
            if len(ins) == 1:
                a = ins[0]
                pts = [
                    edge_point(ci, tet[a], tet[o], fv[:, a], fv[:, o])
                    for o in outs
                ]
                base = sum(len(v) for v in verts)
                n = len(ci)
                verts.extend(pts)
                tri = np.stack(
                    [np.arange(n), np.arange(n) + n, np.arange(n) + 2 * n], axis=1
                )
                faces.append(base + tri)
            elif len(ins) == 3:
                a = outs[0]
                pts = [
                    edge_point(ci, tet[i], tet[a], fv[:, i], fv[:, a])
                    for i in ins
                ]
                base = sum(len(v) for v in verts)
                n = len(ci)
                verts.extend(pts)
                tri = np.stack(
                    [np.arange(n), np.arange(n) + n, np.arange(n) + 2 * n], axis=1
                )
                faces.append(base + tri)
            else:  # two in, two out -> quad
                i0, i1 = ins
                o0, o1 = outs
                p00 = edge_point(ci, tet[i0], tet[o0], fv[:, i0], fv[:, o0])
                p01 = edge_point(ci, tet[i0], tet[o1], fv[:, i0], fv[:, o1])
                p10 = edge_point(ci, tet[i1], tet[o0], fv[:, i1], fv[:, o0])
                p11 = edge_point(ci, tet[i1], tet[o1], fv[:, i1], fv[:, o1])
                base = sum(len(v) for v in verts)
                n = len(ci)
                verts.extend([p00, p01, p10, p11])
                tri1 = np.stack(
                    [np.arange(n), np.arange(n) + n, np.arange(n) + 2 * n], axis=1
                )
                tri2 = np.stack(
                    [np.arange(n) + n, np.arange(n) + 3 * n, np.arange(n) + 2 * n],
                    axis=1,
                )
                faces.append(base + tri1)
                faces.append(base + tri2)

    V = np.concatenate(verts)
    Fc = np.concatenate(faces)
    # weld duplicate vertices
    Vq = np.round(V * 1e5).astype(np.int64)
    uniq, inverse = np.unique(Vq, axis=0, return_inverse=True)
    remap = np.zeros(len(uniq), dtype=np.int64)
    first = {}
    out_v = np.zeros((len(uniq), 3))
    out_v[inverse] = V
    Fc = inverse[Fc]
    # drop degenerate faces
    good = (
        (Fc[:, 0] != Fc[:, 1]) & (Fc[:, 1] != Fc[:, 2]) & (Fc[:, 0] != Fc[:, 2])
    )
    Fc = Fc[good]
    out_v = out_v * np.asarray(spacing)[None, :] + np.asarray(origin)[None, :]
    return out_v, Fc.astype(np.int32)


# ---------------------------------------------------------------------------
# Poisson meshing
# ---------------------------------------------------------------------------


def poisson_meshing(
    input_path, output_path, options: PoissonMeshingOptions = None
):
    """Oriented point cloud (fused PLY) -> triangle mesh PLY."""
    if options is None:
        options = PoissonMeshingOptions()
    log = _logging.get_logger()
    xyz, normals, _ = read_fused_ply(input_path)
    if len(xyz) < 100:
        write_mesh_ply(output_path, np.zeros((0, 3)), np.zeros((0, 3), int))
        return False
    if normals is None or not np.any(np.linalg.norm(normals, axis=1) > 1e-6):
        raise ValueError("poisson_meshing requires oriented normals in the PLY")

    n = min(1 << min(options.depth, 8), 256)
    lo = np.percentile(xyz, 2, axis=0)
    hi = np.percentile(xyz, 98, axis=0)
    pad = 0.1 * (hi - lo).max()
    lo -= pad
    hi += pad
    spacing = (hi - lo) / n

    # splat normals into the grid (nearest-cell)
    ijk = np.floor((xyz - lo) / spacing).astype(int)
    inb = np.all((ijk >= 0) & (ijk < n), axis=1)
    ijk = ijk[inb]
    nr = normals[inb]
    nr = nr / np.maximum(np.linalg.norm(nr, axis=1, keepdims=True), 1e-9)
    V = np.zeros((3, n, n, n), dtype=np.float32)
    W = np.zeros((n, n, n), dtype=np.float32)
    np.add.at(W, (ijk[:, 0], ijk[:, 1], ijk[:, 2]), 1.0)
    for c in range(3):
        np.add.at(V[c], (ijk[:, 0], ijk[:, 1], ijk[:, 2]), nr[:, c])

    from scipy.fft import dctn, idctn
    from scipy.ndimage import uniform_filter

    # smooth the vector field a little (3-tap box per axis, twice);
    # 'nearest' edge handling — no periodic wraparound
    for c in range(3):
        for _ in range(2):
            V[c] = uniform_filter(V[c], size=3, mode="nearest")
    # divergence (one-sided differences at the borders)
    div = (
        np.gradient(V[0], spacing[0], axis=0)
        + np.gradient(V[1], spacing[1], axis=1)
        + np.gradient(V[2], spacing[2], axis=2)
    ).astype(np.float32)
    # spectral Poisson solve under Neumann BCs via DCT-II (the zero-flux
    # boundary the indicator function actually has; the earlier periodic
    # FFT wrapped boundary influence across the box). Runs on host: the
    # reference's PoissonRecon is likewise a CPU post-process
    # (ref meshing.h:119-133), and scipy provides the DCT directly.
    k = np.arange(n)
    lam = 2.0 * (np.cos(np.pi * k / n) - 1.0)
    denom = (
        lam[:, None, None] / spacing[0] ** 2
        + lam[None, :, None] / spacing[1] ** 2
        + lam[None, None, :] / spacing[2] ** 2
    )
    denom[0, 0, 0] = 1.0
    chi_hat = dctn(div, type=2, norm="ortho") / denom
    chi_hat[0, 0, 0] = 0.0
    chi = idctn(chi_hat, type=2, norm="ortho").astype(np.float32)

    # iso level = mean chi at the input samples
    iso = float(np.mean(chi[ijk[:, 0], ijk[:, 1], ijk[:, 2]]))
    verts, faces = marching_tetrahedra(chi, iso, lo + 0.5 * spacing, spacing)

    # trim: drop triangles far from any input point (weight grid empty)
    if options.trim > 0 and len(faces):
        occ = W > 0
        from scipy.ndimage import binary_dilation

        occ = binary_dilation(occ, iterations=2)
        centers = verts[faces].mean(axis=1)
        cijk = np.clip(
            np.floor((centers - lo) / spacing).astype(int), 0, n - 1
        )
        keep = occ[cijk[:, 0], cijk[:, 1], cijk[:, 2]]
        faces = faces[keep]

    write_mesh_ply(output_path, verts, faces)
    log.info(
        f"poisson_meshing: {len(verts)} vertices, {len(faces)} faces -> {output_path}"
    )
    return len(faces) > 0


def _delaunay_mesh_points(xyz, side_len_factor=5.0):
    from scipy.spatial import Delaunay

    tri = Delaunay(xyz)
    tets = tri.simplices
    # alpha-ish filter: drop tets with long edges
    edges = np.concatenate(
        [tets[:, [a, b]] for a, b in
         ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))]
    )
    lens = np.linalg.norm(xyz[edges[:, 0]] - xyz[edges[:, 1]], axis=1)
    med = np.median(lens)
    max_edge = side_len_factor * med
    tet_edges = lens.reshape(6, -1).T
    good = (tet_edges < max_edge).all(axis=1)
    tets = tets[good]
    # surface = faces appearing exactly once
    faces = np.concatenate(
        [tets[:, [0, 1, 2]], tets[:, [0, 1, 3]], tets[:, [0, 2, 3]], tets[:, [1, 2, 3]]]
    )
    key = np.sort(faces, axis=1)
    _, idx, counts = np.unique(key, axis=0, return_index=True, return_counts=True)
    surface = faces[idx[counts == 1]]
    return surface


def _face_areas(xyz, tets, face_idx):
    """Areas of the faces opposite vertex k=face_idx of each tet."""
    face_of = ((1, 2, 3), (0, 2, 3), (0, 1, 3), (0, 1, 2))
    v = xyz[tets[:, face_of[face_idx]]]  # [ntet, 3, 3]
    return 0.5 * np.linalg.norm(
        np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]), axis=1
    )


def _threshold_labels(tets, nb, out_votes, in_votes):
    """Vote-majority labeling + outside flood fill from the hull that
    in-voted cells block (the pre-r5 labeler; fallback when the native
    min-cut is unavailable on a large graph). Returns outside[ntet] bool."""
    voted_out = out_votes > in_votes
    voted_in = (in_votes >= out_votes) & (in_votes > 0)
    outside = voted_out.copy()
    blocked = voted_in
    frontier = np.zeros(len(tets), bool)
    hull_tet = (nb == -1).any(axis=1)
    frontier |= hull_tet & ~blocked & ~outside
    outside |= frontier
    while frontier.any():
        reach = np.zeros(len(tets), bool)
        nbs = nb[frontier].reshape(-1)
        nbs = nbs[nbs >= 0]
        reach[nbs] = True
        frontier = reach & ~outside & ~blocked
        outside |= frontier
    return outside


def _graphcut_labels(xyz, tets, nb, out_votes, in_votes, regularization):
    """Labatut-Pons graph-cut labeling (the reference CGAL mesher's energy,
    ref meshing.h:52-117 `quality_regularization`): per-cell terminal
    capacities from the visibility votes, face-area-weighted smoothness
    n-links between adjacent cells, hull cells source-linked through their
    hull-face area (the infinite outside cell), minimized exactly by s-t
    min-cut (native Dinic, pycolmap_tpu/native/graph_ops.cc). Returns
    outside[ntet] bool, or None if no solver is viable at this size."""
    from pycolmap_tpu import native

    ntet = len(tets)
    if native.get_lib() is None and ntet > 30_000:
        return None  # python-Dinic fallback too slow at this size
    eu, ev, areas = [], [], []
    hull_bonus = np.zeros(ntet, np.float64)
    for k in range(4):
        a_k = _face_areas(xyz, tets, k)
        nbk = nb[:, k]
        sel = nbk > np.arange(ntet)  # each adjacent pair once
        eu.append(np.nonzero(sel)[0])
        ev.append(nbk[sel])
        areas.append(a_k[sel])
        hull_bonus += np.where(nbk == -1, a_k, 0.0)
    eu = np.concatenate(eu)
    ev = np.concatenate(ev)
    areas = np.concatenate(areas)
    med_area = max(float(np.median(areas)), 1e-12) if len(areas) else 1.0
    lam = float(regularization)
    ecap = (lam * areas / med_area).astype(np.float32)
    net = (out_votes - in_votes + lam * hull_bonus / med_area).astype(
        np.float32
    )
    return native.min_cut(ntet, eu, ev, ecap, net).astype(bool)


def _delaunay_visibility_mesh(xyz, centers, obs_pairs, samples: int = 24,
                              behind_frac: float = 0.15,
                              regularization: float = 1.0):
    """Visibility-carved Delaunay surface (the reference CGAL mesher's
    energy, ref meshing.h:52-117):

    - every sight ray (camera center -> observed point) votes the
      tetrahedra it crosses OUTSIDE (free space), located by vectorized
      point-location of samples along the segment;
    - short ray extensions BEHIND each point vote their tetrahedra INSIDE
      (matter behind the observed surface);
    - cells are labeled by the Labatut-Pons graph cut (r5:
      `_graphcut_labels`; vote-threshold + flood-fill fallback), and the
      surface is the set of faces between outside and inside cells (plus
      hull faces of inside cells).

    obs_pairs: [(point_idx, center_idx)] observations. Returns faces
    [F, 3] (indices into xyz).
    """
    from scipy.spatial import Delaunay

    tri = Delaunay(xyz)
    tets = tri.simplices
    ntet = len(tets)
    out_votes = np.zeros(ntet, np.float64)
    in_votes = np.zeros(ntet, np.float64)
    obs = np.asarray(obs_pairs, np.int64).reshape(-1, 2)
    chunk = max(1, 2_000_000 // max(samples, 1))
    ts = np.linspace(0.03, 0.97, samples)
    for s in range(0, len(obs), chunk):
        ob = obs[s:s + chunk]
        p = xyz[ob[:, 0]]
        c = centers[ob[:, 1]]
        seg = p - c
        pts = c[:, None, :] + seg[:, None, :] * ts[None, :, None]
        simp = tri.find_simplex(pts.reshape(-1, 3))
        simp = simp[simp >= 0]
        np.add.at(out_votes, simp, 1.0)
        # two samples just behind the point
        for f in (0.4 * behind_frac, behind_frac):
            back = p + seg * f
            sb = tri.find_simplex(back)
            sb = sb[sb >= 0]
            np.add.at(in_votes, sb, 1.0)
    nb = tri.neighbors  # [ntet, 4], -1 = hull
    outside = _graphcut_labels(
        xyz, tets, nb, out_votes, in_votes, regularization
    )
    if outside is None:
        outside = _threshold_labels(tets, nb, out_votes, in_votes)
    inside = ~outside
    # surface: faces between an outside cell and an inside neighbor, plus
    # hull faces of inside cells (the shell seen from free space beyond
    # the hull); face k of a tet is opposite vertex k
    face_of = ((1, 2, 3), (0, 2, 3), (0, 1, 3), (0, 1, 2))
    surf = []
    for k in range(4):
        nbk = nb[:, k]
        sel = outside & (nbk >= 0) & inside[np.maximum(nbk, 0)]
        sel |= inside & (nbk == -1)
        if sel.any():
            surf.append(tets[sel][:, face_of[k]])
    if not surf:
        return np.zeros((0, 3), np.int64)
    return np.concatenate(surf)


def sparse_delaunay_meshing(input_path, output_path,
                            options: DelaunayMeshingOptions = None):
    """Sparse model -> surface mesh (ref: meshing.h:135-149).

    r5: visibility-carved Delaunay (track sight rays label free/solid
    cells; surface = boundary faces) instead of the pure alpha-shape."""
    if options is None:
        options = DelaunayMeshingOptions()
    from pycolmap_tpu.scene import Reconstruction

    rec = Reconstruction(input_path)
    pids = list(rec.points3D.keys())
    xyz = np.array([rec.points3D[p].xyz for p in pids])
    if len(xyz) < 10:
        write_mesh_ply(output_path, np.zeros((0, 3)), np.zeros((0, 3), int))
        return False
    # visibility-carved Delaunay (r5; previously a pure alpha-shape): the
    # reconstruction's tracks supply the sight rays
    centers_by_img = {
        iid: rec.images[iid].projection_center()
        for iid in rec.reg_image_ids
    }
    img_row = {iid: k for k, iid in enumerate(centers_by_img)}
    centers = np.array(list(centers_by_img.values())).reshape(-1, 3)
    obs_pairs = [
        (k, img_row[el.image_id])
        for k, pid in enumerate(pids)
        for el in rec.points3D[pid].track.elements
        if el.image_id in img_row
    ]
    if len(centers) and obs_pairs:
        faces = _delaunay_visibility_mesh(
            xyz, centers, obs_pairs,
            regularization=options.quality_regularization,
        )
        if len(faces) == 0:  # degenerate visibility -> alpha-shape fallback
            faces = _delaunay_mesh_points(xyz)
    else:
        faces = _delaunay_mesh_points(xyz)
    write_mesh_ply(output_path, xyz, faces)
    return len(faces) > 0


def dense_delaunay_meshing(input_path, output_path,
                           options: DelaunayMeshingOptions = None):
    """Dense workspace (or fused PLY) -> surface mesh (ref: meshing.h:151-165).

    Like the reference (which takes the dense workspace directory and reads
    fused.ply + fused.ply.vis), a directory input runs the full
    visibility-carved graph-cut mesher using the fusion's per-point
    visibility lists (mvs/fusion.py write_fused_vis) and the workspace
    camera centers. A bare PLY path (no visibility available) falls back to
    the alpha-shape surface."""
    if options is None:
        options = DelaunayMeshingOptions()
    input_path = Path(input_path)
    vis = None
    centers = None
    if input_path.is_dir():
        ply = input_path / "fused.ply"
        vis_path = Path(str(ply) + ".vis")
        xyz, _, _ = read_fused_ply(ply)
        if vis_path.exists():
            from pycolmap_tpu.mvs.fusion import read_fused_vis
            from pycolmap_tpu.mvs.workspace import MVSModel

            counts, flat = read_fused_vis(vis_path)
            if len(counts) == len(xyz):
                model = MVSModel(input_path)
                cam_row = {}
                cams = []
                for iid, m in model.images.items():
                    cam_row[iid] = len(cams)
                    cams.append(-m.R.T @ m.t)
                centers = np.asarray(cams).reshape(-1, 3)
                vis = (counts, flat, cam_row)
    else:
        xyz, _, _ = read_fused_ply(input_path)
    if len(xyz) < 10:
        write_mesh_ply(output_path, np.zeros((0, 3)), np.zeros((0, 3), int))
        return False
    # subsample for tractable Delaunay
    sel = None
    if len(xyz) > 200_000:
        sel = np.random.default_rng(0).choice(len(xyz), 200_000, replace=False)
        xyz = xyz[sel]
    if vis is not None and len(centers):
        counts, flat, cam_row = vis
        offsets = np.zeros(len(counts) + 1, np.int64)
        np.cumsum(counts, dtype=np.int64, out=offsets[1:])
        pts_idx = sel if sel is not None else np.arange(len(counts))
        obs_pairs = [
            (k, cam_row[int(flat[o])])
            for k, i in enumerate(pts_idx)
            for o in range(offsets[i], offsets[i + 1])
            if int(flat[o]) in cam_row
        ]
        faces = _delaunay_visibility_mesh(
            xyz, centers, obs_pairs,
            regularization=options.quality_regularization,
        )
        if len(faces) == 0:
            faces = _delaunay_mesh_points(xyz)
    else:
        faces = _delaunay_mesh_points(xyz)
    write_mesh_ply(output_path, xyz, faces)
    return len(faces) > 0
