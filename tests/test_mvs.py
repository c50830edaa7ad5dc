"""MVS integration: PatchMatch depth accuracy on ground-truth planes,
fusion, and meshing (+ depth-map I/O round trip)."""

import numpy as np
import pytest

from pycolmap_tpu.geometry import Rigid3d
from pycolmap_tpu.mvs.depth_map_io import (
    depth_map_path,
    read_mat,
    write_mat,
)
from pycolmap_tpu.mvs.meshing import (
    PoissonMeshingOptions,
    poisson_meshing,
    sparse_delaunay_meshing,
)
from pycolmap_tpu.mvs.patch_match import PatchMatchOptions
from pycolmap_tpu.pipeline.mvs import patch_match_stereo, stereo_fusion
from pycolmap_tpu.scene import Camera, Image as SImage, Reconstruction, Track, TrackElement

from test_full_pipeline import render_scene


def test_mat_io_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    a = rng.normal(size=(20, 30)).astype(np.float32)
    write_mat(tmp_path / "m.bin", a)
    assert np.array_equal(read_mat(tmp_path / "m.bin"), a)
    b = rng.normal(size=(20, 30, 3)).astype(np.float32)
    write_mat(tmp_path / "m3.bin", b)
    assert np.array_equal(read_mat(tmp_path / "m3.bin"), b)


def build_workspace(tmp_path, num_images=4, W=192, H=144):
    ws = tmp_path / "ws"
    (ws / "sparse").mkdir(parents=True)
    poses, cam = render_scene(ws / "images", num_images=num_images, W=W, H=H)
    rec = Reconstruction()
    cam.camera_id = 0
    rec.add_camera(cam)
    rng = np.random.default_rng(0)
    pts = []
    for z0, xlo, xhi in ((6.0, -3, 0.15), (7.5, 0.15, 3)):
        for _ in range(50):
            pts.append([rng.uniform(xlo, xhi), rng.uniform(-2, 2), z0])
    pts = np.array(pts)
    for i, pose in enumerate(poses):
        img = SImage(name=f"view{i:02d}.png", camera_id=0, id=i + 1)
        img.cam_from_world = pose
        p_cam = pose * pts
        uv = p_cam[:, :2] / p_cam[:, 2:]
        img.set_keypoints(cam.img_from_cam(uv))
        img.registered = True
        rec.add_image(img)
    for j in range(len(pts)):
        rec.add_point3D(
            pts[j], Track([TrackElement(i + 1, j) for i in range(len(poses))])
        )
    rec.write_binary(ws / "sparse")
    return ws, poses, cam


@pytest.mark.slow
def test_patch_match_fusion_meshing(tmp_path):
    ws, poses, cam = build_workspace(tmp_path)
    opts = PatchMatchOptions()
    opts.num_iterations = 4
    opts.window_radius = 3
    opts.window_step = 1
    patch_match_stereo(ws, options=opts)

    # depth accuracy vs the known plane geometry (center view)
    name = "view01.png"
    d = read_mat(depth_map_path(ws, name, "geometric"))
    pose = [
        im.cam_from_world
        for im in Reconstruction(ws / "sparse").images.values()
        if im.name == name
    ][0]
    inv = pose.inverse()
    R_cw = inv.rotation.matrix()
    c = inv.translation
    H, W = d.shape
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    K = cam.calibration_matrix()
    K = K.copy()
    K[0] *= W / cam.width
    K[1] *= H / cam.height
    dirs = (
        np.stack(
            [(xx + 0.5 - K[0, 2]) / K[0, 0], (yy + 0.5 - K[1, 2]) / K[1, 1],
             np.ones_like(xx)], -1,
        )
        @ R_cw.T
    )
    gt = np.full((H, W), np.nan)
    for z0, is_left in ((6.0, True), (7.5, False)):
        t = (z0 - c[2]) / dirs[..., 2]
        px = c[0] + t * dirs[..., 0]
        sel = ((px < 0.15) if is_left else (px >= 0.15)) & (t > 0)
        gt[sel] = t[sel]
    valid = (d > 0) & np.isfinite(gt)
    assert valid.mean() > 0.2  # geometric filter keeps a good fraction
    rel_err = np.abs(d[valid] - gt[valid]) / gt[valid]
    assert np.median(rel_err) < 0.01

    # fusion
    xyz, rgb = stereo_fusion(ws / "fused.ply", ws)
    assert len(xyz) > 1000
    z_err = np.minimum(np.abs(xyz[:, 2] - 6.0), np.abs(xyz[:, 2] - 7.5))
    assert np.median(z_err) < 0.02

    # meshing
    mo = PoissonMeshingOptions()
    mo.depth = 6
    assert poisson_meshing(ws / "fused.ply", ws / "mesh.ply", mo)
    assert sparse_delaunay_meshing(ws / "sparse", ws / "sparse_mesh.ply")
    # dense Delaunay from the workspace: consumes fused.ply.vis (r5)
    from pycolmap_tpu.pipeline import dense_delaunay_meshing

    assert (ws / "fused.ply.vis").exists()
    assert dense_delaunay_meshing(ws, ws / "dense_mesh.ply")


def test_poisson_sphere_quality(tmp_path):
    """Quality gate for the Neumann (DCT) Poisson solve: oriented points on
    a sphere must reconstruct a surface hugging the sphere, with no
    periodic-wraparound sheets near the box boundary."""
    from pycolmap_tpu.mvs.fusion import _write_ply
    from pycolmap_tpu.mvs.meshing import (
        PoissonMeshingOptions,
        poisson_meshing,
    )

    def read_mesh_vertices(path):
        with open(path, "rb") as f:
            nv = 0
            while True:
                line = f.readline().strip().decode("ascii")
                if line.startswith("element vertex"):
                    nv = int(line.split()[2])
                elif line == "end_header":
                    break
            return np.frombuffer(
                f.read(12 * nv), dtype="<f4"
            ).reshape(nv, 3)

    rng = np.random.default_rng(0)
    n = 4000
    R = 2.0
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    xyz = R * v
    normals = v  # outward
    rgb = np.full((n, 3), 128, np.uint8)
    _write_ply(tmp_path / "fused.ply", xyz, rgb, normals)
    mo = PoissonMeshingOptions()
    mo.depth = 6
    assert poisson_meshing(tmp_path / "fused.ply", tmp_path / "mesh.ply", mo)
    verts = read_mesh_vertices(tmp_path / "mesh.ply")
    r = np.linalg.norm(verts, axis=1)
    assert np.median(np.abs(r - R)) < 0.1 * R
    assert (np.abs(r - R) < 0.25 * R).mean() > 0.9


def test_fused_vis_roundtrip(tmp_path):
    """fused.ply.vis writer/reader + ragged subset (mvs/fusion.py r5)."""
    from pycolmap_tpu.mvs.fusion import (
        _select_vis,
        read_fused_vis,
        write_fused_vis,
    )

    counts = np.array([2, 1, 3, 1], np.uint32)
    flat = np.array([5, 7, 2, 9, 1, 4, 3], np.uint32)
    p = tmp_path / "fused.ply.vis"
    write_fused_vis(p, counts, flat)
    c2, f2 = read_fused_vis(p)
    assert c2.tolist() == counts.tolist()
    assert f2.tolist() == flat.tolist()
    # subset points 2 and 0 (in that order)
    c3, f3 = _select_vis(counts, flat, np.array([2, 0]))
    assert c3.tolist() == [3, 2]
    assert f3.tolist() == [9, 1, 4, 5, 7]


def test_consistency_graph_roundtrip(tmp_path):
    from pycolmap_tpu.mvs.consistency_graph import (
        read_consistency_graph,
        write_consistency_graph,
    )

    rng = np.random.default_rng(1)
    cons = rng.uniform(size=(3, 6, 8)) > 0.7
    write_consistency_graph(tmp_path / "g.bin", cons)
    w, h, entries = read_consistency_graph(tmp_path / "g.bin")
    assert (w, h) == (8, 6)
    rebuilt = np.zeros_like(cons)
    for x, y, ids in entries:
        rebuilt[ids, y, x] = True
    assert np.array_equal(rebuilt, cons)


def test_patch_match_kernel_geom_pass_compiles():
    """Geometric pass: correct shapes, and a perfect photometric depth map
    survives the forward-backward term (cost stays low where consistent)."""
    import jax
    import jax.numpy as jnp

    from pycolmap_tpu.mvs.patch_match import patch_match_kernel

    H, W, K = 48, 64, 2
    rng = np.random.default_rng(0)
    ref = rng.uniform(0, 1, (H, W)).astype(np.float32)
    srcs = np.stack([ref, ref])
    Kmat = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]], np.float32)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    pix = np.stack([xx + 0.5, yy + 0.5, np.ones_like(xx)])
    rays = np.einsum("ij,jhw->ihw", np.linalg.inv(Kmat), pix).astype(np.float32)
    R_rel = np.stack([np.eye(3), np.eye(3)]).astype(np.float32)
    t_rel = np.zeros((K, 3), np.float32)
    depth0 = np.full((H, W), 5.0, np.float32)
    normal0 = (-rays / np.linalg.norm(rays, axis=0)).astype(np.float32)
    src_depths = np.stack([depth0, depth0])
    depth, normal, cost = patch_match_kernel(
        jax.random.PRNGKey(0),
        jnp.asarray(ref), jnp.asarray(srcs), jnp.asarray(rays),
        jnp.asarray(np.stack([Kmat, Kmat])), jnp.asarray(R_rel),
        jnp.asarray(t_rel),
        jnp.asarray(depth0), jnp.asarray(normal0),
        jnp.float32(1.0), jnp.float32(10.0),
        jnp.float32(0.2), jnp.float32(0.6),
        2, 2, 1,
        geom_consistency=True,
        Kr=jnp.asarray(Kmat),
        Ks_inv=jnp.asarray(np.stack([np.linalg.inv(Kmat)] * 2)),
        src_depths=jnp.asarray(src_depths),
        geom_w=jnp.float32(0.3), geom_max_cost=jnp.float32(3.0),
    )
    assert depth.shape == (H, W) and normal.shape == (3, H, W)
    inner = np.asarray(cost)[8:-8, 8:-8]
    assert np.median(inner) < 0.5


def test_delaunay_visibility_carving_sphere():
    """Quality gate for the r5 visibility-carved Delaunay mesher: points on
    a sphere observed by outside-looking-in cameras must mesh to a surface
    near the sphere (the old alpha-shape kept interior walls; carving must
    not), with ray-crossed free space carved away."""
    from pycolmap_tpu.mvs.meshing import _delaunay_visibility_mesh

    rng = np.random.default_rng(0)
    n = 800
    R = 2.0
    # points on the sphere
    v = rng.normal(size=(n, 3))
    xyz = R * v / np.linalg.norm(v, axis=1, keepdims=True)
    # cameras on a larger shell
    m = 20
    c = rng.normal(size=(m, 3))
    centers = 6.0 * c / np.linalg.norm(c, axis=1, keepdims=True)
    # each point observed by its 3 nearest cameras (front hemisphere-ish)
    d = np.linalg.norm(xyz[:, None] - centers[None], axis=2)
    obs = [
        (i, j) for i in range(n) for j in np.argsort(d[i])[:3]
    ]
    faces = _delaunay_visibility_mesh(xyz, centers, obs)
    assert len(faces) > 200
    cen = xyz[faces].mean(axis=1)
    r = np.linalg.norm(cen, axis=1)
    # surface faces hug the sphere
    assert np.median(np.abs(r - R)) < 0.15 * R
    assert (np.abs(r - R) < 0.3 * R).mean() > 0.85


def test_delaunay_graphcut_smooths_spurious_votes():
    """The r5 graph-cut labeler (Labatut-Pons energy) must absorb an
    isolated spurious free-space vote inside solid matter — the threshold
    labeler flips that cell (a one-cell hole); the min-cut pays the small
    terminal capacity instead of cutting all four face n-links."""
    from scipy.spatial import Delaunay

    from pycolmap_tpu.mvs.meshing import (
        _graphcut_labels,
        _threshold_labels,
    )

    rng = np.random.default_rng(3)
    xyz = rng.normal(size=(300, 3))
    tri = Delaunay(xyz)
    tets = tri.simplices
    nb = tri.neighbors
    ntet = len(tets)
    # solid everywhere: strong in votes
    in_votes = np.full(ntet, 10.0)
    out_votes = np.zeros(ntet)
    # one interior cell gets a small spurious free-space vote
    interior = np.nonzero((nb >= 0).all(axis=1))[0]
    spur = interior[0]
    out_votes[spur] = 11.0
    in_votes[spur] = 0.0

    thr = _threshold_labels(tets, nb, out_votes, in_votes)
    assert thr[spur]  # threshold labeling keeps the hole
    gc = _graphcut_labels(xyz, tets, nb, out_votes, in_votes, 5.0)
    assert gc is not None
    assert not gc[spur]  # graph cut smooths it away
    # and the genuinely-voted solid stays solid
    assert gc.sum() < 0.1 * ntet
