"""Full pipeline integration: rendered images -> extract_features ->
match_exhaustive -> incremental_mapping (the reference example.py scenario,
SURVEY.md §1 canonical flow)."""

import numpy as np
import pytest
from PIL import Image as PILImage

from pycolmap_tpu.geometry import Rigid3d, Rotation3d
from pycolmap_tpu.pipeline import (
    IncrementalPipelineOptions,
    extract_features,
    incremental_mapping,
    match_exhaustive,
)
from pycolmap_tpu.features.sift import SiftExtractionOptions
from pycolmap_tpu.scene import Camera


def _noise_texture(rng, size=1024):
    """Multi-octave smooth noise — gradient-rich, locally distinctive."""
    tex = np.zeros((size, size), dtype=np.float32)
    for octave in (8, 16, 32, 64, 128):
        coarse = rng.normal(0, 1, (octave, octave)).astype(np.float32)
        img = PILImage.fromarray(coarse, mode="F").resize(
            (size, size), PILImage.BILINEAR
        )
        tex += np.asarray(img) / np.sqrt(octave)
    tex = (tex - tex.min()) / (tex.max() - tex.min())
    return tex


def render_scene(out_dir, num_images=6, W=512, H=384, seed=0):
    """Two textured fronto-facing planes rendered from a camera arc.

    Ray-casts every pixel onto plane z=6 (left world half) or z=7.5 (right),
    sampling a smooth noise texture — distinctive structure at all scales,
    with two depths so two-view geometry is non-degenerate.
    """
    rng = np.random.default_rng(seed)
    f = 450.0
    cam = Camera.create(0, "SIMPLE_PINHOLE", f, W, H)
    target = np.array([0.0, 0.0, 6.5])
    tex1 = _noise_texture(rng)
    tex2 = _noise_texture(rng)
    z_planes = (6.0, 7.5)

    poses = []
    for i in range(num_images):
        theta = -0.35 + i * (0.7 / max(num_images - 1, 1))
        center = target + 6.5 * np.array(
            [np.sin(theta), 0.10 * np.sin(2 * theta), -np.cos(theta)]
        )
        fwd = target - center
        fwd /= np.linalg.norm(fwd)
        up = np.array([0.0, -1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        R_wc = np.stack([right, up2, fwd], axis=0)
        poses.append(Rigid3d(Rotation3d(R_wc), -R_wc @ center))

    def sample_tex(tex, u, v):
        """u, v in world units -> bilinear texture sample (wrap)."""
        size = tex.shape[0]
        tu = (u * 0.18 + 0.5) * size
        tv = (v * 0.18 + 0.5) * size
        x0 = np.floor(tu).astype(int)
        y0 = np.floor(tv).astype(int)
        fx = (tu - x0).astype(np.float32)
        fy = (tv - y0).astype(np.float32)
        x0 %= size
        y0 %= size
        x1 = (x0 + 1) % size
        y1 = (y0 + 1) % size
        return (
            tex[y0, x0] * (1 - fy) * (1 - fx)
            + tex[y0, x1] * (1 - fy) * fx
            + tex[y1, x0] * fy * (1 - fx)
            + tex[y1, x1] * fy * fx
        )

    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    out_dir.mkdir(parents=True, exist_ok=True)
    for i, pose in enumerate(poses):
        inv = pose.inverse()
        R_cw = inv.rotation.matrix()  # cam->world
        c = inv.translation
        # pixel rays in world
        d_cam = np.stack(
            [(xx + 0.5 - W / 2) / f, (yy + 0.5 - H / 2) / f, np.ones_like(xx)],
            axis=-1,
        )
        d_world = d_cam @ R_cw.T  # [H, W, 3]
        img = np.full((H, W), 0.5, dtype=np.float32)
        depth_hit = np.full((H, W), np.inf, dtype=np.float32)
        for plane_idx, z0 in enumerate(z_planes):
            dz = d_world[..., 2]
            with np.errstate(divide="ignore", invalid="ignore"):
                t = (z0 - c[2]) / dz
            valid = (t > 0.1) & np.isfinite(t)
            px = c[0] + t * d_world[..., 0]
            py = c[1] + t * d_world[..., 1]
            # plane 0 owns the left world half, plane 1 the right
            own = (px < 0.15) if plane_idx == 0 else (px >= 0.15)
            sel = valid & own & (t < depth_hit)
            tex = tex1 if plane_idx == 0 else tex2
            vals = sample_tex(tex, px[sel], py[sel])
            img[sel] = vals
            depth_hit[sel] = t[sel]
        PILImage.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
            out_dir / f"view{i:02d}.png"
        )
    return poses, cam


@pytest.mark.slow
def test_c2_accuracy_gate(tmp_path):
    """C2-style accuracy gate (VERDICT r2 item 10, ref alignment.h:115-143):
    a larger rendered GT scene through the FULL pipeline (SIFT -> sequential
    matching -> mapping), asserting absolute pose error against ground truth
    via compare_reconstructions — so accuracy regressions fail CI, not just
    throughput.

    Runs in a SUBPROCESS: XLA:CPU misbehaves once a worker process has
    accumulated many large compiled programs (green standalone, wrong
    results mid-suite — same class as the mesh-solver isolation in
    test_ba_kernels.py)."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["PYCOLMAP_TPU_C2_GATE_WORKER"] = str(tmp_path)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = os.pathsep.join(
        [repo, os.path.join(repo, "tests")]
        + [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p]
    )
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=env, capture_output=True, text=True, timeout=2400,
    )
    assert r.returncode == 0, (r.stdout or "")[-2000:] + (r.stderr or "")[-2000:]


def _c2_gate_main(tmp_path):
    from pycolmap_tpu.estimators import compare_reconstructions
    from pycolmap_tpu.pipeline.match_features import (
        SequentialMatchingOptions,
        match_sequential,
    )
    from pycolmap_tpu.scene import Reconstruction

    image_dir = tmp_path / "images"
    n = 16
    poses, cam = render_scene(image_dir, num_images=n, W=416, H=312)
    db_path = tmp_path / "database.db"

    sift_opts = SiftExtractionOptions()
    sift_opts.max_num_features = 1500
    extract_features(db_path, image_dir, sift_options=sift_opts)
    seq = SequentialMatchingOptions()
    seq.overlap = 5
    match_sequential(db_path, matching_options=seq)

    options = IncrementalPipelineOptions()
    options.min_model_size = 6
    options.extract_colors = False
    options.min_num_matches = 15
    options.mapper.init_min_num_inliers = 30
    options.mapper.abs_pose_min_num_inliers = 15
    options.mapper.init_min_tri_angle = 4.0
    recs = incremental_mapping(db_path, image_dir, tmp_path / "sparse", options)
    assert recs
    rec = max(recs.values(), key=lambda r: r.num_reg_images)
    assert rec.num_reg_images >= n - 2
    assert rec.compute_mean_reprojection_error() < 1.5

    gt = Reconstruction()
    gt.add_camera(cam)
    from pycolmap_tpu.scene import Image as SceneImage

    for i, pose in enumerate(poses):
        img = SceneImage(
            id=i + 1, name=f"view{i:02d}.png", camera_id=cam.camera_id
        )
        img.cam_from_world = pose
        img.registered = True
        gt.add_image(img)
    result = compare_reconstructions(rec, gt, alignment_error="proj_center")
    assert result is not None
    rots = [e.rotation_error_deg for e in result["errors"]]
    ctrs = [e.proj_center_error for e in result["errors"]]
    assert len(rots) >= n - 2
    # scene scale ~6.5 world units camera distance; thresholds are ~0.5%
    assert float(np.median(rots)) < 0.5
    assert float(np.median(ctrs)) < 0.05


@pytest.mark.slow
def test_full_pipeline_from_images(tmp_path):
    image_dir = tmp_path / "images"
    poses, cam = render_scene(image_dir, num_images=6)
    db_path = tmp_path / "database.db"

    sift_opts = SiftExtractionOptions()
    sift_opts.max_num_features = 2000
    extract_features(db_path, image_dir, sift_options=sift_opts)

    from pycolmap_tpu.scene import Database

    db = Database(db_path)
    n_img = db.num_images
    n_kp = db.num_keypoints
    db.close()
    assert n_img == 6
    assert n_kp > 6 * 100

    match_exhaustive(db_path)
    db = Database(db_path)
    n_verified = db.num_verified_image_pairs
    db.close()
    assert n_verified >= 8  # most of the 15 pairs verify

    options = IncrementalPipelineOptions()
    options.min_model_size = 4
    options.extract_colors = True
    # small synthetic scene: relax the large-scene defaults
    options.min_num_matches = 15
    options.mapper.init_min_num_inliers = 30
    options.mapper.abs_pose_min_num_inliers = 15
    options.mapper.init_min_tri_angle = 4.0
    recs = incremental_mapping(db_path, image_dir, tmp_path / "sparse", options)
    assert len(recs) >= 1
    rec = recs[0]
    assert rec.num_reg_images >= 5
    assert rec.num_points3D > 50
    assert rec.compute_mean_reprojection_error() < 1.5
    rec.check()


if __name__ == "__main__":
    import os as _os

    _tp = _os.environ.get("PYCOLMAP_TPU_C2_GATE_WORKER")
    if _tp:
        import pathlib

        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")
        _c2_gate_main(pathlib.Path(_tp))
        print("c2 gate ok")
