"""SfM pipeline stages: incremental_mapping, bundle_adjustment, triangulate_points.

API parity: pycolmap/pipeline/sfm.h — ``incremental_mapping`` (:46-93, :347),
``bundle_adjustment`` (:95-103, :358), ``triangulate_points`` (:23-44, :336),
``IncrementalPipelineOptions`` (:117-258). The controller loop follows the
reference call stack (SURVEY.md §3.3): init pair → register/triangulate loop
→ iterative local refinement → growth-ratio-gated global refinement →
filtering → multi-model management, with snapshots, resume and callbacks.
"""

from __future__ import annotations

import copy
from pathlib import Path

import numpy as np

from pycolmap_tpu.scene import Reconstruction
from pycolmap_tpu.sfm.bundle_adjustment import (
    BundleAdjustmentOptions,
    LossFunctionType,
    solve_bundle,
)
from pycolmap_tpu.sfm.database_cache import DatabaseCache
from pycolmap_tpu.sfm.incremental_mapper import (
    ImageSelectionMethod,
    IncrementalMapper,
    IncrementalMapperOptions,
)
from pycolmap_tpu.sfm.incremental_triangulator import IncrementalTriangulatorOptions
from pycolmap_tpu.sfm.problem import apply_bundle_solution, build_bundle_problem
from pycolmap_tpu.utils.options import BaseOptions, options_dataclass
from pycolmap_tpu.utils import logging as _logging


@options_dataclass
class IncrementalPipelineOptions(BaseOptions):
    """Mirrors reference IncrementalPipelineOptions (pipeline/sfm.h:117-258)."""

    min_num_matches: int = 15
    ignore_watermarks: bool = False
    multiple_models: bool = True
    max_num_models: int = 50
    max_model_overlap: int = 20
    min_model_size: int = 10
    init_image_id1: int = -1
    init_image_id2: int = -1
    init_num_trials: int = 200
    extract_colors: bool = True
    num_threads: int = -1
    min_focal_length_ratio: float = 0.1
    max_focal_length_ratio: float = 10.0
    max_extra_param: float = 1.0
    ba_refine_focal_length: bool = True
    ba_refine_principal_point: bool = False
    ba_refine_extra_params: bool = True
    ba_min_num_residuals_for_multi_threading: int = 50000
    ba_local_num_images: int = 6
    ba_local_function_tolerance: float = 0.0
    ba_local_max_num_iterations: int = 25
    ba_global_images_ratio: float = 1.1
    ba_global_points_ratio: float = 1.1
    ba_global_images_freq: int = 500
    ba_global_points_freq: int = 250000
    ba_global_function_tolerance: float = 0.0
    ba_global_max_num_iterations: int = 50
    ba_local_max_refinements: int = 2
    ba_local_max_refinement_change: float = 0.001
    ba_global_max_refinements: int = 5
    ba_global_max_refinement_change: float = 0.0005
    snapshot_path: str = ""
    snapshot_images_freq: int = 0
    image_names: list = None
    fix_existing_images: bool = False
    # pose-graph relaxation (rotation averaging + position solve +
    # retriangulation, sfm/pose_graph.py) after the final refinement when
    # the verified pair graph disagrees with the reconstruction — the
    # drift-fold escape hatch the reference's repeated-retriangulation
    # rounds (pipeline/sfm.h:194-208) cannot provide. No-op on healthy
    # scenes (residual check).
    pose_graph_relaxation: bool = True
    pose_graph_min_residual_deg: float = 1.0
    # device mesh used by every BA solve in the pipeline: "auto" (default
    # mesh / all local devices on multi-chip hardware), "none", an int
    # device count, or a jax.sharding.Mesh (see parallel/device_ctx.py).
    # TPU-native analog of the reference num_threads/gpu_index options
    # (ref: pipeline/sfm.h:294, match_features.h:76-81)
    devices: object = "auto"
    mapper: IncrementalMapperOptions = None
    triangulation: IncrementalTriangulatorOptions = None

    def __post_init__(self):
        if self.mapper is None:
            self.mapper = IncrementalMapperOptions()
        if self.triangulation is None:
            self.triangulation = IncrementalTriangulatorOptions()
        if self.image_names is None:
            self.image_names = []

    def get_mapper(self) -> IncrementalMapperOptions:
        m = copy.deepcopy(self.mapper)
        m.local_ba_num_images = self.ba_local_num_images
        m.max_model_overlap = self.max_model_overlap
        m.fix_existing_images = self.fix_existing_images
        m.min_focal_length_ratio = self.min_focal_length_ratio
        m.max_focal_length_ratio = self.max_focal_length_ratio
        m.max_extra_param = self.max_extra_param
        return m

    def get_local_ba(self) -> BundleAdjustmentOptions:
        ba = BundleAdjustmentOptions()
        ba.loss_function_type = LossFunctionType.SOFT_L1
        ba.loss_function_scale = 1.0
        ba.refine_focal_length = self.ba_refine_focal_length
        ba.refine_principal_point = self.ba_refine_principal_point
        ba.refine_extra_params = self.ba_refine_extra_params
        ba.max_num_iterations = self.ba_local_max_num_iterations
        ba.print_summary = False
        ba.devices = self.devices
        return ba

    def get_global_ba(self) -> BundleAdjustmentOptions:
        ba = BundleAdjustmentOptions()
        ba.loss_function_type = LossFunctionType.TRIVIAL
        ba.refine_focal_length = self.ba_refine_focal_length
        ba.refine_principal_point = self.ba_refine_principal_point
        ba.refine_extra_params = self.ba_refine_extra_params
        ba.max_num_iterations = self.ba_global_max_num_iterations
        ba.print_summary = False
        ba.devices = self.devices
        return ba


class ReconstructionManager:
    """Holds the set of models (ref: pipeline/sfm.h:59-63 usage)."""

    def __init__(self):
        self.reconstructions: list[Reconstruction] = []

    def add(self) -> int:
        self.reconstructions.append(Reconstruction())
        return len(self.reconstructions) - 1

    def get(self, idx) -> Reconstruction:
        return self.reconstructions[idx]

    def delete(self, idx):
        del self.reconstructions[idx]

    def __len__(self):
        return len(self.reconstructions)

    def write(self, path):
        path = Path(path)
        for i, rec in enumerate(self.reconstructions):
            out = path / str(i)
            out.mkdir(parents=True, exist_ok=True)
            rec.write_binary(out)


def _iterative_local_refinement(mapper, options, image_id):
    """Repeated local BA until relative change small (upstream
    IterativeLocalRefinement; ref: sfm.h ba_local_max_refinements)."""
    ba = options.get_local_ba()
    for _ in range(options.ba_local_max_refinements):
        summary = mapper.adjust_local_bundle(
            options.get_mapper(), ba, options.triangulation, image_id
        )
        if summary is None:
            break
        mapper.triangulator.complete_image(image_id)
        mapper.triangulator.clear_cache()
        if summary.initial_cost <= 0:
            break
        change = abs(summary.final_cost - summary.initial_cost) / max(
            summary.initial_cost, 1e-12
        )
        if change < options.ba_local_max_refinement_change:
            break


def _iterative_global_refinement(mapper, options):
    """Retriangulate + global BA rounds (upstream IterativeGlobalRefinement)."""
    import time as _time

    log = _logging.get_logger()
    t0 = _time.perf_counter()
    mapper.triangulator.clear_cache()
    mapper.triangulator.complete_tracks()
    tc = _time.perf_counter()
    mapper.triangulator.merge_tracks()
    tm = _time.perf_counter()
    mapper.triangulator.retriangulate()
    if _PROFILE:
        log.info(
            f"profile global pre-tri: {_time.perf_counter() - t0:.2f}s "
            f"(complete {tc - t0:.2f}s merge {tm - tc:.2f}s "
            f"retri {_time.perf_counter() - tm:.2f}s)"
        )
    for _ in range(options.ba_global_max_refinements):
        t1 = _time.perf_counter()
        summary = mapper.adjust_global_bundle(
            options.get_mapper(), options.get_global_ba()
        )
        if summary is None:
            break
        t2 = _time.perf_counter()
        mapper.triangulator.clear_cache()
        mapper.triangulator.complete_tracks()
        t2c = _time.perf_counter()
        mapper.triangulator.merge_tracks()
        t2m = _time.perf_counter()
        mapper.filter_points(options.get_mapper())
        if _PROFILE:
            log.info(
                f"profile global round: ba {t2 - t1:.2f}s "
                f"complete {t2c - t2:.2f}s merge {t2m - t2c:.2f}s "
                f"filter {_time.perf_counter() - t2m:.2f}s "
                f"(it={summary.num_iterations})"
            )
        if summary.initial_cost <= 0:
            break
        change = abs(summary.final_cost - summary.initial_cost) / max(
            summary.initial_cost, 1e-12
        )
        if change < options.ba_global_max_refinement_change:
            break
    mapper.filter_images(options.get_mapper())


def _extract_colors(rec, image_path):
    """Mean track color from source images (ref: reconstruction.h:361-382).

    Vectorized per image: one fancy-indexed color fetch + one segment sum
    over point ids (the per-observation Python loop cost ~seconds per
    image at C4/C5 observation counts)."""
    from pycolmap_tpu.pipeline.images import read_image_rgb
    from pycolmap_tpu.scene.point2d import INVALID_POINT3D_ID

    image_path = Path(image_path)
    pids_all = np.fromiter(rec.points3D.keys(), dtype=np.int64)
    if len(pids_all) == 0:
        return
    row_of = {int(p): k for k, p in enumerate(pids_all)}
    sums = np.zeros((len(pids_all), 3), np.float64)
    counts = np.zeros(len(pids_all), np.int64)
    for iid in rec.reg_image_ids:
        img = rec.images[iid]
        f = image_path / img.name
        if not f.exists():
            continue
        try:
            arr = read_image_rgb(f)
        except Exception:
            continue
        h, w = arr.shape[:2]
        p3d = img.points2D_point3D_ids
        valid = p3d != np.uint64(INVALID_POINT3D_ID)
        if not valid.any():
            continue
        obs_pid = p3d[valid].astype(np.int64)
        rows = np.fromiter(
            (row_of.get(int(p), -1) for p in obs_pid), dtype=np.int64,
            count=len(obs_pid),
        )
        xy = np.rint(img.points2D_xy[valid]).astype(np.int64)
        ok = (
            (rows >= 0)
            & (xy[:, 0] >= 0) & (xy[:, 0] < w)
            & (xy[:, 1] >= 0) & (xy[:, 1] < h)
        )
        rows = rows[ok]
        xy = xy[ok]
        colors = arr[xy[:, 1], xy[:, 0]].astype(np.float64)
        np.add.at(sums, rows, colors)
        np.add.at(counts, rows, 1)
    got = counts > 0
    mean = np.zeros_like(sums)
    mean[got] = sums[got] / counts[got, None]
    mean = np.clip(mean, 0, 255).astype(np.uint8)
    for k in np.nonzero(got)[0]:
        rec.points3D[int(pids_all[k])].color = mean[k]


_PROFILE = __import__("os").environ.get("PYCOLMAP_TPU_PROFILE") == "1"


def _reconstruct_model(mapper, cache, options, initial_callback=None,
                       next_callback=None, verbose=True):
    """Grow one model; returns True if it should be kept."""
    import time as _time

    log = _logging.get_logger()
    mopts = options.get_mapper()
    rec = mapper.reconstruction

    if rec.num_reg_images == 0:
        init1, init2 = options.init_image_id1, options.init_image_id2
        success = False
        for _ in range(options.init_num_trials):
            if init1 < 0 or init2 < 0:
                id1, id2 = mapper.find_initial_image_pair(mopts)
            else:
                id1, id2 = init1, init2
            if id1 is None:
                break
            if mapper.register_initial_image_pair(mopts, id1, id2):
                success = True
                break
            if init1 >= 0 and init2 >= 0:
                break
        if not success:
            return False, False  # (kept, init_ok): no init pair left
        log.info(
            f"Initialized with image pair, {rec.num_points3D} seed points"
        )
        if initial_callback:
            initial_callback()
        _iterative_global_refinement(mapper, options)

    num_global_images = max(rec.num_reg_images, 2)
    num_global_points = max(rec.num_points3D, 1)

    while True:
        t_find = _time.perf_counter()
        candidates = mapper.find_next_images(mopts)
        if _PROFILE:
            log.info(
                f"profile find_next_images: {_time.perf_counter() - t_find:.2f}s"
            )
        if not candidates:
            break
        registered_any = False
        for image_id in candidates[:5]:
            t_reg = _time.perf_counter()
            if mapper.register_next_image(mopts, image_id):
                registered_any = True
                t0 = _time.perf_counter()
                mapper.triangulator.clear_cache()
                mapper.triangulate_image(options.triangulation, image_id)
                t_tri = _time.perf_counter()
                _iterative_local_refinement(mapper, options, image_id)
                t_local = _time.perf_counter()
                if _PROFILE:
                    log.info(
                        f"profile img {image_id}: register "
                        f"{t0 - t_reg:.2f}s triangulate {t_tri - t0:.2f}s "
                        f"local_ba {t_local - t_tri:.2f}s"
                    )
                if next_callback:
                    next_callback()
                log.info(
                    f"Registered image #{image_id} "
                    f"({rec.num_reg_images} images, {rec.num_points3D} points)"
                )
                # growth-gated global refinement (ref: sfm.h:194-208)
                if (
                    rec.num_reg_images
                    >= options.ba_global_images_ratio * num_global_images
                    or rec.num_points3D
                    >= options.ba_global_points_ratio * num_global_points
                    or rec.num_reg_images
                    >= num_global_images + options.ba_global_images_freq
                    or rec.num_points3D
                    >= num_global_points + options.ba_global_points_freq
                ):
                    t_g = _time.perf_counter()
                    _iterative_global_refinement(mapper, options)
                    if _PROFILE:
                        log.info(
                            f"profile global refinement: "
                            f"{_time.perf_counter() - t_g:.2f}s "
                            f"({rec.num_reg_images} images)"
                        )
                    num_global_images = max(rec.num_reg_images, 2)
                    num_global_points = max(rec.num_points3D, 1)
                break
        if not registered_any:
            break

    _iterative_global_refinement(mapper, options)

    # drift-fold recovery (VERDICT r4 missing #2): when the verified pair
    # graph still disagrees with the mapped poses (folded loop), relax the
    # pose graph and re-refine; at most 2 rounds, no-op when healthy
    if options.pose_graph_relaxation:
        from pycolmap_tpu.sfm.pose_graph import relax_pose_graph

        pair_pose = getattr(cache, "pair_pose", None) or {}
        if pair_pose:
            for _ in range(2):
                if not relax_pose_graph(
                    rec, pair_pose,
                    min_residual_deg=options.pose_graph_min_residual_deg,
                ):
                    break
                _iterative_global_refinement(mapper, options)
    return rec.num_reg_images >= 2, True


def incremental_mapping(
    database_path,
    image_path,
    output_path,
    options: IncrementalPipelineOptions = None,
    input_path: str = "",
    initial_image_pair_callback=None,
    next_image_callback=None,
):
    """Full incremental SfM (ref: pipeline/sfm.h:46-93).

    Returns dict {index: Reconstruction}; also writes models under
    output_path/<index>/ like the reference.
    """
    if options is None:
        options = IncrementalPipelineOptions()
    log = _logging.get_logger()
    output_path = Path(output_path)
    output_path.mkdir(parents=True, exist_ok=True)

    cache = DatabaseCache.load(
        database_path,
        min_num_matches=options.min_num_matches,
        ignore_watermarks=options.ignore_watermarks,
        image_names=options.image_names or None,
    )
    log.info(
        f"Loaded database: {cache.num_images} images, "
        f"{cache.correspondence_graph.num_image_pairs} verified pairs"
    )

    # overlap the early BA compiles with graph construction / init search
    if cache.cameras:
        from pycolmap_tpu.sfm.prewarm import prewarm_mapper_ba

        prewarm_mapper_ba(
            int(next(iter(cache.cameras.values())).model_id),
            options.get_local_ba(),
            options.get_global_ba(),
        )

    manager = ReconstructionManager()
    if input_path:
        idx = manager.add()
        manager.get(idx).read(input_path)

    mapper = IncrementalMapper(cache)

    initial_models = len(manager)
    max_models = options.max_num_models if options.multiple_models else 1
    processed_initial = False
    while True:
        if initial_models and not processed_initial:
            idx = 0  # resume the model read from input_path exactly once
            processed_initial = True
        elif len(manager) < max_models + initial_models:
            idx = manager.add()
        else:
            break
        rec = manager.get(idx)
        cache.setup_reconstruction(rec)
        mapper.begin_reconstruction(rec, options.triangulation)

        num_snapshot_state = {"count": 0, "last": 0}

        def _snapshot_cb():
            if next_image_callback:
                next_image_callback()
            if options.snapshot_path and options.snapshot_images_freq > 0:
                n = rec.num_reg_images
                if n - num_snapshot_state["last"] >= options.snapshot_images_freq:
                    num_snapshot_state["last"] = n
                    snap = (
                        Path(options.snapshot_path)
                        / f"{num_snapshot_state['count']:06d}"
                    )
                    snap.mkdir(parents=True, exist_ok=True)
                    rec.write_binary(snap)
                    num_snapshot_state["count"] += 1

        kept, init_ok = _reconstruct_model(
            mapper, cache, options,
            initial_callback=initial_image_pair_callback,
            next_callback=_snapshot_cb,
        )
        total_reg = rec.num_reg_images
        mapper.end_reconstruction(discard=not kept)
        if not kept or total_reg < options.min_model_size:
            if len(manager) > 1 or not kept:
                manager.delete(idx)
            if not init_ok:
                break  # no initialization pair left anywhere — done
            # init succeeded but the model collapsed (e.g. a degenerate
            # short-baseline seed whose focal ran away and was culled by
            # filter_images, ref has_bogus_params) — try the NEXT init
            # pair; find_initial_image_pair never repeats pairs, so this
            # terminates (upstream retries likewise instead of aborting
            # the whole reconstruction on the first bad seed)
            continue
        # stop if most images registered
        reg_total = {
            i for r in manager.reconstructions for i in r.reg_image_ids
        }
        if len(reg_total) >= cache.num_images - 2:
            break
        if not options.multiple_models:
            break

    if options.extract_colors:
        for rec in manager.reconstructions:
            _extract_colors(rec, image_path)

    manager.write(output_path)
    return {i: manager.get(i) for i in range(len(manager))}


def bundle_adjustment(reconstruction, options: BundleAdjustmentOptions = None):
    """Global BA on an existing reconstruction (ref: pipeline/sfm.h:95-103)."""
    if options is None:
        options = BundleAdjustmentOptions()
    reg = reconstruction.reg_image_ids
    if len(reg) < 2:
        return None
    problem, mapping = build_bundle_problem(
        reconstruction, options,
        constant_pose_ids=[reg[0]], constant_tvec_x_ids=[reg[1]],
    )
    new_problem, summary = solve_bundle(problem, options)
    apply_bundle_solution(reconstruction, new_problem, mapping)
    if options.print_summary:
        _logging.get_logger().info(str(summary))
    return summary


def triangulate_points(
    reconstruction,
    database_path,
    image_path,
    output_path,
    clear_points: bool = True,
    options: IncrementalPipelineOptions = None,
    refine_intrinsics: bool = False,
):
    """Triangulate a model with known fixed poses (ref: pipeline/sfm.h:23-44)."""
    if options is None:
        options = IncrementalPipelineOptions()
    output_path = Path(output_path)
    output_path.mkdir(parents=True, exist_ok=True)

    cache = DatabaseCache.load(database_path, options.min_num_matches)
    # align db image ids with reconstruction by name
    name_to_dbid = {img.name: iid for iid, img in cache.images.items()}
    if clear_points:
        for pid in list(reconstruction.points3D):
            reconstruction.delete_point3D(pid)
    # rebuild images with db keypoints (poses kept)
    for iid, img in list(reconstruction.images.items()):
        dbid = name_to_dbid.get(img.name)
        if dbid is None:
            continue
        db_img = cache.images[dbid]
        if img.num_points2D == 0:
            img.set_keypoints(db_img.points2D_xy)

    mapper = IncrementalMapper(cache)
    mapper.begin_reconstruction(reconstruction, options.triangulation)
    for iid in reconstruction.reg_image_ids:
        mapper.triangulator.triangulate_image(iid)
    mapper.triangulator.complete_tracks()
    mapper.triangulator.merge_tracks()
    ba = options.get_global_ba()
    ba.refine_extrinsics = False
    if not refine_intrinsics:
        ba.refine_focal_length = False
        ba.refine_extra_params = False
    bundle_adjustment(reconstruction, ba)
    reconstruction.filter_points3D(
        options.mapper.filter_max_reproj_error, options.mapper.filter_min_tri_angle
    )
    mapper.end_reconstruction()
    reconstruction.write_binary(output_path)
    return reconstruction
