"""pycolmap_tpu: a TPU-native Structure-from-Motion framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
COLMAP/pycolmap (reference surveyed in SURVEY.md). The public surface mirrors
pycolmap's four API families (ref: SURVEY.md §1 L3): scene objects, geometry
types, stateless estimators, and pipeline stages.
"""

__version__ = "0.1.0"

import os as _os

# NOTE: jax's own persistent compilation cache is deliberately NOT enabled.
# It stores XLA:CPU AOT machine code whose feature fingerprint follows the
# COMPILING XLA's preferences (+prefer-no-scatter etc.), and loading an
# entry whose fingerprint mismatches the host logs SIGILL hazards / crashes
# (seen live 2026-08-21 and in MULTICHIP_r02); the remote TPU tunnel
# bypasses it anyway. Cross-process executable persistence comes from
# utils/aot_cache.py (jax serialize_executable, TPU-only) instead.

from pycolmap_tpu.geometry import Rigid3d, Rotation3d, Sim3d
from pycolmap_tpu.scene import (
    Camera,
    Correspondence,
    CorrespondenceGraph,
    Database,
    DatabaseTransaction,
    Image,
    Point2D,
    Point3D,
    Reconstruction,
    Track,
    TrackElement,
    image_pair_to_pair_id,
    pair_id_to_image_pair,
)
from pycolmap_tpu.estimators import (
    AbsolutePoseEstimationOptions,
    AbsolutePoseRefinementOptions,
    ImageAlignmentError,
    RANSACOptions,
    TwoViewGeometry,
    TwoViewGeometryConfiguration,
    TwoViewGeometryOptions,
    absolute_pose_estimation,
    align_reconstruction_to_locations,
    align_reconstructions_via_points,
    align_reconstructions_via_proj_centers,
    align_reconstructions_via_reprojections,
    align_reconstrution_to_locations,
    compare_reconstructions,
    estimate_sim3d_robust,
    essential_matrix_estimation,
    estimate_absolute_pose,
    estimate_calibrated_two_view_geometry,
    estimate_essential_matrix,
    estimate_fundamental_matrix,
    estimate_homography_matrix,
    estimate_triangulation,
    estimate_two_view_geometry,
    estimate_two_view_geometry_pose,
    fundamental_matrix_estimation,
    homography_decomposition,
    homography_matrix_estimation,
    pose_refinement,
    refine_absolute_pose,
    rig_absolute_pose_estimation,
)
from pycolmap_tpu.features import (
    Normalization,
    Sift,
    SiftExtractionOptions,
    SiftMatchingOptions,
    extract_sift,
    match_descriptors,
    match_guided,
)
from pycolmap_tpu.pipeline import (
    CameraMode,
    DelaunayMeshingOptions,
    ExhaustiveMatchingOptions,
    ImageReaderOptions,
    IncrementalPipelineOptions,
    PatchMatchOptions,
    PoissonMeshingOptions,
    ReconstructionManager,
    SequentialMatchingOptions,
    SpatialMatchingOptions,
    StereoFusionOptions,
    UndistortCameraOptions,
    VocabTreeMatchingOptions,
    bundle_adjustment,
    dense_delaunay_meshing,
    extract_features,
    import_images,
    incremental_mapping,
    infer_camera_from_image,
    match_exhaustive,
    match_sequential,
    match_spatial,
    match_vocabtree,
    patch_match_stereo,
    poisson_meshing,
    sparse_delaunay_meshing,
    stereo_fusion,
    triangulate_points,
    undistort_images,
    verify_matches,
)
from pycolmap_tpu.features.retrieval import (
    InvertedIndex,
    VocabTree,
    build_visual_index,
)
from pycolmap_tpu.parallel.device_ctx import (
    get_default_mesh,
    resolve_mesh,
    set_default_mesh,
)
from pycolmap_tpu.parallel.graph_partition import hierarchical_mapping
from pycolmap_tpu.sfm.bundle_adjustment import (
    BundleAdjustmentOptions,
    LossFunctionType,
)
from pycolmap_tpu.sfm.incremental_mapper import (
    ImageSelectionMethod,
    IncrementalMapper,
    IncrementalMapperOptions,
)
from pycolmap_tpu.sfm.incremental_triangulator import (
    IncrementalTriangulator,
    IncrementalTriangulatorOptions,
)
from pycolmap_tpu.utils.logging import logging

import enum as _enum


class Device(_enum.IntEnum):
    """Compute device selector (API parity: pycolmap/main.cc:102-106).

    The reference exposes auto/cpu/cuda; the TPU framework maps 'cuda' to
    the accelerator slot (TPU) so existing pycolmap call sites keep working.
    """

    auto = -1
    cpu = 0
    cuda = 1  # accelerator (TPU here)
    tpu = 1


has_cuda = False  # TPU framework; kept for reference API compatibility
has_tpu = None  # resolved lazily on first device query


def _detect_tpu() -> bool:
    global has_tpu
    if has_tpu is None:
        try:
            import jax

            has_tpu = any(d.platform in ("tpu", "axon") for d in jax.devices())
        except Exception:
            has_tpu = False
    return has_tpu
