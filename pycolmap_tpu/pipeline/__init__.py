from pycolmap_tpu.pipeline.extract_features import extract_features
from pycolmap_tpu.pipeline.images import (
    CameraMode,
    ImageReaderOptions,
    UndistortCameraOptions,
    import_images,
    infer_camera_from_image,
    undistort_images,
)
from pycolmap_tpu.pipeline.match_features import (
    ExhaustiveMatchingOptions,
    SequentialMatchingOptions,
    SpatialMatchingOptions,
    VocabTreeMatchingOptions,
    match_exhaustive,
    match_sequential,
    match_spatial,
    match_vocabtree,
    verify_matches,
)
from pycolmap_tpu.pipeline.mvs import (
    PatchMatchOptions,
    StereoFusionOptions,
    patch_match_stereo,
    stereo_fusion,
)
from pycolmap_tpu.mvs.meshing import (
    DelaunayMeshingOptions,
    PoissonMeshingOptions,
    dense_delaunay_meshing,
    poisson_meshing,
    sparse_delaunay_meshing,
)
from pycolmap_tpu.pipeline.sfm import (
    IncrementalPipelineOptions,
    ReconstructionManager,
    bundle_adjustment,
    incremental_mapping,
    triangulate_points,
)
