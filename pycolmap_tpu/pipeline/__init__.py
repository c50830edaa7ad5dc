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
from pycolmap_tpu.pipeline.sfm import (
    IncrementalPipelineOptions,
    ReconstructionManager,
    bundle_adjustment,
    incremental_mapping,
    triangulate_points,
)
