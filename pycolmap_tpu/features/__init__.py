from pycolmap_tpu.features.matcher import (
    SiftMatchingOptions,
    match_descriptors,
    match_guided,
)
from pycolmap_tpu.features.sift import (
    Normalization,
    Sift,
    SiftExtractionOptions,
    extract_sift,
)
