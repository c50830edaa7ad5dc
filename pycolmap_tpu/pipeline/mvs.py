"""Dense reconstruction pipeline stages (API parity: pycolmap/pipeline/mvs.h).

``patch_match_stereo`` (:183) and ``stereo_fusion`` (:246) with
reference-compatible options structs; the compute lives in
pycolmap_tpu.mvs (JAX PatchMatch kernel + vectorized fusion).
"""

from __future__ import annotations

from pycolmap_tpu.mvs.controller import patch_match_stereo
from pycolmap_tpu.mvs.fusion import StereoFusionOptions, stereo_fusion
from pycolmap_tpu.mvs.patch_match import PatchMatchOptions

__all__ = [
    "PatchMatchOptions",
    "StereoFusionOptions",
    "patch_match_stereo",
    "stereo_fusion",
]
