"""pycolmap_tpu: a TPU-native Structure-from-Motion framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
COLMAP/pycolmap (reference surveyed in SURVEY.md). The public surface mirrors
pycolmap's four API families (ref: SURVEY.md §1 L3): scene objects, geometry
types, stateless estimators, and pipeline stages.
"""

__version__ = "0.1.0"

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
