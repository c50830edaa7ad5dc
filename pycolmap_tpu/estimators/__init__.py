from pycolmap_tpu.estimators.absolute_pose import (
    AbsolutePoseEstimationOptions,
    AbsolutePoseRefinementOptions,
    absolute_pose_estimation,
    estimate_absolute_pose,
    pose_refinement,
    refine_absolute_pose,
)
from pycolmap_tpu.estimators.alignment import (
    ImageAlignmentError,
    align_reconstruction_to_locations,
    align_reconstructions_via_points,
    align_reconstructions_via_proj_centers,
    align_reconstructions_via_reprojections,
    align_reconstrution_to_locations,
    compare_reconstructions,
    estimate_sim3d_robust,
)
from pycolmap_tpu.estimators.essential_matrix import (
    essential_matrix_estimation,
    estimate_essential_matrix,
)
from pycolmap_tpu.estimators.fundamental_matrix import (
    estimate_fundamental_matrix,
    fundamental_matrix_estimation,
)
from pycolmap_tpu.estimators.homography_matrix import (
    estimate_homography_matrix,
    homography_matrix_estimation,
)
from pycolmap_tpu.estimators.generalized_absolute_pose import (
    rig_absolute_pose_estimation,
)
from pycolmap_tpu.estimators.homography_decomposition import (
    homography_decomposition,
)
from pycolmap_tpu.estimators.ransac import RANSACOptions
from pycolmap_tpu.estimators.triangulation import (
    EstimateTriangulationOptions,
    estimate_triangulation,
)
from pycolmap_tpu.estimators.two_view_geometry import (
    TwoViewGeometry,
    TwoViewGeometryConfiguration,
    TwoViewGeometryOptions,
    estimate_calibrated_two_view_geometry,
    estimate_two_view_geometry,
    estimate_two_view_geometry_pose,
)
