from tpu3d.geometry.epipolar import (
    essential_eight_point,
    sampson_error,
    epipolar_residual,
)
from tpu3d.geometry.ransac import ransac
from tpu3d.geometry.pose import decompose_essential, recover_pose
from tpu3d.geometry.triangulate import (
    refine_triangulation_gn,
    triangulate_dlt,
    triangulate_midpoint,
)
from tpu3d.geometry.pnp import pnp_dlt, pnp_ransac, refine_pose
from tpu3d.geometry.estimators import (
    find_essential_ransac,
    EssentialResult,
)

__all__ = [
    "essential_eight_point",
    "sampson_error",
    "epipolar_residual",
    "ransac",
    "decompose_essential",
    "recover_pose",
    "triangulate_dlt",
    "triangulate_midpoint",
    "refine_triangulation_gn",
    "pnp_dlt",
    "pnp_ransac",
    "refine_pose",
    "find_essential_ransac",
    "EssentialResult",
]
