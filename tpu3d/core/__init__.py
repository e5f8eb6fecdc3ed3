from tpu3d.core.lie import (
    so3_exp,
    so3_log,
    so3_hat,
    se3_apply,
    se3_compose,
    se3_inverse,
)
from tpu3d.core.camera import (
    intrinsics_matrix,
    project,
    project_extrinsic,
    pixel_to_centered,
    centered_to_pixel,
    camera_rays,
    camera_center,
)

__all__ = [
    "so3_exp",
    "so3_log",
    "so3_hat",
    "se3_apply",
    "se3_compose",
    "se3_inverse",
    "intrinsics_matrix",
    "project",
    "project_extrinsic",
    "pixel_to_centered",
    "centered_to_pixel",
    "camera_rays",
    "camera_center",
]
