from tpu3d.ba.residuals import reprojection_residuals, observation_jacobians
from tpu3d.ba.lm import BAState, bundle_adjust, ba_cost

__all__ = [
    "reprojection_residuals",
    "observation_jacobians",
    "BAState",
    "bundle_adjust",
    "ba_cost",
]
