from tpu3d.dist.mesh import make_mesh, data_sharding, grid_sharding, replicated
from tpu3d.dist.sharding import make_sharded_dense_step, sharded_bundle_adjust

__all__ = [
    "make_mesh",
    "data_sharding",
    "grid_sharding",
    "replicated",
    "make_sharded_dense_step",
    "sharded_bundle_adjust",
]
