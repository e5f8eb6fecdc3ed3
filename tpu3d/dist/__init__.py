from tpu3d.dist.mesh import make_mesh, data_sharding, grid_sharding, replicated
from tpu3d.dist.runtime import maybe_initialize_distributed
from tpu3d.dist.sharding import (
    make_sharded_dense_step,
    make_sharded_match_block,
    make_sharded_register_step,
    sharded_bundle_adjust,
)

__all__ = [
    "make_mesh",
    "data_sharding",
    "grid_sharding",
    "replicated",
    "make_sharded_dense_step",
    "make_sharded_match_block",
    "make_sharded_register_step",
    "sharded_bundle_adjust",
    "maybe_initialize_distributed",
]
