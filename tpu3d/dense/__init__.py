from tpu3d.dense.grid import VoxelGrid, trilinear_sample, eval_sh
from tpu3d.dense.render import render_rays, composite
from tpu3d.dense.sdf import SDFGrid, ray_aabb, sample_stratified, sample_pdf
from tpu3d.dense.traversal import voxel_traversal

__all__ = [
    "VoxelGrid",
    "trilinear_sample",
    "eval_sh",
    "render_rays",
    "composite",
    "SDFGrid",
    "ray_aabb",
    "sample_stratified",
    "sample_pdf",
    "voxel_traversal",
]
