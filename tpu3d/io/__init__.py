from tpu3d.io.images import list_images, load_images, load_image_batch
from tpu3d.io.ply import write_ply, filter_point_cloud
from tpu3d.io.artifacts import ArtifactStore

__all__ = [
    "list_images",
    "load_images",
    "load_image_batch",
    "write_ply",
    "filter_point_cloud",
    "ArtifactStore",
]
