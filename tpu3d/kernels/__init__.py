from tpu3d.kernels.distance import mutual_nn_pallas, descriptor_top2

__all__ = ["mutual_nn_pallas", "descriptor_top2"]
