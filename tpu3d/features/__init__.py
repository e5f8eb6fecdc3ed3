from tpu3d.features.frontend import extract_features, FeatureSet

__all__ = ["extract_features", "FeatureSet"]
