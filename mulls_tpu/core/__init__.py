from mulls_tpu.core import se3
from mulls_tpu.core.cloud import FeatureCloud, RawCloud, FeatureFrame, FEATURE_NAMES

__all__ = ["se3", "FeatureCloud", "RawCloud", "FeatureFrame", "FEATURE_NAMES"]
