from mulls_tpu.frontend.features import extract_features
from mulls_tpu.frontend.icp import mm_lls_icp, RegResult

__all__ = ["extract_features", "mm_lls_icp", "RegResult"]
