from vdx.core.dtypes import Policy, DEFAULT_POLICY, FP32_POLICY
from vdx.core.rng import noise_for_shape, split_like

__all__ = [
    "Policy",
    "DEFAULT_POLICY",
    "FP32_POLICY",
    "noise_for_shape",
    "split_like",
]
