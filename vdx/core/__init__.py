from vdx.core.dtypes import Policy, DEFAULT_POLICY, FP32_POLICY
from vdx.core.lora import init_lora, merge_lora
from vdx.core.rng import noise_for_shape, split_like

__all__ = [
    "Policy",
    "DEFAULT_POLICY",
    "FP32_POLICY",
    "init_lora",
    "merge_lora",
    "noise_for_shape",
    "split_like",
]
