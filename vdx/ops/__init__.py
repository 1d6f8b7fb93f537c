from vdx.ops.attention import dot_product_attention
from vdx.ops.groupnorm import group_norm, group_norm_silu

__all__ = ["dot_product_attention", "group_norm", "group_norm_silu"]
