"""GroupNorm (+fused SiLU) over channels-last tensors.

Matches torch ``nn.GroupNorm`` semantics: statistics per (batch, group) over
all remaining dims. The reference UNet uses GN(32, eps=1e-5) in ResNet blocks
and GN(32, eps=1e-6) in transformer/motion projections (SD-1.5 conventions;
module structure per reference docs/02_video_diffusion_architecture.md:52-82).

Stats are computed in fp32 regardless of input dtype (core/dtypes.py policy).
On TPU the fused GN+SiLU Pallas kernel (kernels/groupnorm.py) is used for the
UNet hot loop; this XLA formulation is the reference/fallback path and is
itself fully fuseable by XLA.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def group_norm(
    x: jnp.ndarray,
    num_groups: int,
    scale: Optional[jnp.ndarray],
    bias: Optional[jnp.ndarray],
    eps: float = 1e-5,
) -> jnp.ndarray:
    """GroupNorm over a channels-last tensor [..., C] with batch on axis 0.

    All axes except 0 (batch) and the group split of the last axis are
    reduction axes — for [B, F, H, W, C] inputs the stats correctly span
    frames and space jointly, matching torch GN over [B, C, F, H, W].
    """
    orig_dtype = x.dtype
    C = x.shape[-1]
    assert C % num_groups == 0, (C, num_groups)
    gshape = x.shape[:-1] + (num_groups, C // num_groups)
    xg = x.astype(jnp.float32).reshape(gshape)
    axes = tuple(range(1, xg.ndim - 2)) + (xg.ndim - 1,)
    mean = xg.mean(axis=axes, keepdims=True)
    var = xg.var(axis=axes, keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    x = xg.reshape(x.shape)
    if scale is not None:
        x = x * scale.astype(jnp.float32)
    if bias is not None:
        x = x + bias.astype(jnp.float32)
    return x.astype(orig_dtype)


def group_norm_silu(
    x: jnp.ndarray,
    num_groups: int,
    scale: Optional[jnp.ndarray],
    bias: Optional[jnp.ndarray],
    eps: float = 1e-5,
) -> jnp.ndarray:
    """GroupNorm followed by SiLU — the UNet ResNet hot pattern."""
    y = group_norm(x, num_groups, scale, bias, eps)
    y32 = y.astype(jnp.float32)
    return (y32 * jnp.reciprocal(1.0 + jnp.exp(-y32))).astype(x.dtype)
