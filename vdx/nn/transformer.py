"""Spatial transformer blocks (SD-1.5 Transformer2DModel semantics).

SpatialTransformer: GN(32,1e-6) -> 1x1-conv proj_in -> flatten [B, H*W, C] ->
BasicTransformerBlock (self-attn, text cross-attn, GEGLU ff) -> 1x1-conv
proj_out -> +residual. These are the SPATIAL and CROSS stages of the
per-layer interleave (reference experiments/03_trace_forward_pass.py:215-241);
the reference counts 32 of them in the UNet
(docs/02_video_diffusion_architecture.md:92-94).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from vdx.core.dtypes import DEFAULT_POLICY, Policy
from vdx.nn.attention import Attention, FeedForward
from vdx.nn.resnet import GroupNormModule


class LayerNormF32(nn.Module):
    """LayerNorm computed in fp32, output in compute dtype."""

    eps: float = 1e-5
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.LayerNorm(
            epsilon=self.eps,
            dtype=jnp.float32,
            param_dtype=self.policy.param_dtype,
        )(x).astype(x.dtype)


class BasicTransformerBlock(nn.Module):
    dim: int
    heads: int
    head_dim: int
    context_dim: Optional[int] = None
    policy: Policy = DEFAULT_POLICY
    attn_impl: str = "auto"
    pab: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        refresh_self=None,
        refresh_cross=None,
    ) -> jnp.ndarray:
        h = LayerNormF32(policy=self.policy, name="norm1")(x)
        x = x + Attention(
            self.dim,
            self.heads,
            self.head_dim,
            policy=self.policy,
            attn_impl=self.attn_impl,
            pab=self.pab,
            name="attn1",
        )(h, refresh=refresh_self)

        h = LayerNormF32(policy=self.policy, name="norm2")(x)
        x = x + Attention(
            self.dim,
            self.heads,
            self.head_dim,
            context_dim=self.context_dim,
            policy=self.policy,
            attn_impl=self.attn_impl,
            pab=self.pab,
            name="attn2",
        )(h, context, refresh=refresh_cross)

        h = LayerNormF32(policy=self.policy, name="norm3")(x)
        x = x + FeedForward(self.dim, policy=self.policy, name="ff")(h)
        return x


class SpatialTransformer(nn.Module):
    """Per-frame transformer over the flattened spatial axis.

    Input [B', H, W, C] (B' = batch*frames), context [B', 77, 768].
    """

    heads: int
    head_dim: int
    context_dim: int = 768
    depth: int = 1
    policy: Policy = DEFAULT_POLICY
    attn_impl: str = "auto"
    pab: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray,
                 refresh_self=None, refresh_cross=None) -> jnp.ndarray:
        B, H, W, C = x.shape
        residual = x
        h = GroupNormModule(32, 1e-6, self.policy, name="norm")(x)
        h = nn.Conv(
            C,
            (1, 1),
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
            name="proj_in",
        )(h)
        h = h.reshape(B, H * W, C)
        for i in range(self.depth):
            h = BasicTransformerBlock(
                C,
                self.heads,
                self.head_dim,
                context_dim=self.context_dim,
                policy=self.policy,
                attn_impl=self.attn_impl,
                pab=self.pab,
                name=f"blocks_{i}",
            )(h, context, refresh_self=refresh_self, refresh_cross=refresh_cross)
        h = h.reshape(B, H, W, C)
        h = nn.Conv(
            C,
            (1, 1),
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
            name="proj_out",
        )(h)
        return h + residual
