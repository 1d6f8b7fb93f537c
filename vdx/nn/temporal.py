"""Temporal (motion) transformer — the AnimateDiff-style motion module.

Implements the structure the reference documents and traces
(reference docs/02_video_diffusion_architecture.md:52-82, verified shapes at
experiments/03_trace_forward_pass.py:160-169, 266-275):

    GroupNorm -> proj_in (Linear)
      -> [B*H*W, F, C]           (each spatial position attends across frames)
      -> TemporalBlock x depth   (sinusoidal frame PE, double temporal
                                  self-attention, GEGLU ff)
    -> proj_out (Linear) -> +residual

GroupNorm statistics span frames AND space jointly (torch GN over
[B, C, F, H, W]); ops.group_norm reproduces that on the channels-last layout.

TPU note: the frame axis F is the shardable "sequence" axis for long-clip
sequence parallelism — this module is the only cross-frame op in the UNet, so
it is the only place ring attention is ever needed (SURVEY.md §5).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp

from vdx.core.dtypes import DEFAULT_POLICY, Policy
from vdx.nn.attention import Attention, FeedForward
from vdx.nn.embeddings import sinusoidal_positional_encoding
from vdx.nn.transformer import LayerNormF32
from vdx.ops.groupnorm import group_norm


class TemporalBlock(nn.Module):
    """BasicTransformerBlock with sinusoidal frame PE and double self-attn."""

    dim: int
    heads: int
    head_dim: int
    max_seq_length: int = 32
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        F = x.shape[1]
        pe = sinusoidal_positional_encoding(F, self.dim).astype(x.dtype)

        h = LayerNormF32(policy=self.policy, name="norm1")(x)
        h = h + pe[None]
        x = x + Attention(
            self.dim, self.heads, self.head_dim, policy=self.policy, name="attn1"
        )(h)

        h = LayerNormF32(policy=self.policy, name="norm2")(x)
        h = h + pe[None]
        x = x + Attention(
            self.dim, self.heads, self.head_dim, policy=self.policy, name="attn2"
        )(h)

        h = LayerNormF32(policy=self.policy, name="norm3")(x)
        x = x + FeedForward(self.dim, policy=self.policy, name="ff")(h)
        return x


class TemporalTransformer3D(nn.Module):
    """Motion module. Input [B*F, H, W, C] + static num_frames; same output."""

    heads: int = 8
    depth: int = 1
    max_seq_length: int = 32
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x: jnp.ndarray, num_frames: int) -> jnp.ndarray:
        BF, H, W, C = x.shape
        F = num_frames
        B = BF // F
        residual = x

        # GN with stats over (F, H, W) jointly: reshape so frames join the
        # spatial axes under one batch element.
        h = x.reshape(B, F, H, W, C)
        scale = self.param("norm_scale", nn.initializers.ones, (C,), self.policy.param_dtype)
        bias = self.param("norm_bias", nn.initializers.zeros, (C,), self.policy.param_dtype)
        h = group_norm(h, math.gcd(32, C), scale, bias, eps=1e-6)

        # [B, F, H, W, C] -> [B*H*W, F, C]
        h = h.transpose(0, 2, 3, 1, 4).reshape(B * H * W, F, C)
        h = nn.Dense(
            C,
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
            name="proj_in",
        )(h)
        head_dim = C // self.heads
        for i in range(self.depth):
            h = TemporalBlock(
                C,
                self.heads,
                head_dim,
                max_seq_length=self.max_seq_length,
                policy=self.policy,
                name=f"blocks_{i}",
            )(h)
        h = nn.Dense(
            C,
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
            name="proj_out",
        )(h)

        # [B*H*W, F, C] -> [B*F, H, W, C]
        h = h.reshape(B, H, W, F, C).transpose(0, 3, 1, 2, 4).reshape(BF, H, W, C)
        return h + residual
