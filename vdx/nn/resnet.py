"""ResNet / resampling blocks (channels-last, SD-1.5 semantics).

ResnetBlock2D: GN(32,1e-5)-SiLU-conv3x3 -> +time_emb(SiLU-Linear) ->
GN-SiLU-conv3x3 -> +skip (1x1 conv when channels change). This is the
RESNET stage of the interleave the reference traces
(reference experiments/03_trace_forward_pass.py:215-241:
resnet -> spatial attn -> cross attn -> motion module).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vdx.core.dtypes import DEFAULT_POLICY, Policy
from vdx.ops.groupnorm import group_norm_silu


class SpatialConv3x3(nn.Module):
    """SAME 3x3 conv computed as nine shifted CxC matmuls.

    Parameter tree is IDENTICAL to ``nn.Conv(features, (3, 3))`` — kernel
    [3, 3, Cin, Cout] + bias, same initializers — so checkpoints and
    conversion rules see no difference. The nine taps become
    [M, Cin] x [Cin, Cout] contractions the MXU tiles directly; measured
    against XLA's conv lowering in scripts/bench_svd_fwd_breakdown.py
    (sconv-mm variant).
    """

    features: int
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, H, W, C]
        Cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, Cin, self.features), self.policy.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          self.policy.param_dtype)
        w = kernel.astype(self.policy.compute_dtype)
        xc = x.astype(self.policy.compute_dtype)
        H, W = x.shape[1], x.shape[2]
        # pad once; each tap is a static slice -> one matmul -> accumulate
        xp = jnp.pad(xc, ((0, 0), (1, 1), (1, 1), (0, 0)))
        y = None
        for dh in range(3):
            for dw in range(3):
                t = jax.lax.slice_in_dim(
                    jax.lax.slice_in_dim(xp, dh, dh + H, axis=1),
                    dw, dw + W, axis=2)
                c = jnp.einsum("bhwc,cd->bhwd", t, w[dh, dw])
                y = c if y is None else y + c
        return y + bias.astype(y.dtype)


def _conv(features: int, kernel: int, policy: Policy, name: str, stride: int = 1):
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(kernel // 2, kernel // 2)] * 2 if stride == 1 else [(1, 1), (1, 1)],
        dtype=policy.compute_dtype,
        param_dtype=policy.param_dtype,
        name=name,
    )


class GroupNormModule(nn.Module):
    """Affine GroupNorm as a parameter-holding module (fp32 stats).

    ``stats_axis``: mesh axis name to pmean the moments over when the
    reduction dims are sharded (frame-sharded temporal blocks).
    """

    num_groups: int = 32
    eps: float = 1e-5
    policy: Policy = DEFAULT_POLICY
    with_silu: bool = False
    stats_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, frame_mask=None) -> jnp.ndarray:
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), self.policy.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (C,), self.policy.param_dtype)
        if self.with_silu:
            return group_norm_silu(
                x, self.num_groups, scale, bias, self.eps, self.stats_axis,
                frame_mask,
            )
        from vdx.ops.groupnorm import group_norm

        return group_norm(x, self.num_groups, scale, bias, self.eps,
                          self.stats_axis, frame_mask)


class ResnetBlock2D(nn.Module):
    out_channels: int
    use_time_emb: bool = True
    groups: int = 32
    eps: float = 1e-5
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, temb: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        in_channels = x.shape[-1]
        h = GroupNormModule(
            self.groups, self.eps, self.policy, with_silu=True, name="norm1"
        )(x)
        h = _conv(self.out_channels, 3, self.policy, "conv1")(h)

        if self.use_time_emb and temb is not None:
            t = nn.silu(temb.astype(jnp.float32)).astype(self.policy.compute_dtype)
            t = nn.Dense(
                self.out_channels,
                dtype=self.policy.compute_dtype,
                param_dtype=self.policy.param_dtype,
                name="time_emb_proj",
            )(t)
            # temb is [B', C]; h is [B', H, W, C]
            h = h + t[:, None, None, :]

        h = GroupNormModule(
            self.groups, self.eps, self.policy, with_silu=True, name="norm2"
        )(h)
        h = _conv(self.out_channels, 3, self.policy, "conv2")(h)

        if in_channels != self.out_channels:
            x = _conv(self.out_channels, 1, self.policy, "conv_shortcut")(x)
        return x + h


class Downsample2D(nn.Module):
    """3x3 stride-2 conv, torch-style asymmetric (0,1) padding."""

    out_channels: int
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # diffusers Downsample2D pads (0,1,0,1) then convs with padding=0
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(
            self.out_channels,
            (3, 3),
            strides=(2, 2),
            padding="VALID",
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
            name="conv",
        )(x)


class Upsample2D(nn.Module):
    """Nearest-neighbour 2x upsample + 3x3 conv."""

    out_channels: int
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return _conv(self.out_channels, 3, self.policy, "conv")(x)
