"""UNet3D — ModelScope-class text-to-video denoiser.

Covers the "ModelScope text-to-video-ms-1.7b" target config
(BASELINE.json configs[0]): the third architecture family beside
UNetMotion (inserted temporal attention) and LatteDiT (spatiotemporal
DiT). Per-layer unit here is:

    ResnetBlock2D (spatial) -> TemporalConv (3x1x1 conv stack over frames)
      -> SpatialTransformer (self + text cross-attn)
      -> TemporalTransformer3D (temporal attention)

plus a ``transformer_in`` temporal transformer right after conv_in —
the ModelScope/UNet3DConditionModel layout. Reuses this framework's
building blocks; channels-last video layout [B, F, H, W, C] throughout.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from vdx.core.dtypes import DEFAULT_POLICY, Policy
from vdx.nn.embeddings import TimestepEmbedding, get_timestep_embedding
from vdx.nn.freeu import FreeUConfig, apply_freeu
from vdx.nn.resnet import Downsample2D, GroupNormModule, ResnetBlock2D, Upsample2D
from vdx.nn.temporal import TemporalTransformer3D
from vdx.nn.transformer import SpatialTransformer


@dataclasses.dataclass(frozen=True)
class UNet3DConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 1024
    attention_head_dim: int = 64  # heads = C // head_dim (ModelScope style)
    down_block_has_attn: Tuple[bool, ...] = (True, True, True, False)

    @classmethod
    def modelscope(cls) -> "UNet3DConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "UNet3DConfig":
        return cls(
            block_out_channels=(32, 64, 64, 64),
            layers_per_block=1,
            cross_attention_dim=64,
            attention_head_dim=16,
        )

    @property
    def up_block_has_attn(self) -> Tuple[bool, ...]:
        return tuple(reversed(self.down_block_has_attn))


class TemporalConv(nn.Module):
    """ModelScope TemporalConvLayer: GN-SiLU-conv(3,1,1) x4 with residual.

    Operates on [B*F, H, W, C] with static num_frames; convs mix only the
    frame axis (kernel (3,1,1)), so it is a cross-frame op like the
    temporal attention. Under frame sharding (``temporal_impl`` "ring:"/
    "ulysses:") the convs halo-exchange one edge frame over ICI
    (ops/halo.py) and the GN statistics pmean across the shards — exact vs
    local execution, parameter tree unchanged.
    """

    policy: Policy = DEFAULT_POLICY
    temporal_impl: str = "local"

    @nn.compact
    def __call__(self, x: jnp.ndarray, num_frames: int,
                 frames_valid=None) -> jnp.ndarray:
        import jax as _jax

        from vdx.nn.temporal import _shard_axis, frame_validity_mask
        from vdx.ops.halo import frame_halo_pad

        axis = _shard_axis(self.temporal_impl)
        # ragged frame sharding: mask padded slots out of the GN stats and
        # zero them before each size-3 frame conv (== local SAME padding
        # at the clip's true end) — see models/svd_unet.py
        ragged = frames_valid is not None and frames_valid < num_frames * (
            1 if axis is None else _jax.lax.axis_size(axis)
        )
        mask = (
            frame_validity_mask(num_frames, frames_valid, axis)
            if ragged else None
        )
        BF, H, W, C = x.shape
        B = BF // num_frames
        residual = x
        h = x.reshape(B, num_frames, H, W, C)
        for i in range(4):
            h = GroupNormModule(
                32 if C % 32 == 0 else min(C, 8),
                1e-5, self.policy, with_silu=True, stats_axis=axis,
                name=f"norm{i}",
            )(h, frame_mask=mask)
            if ragged:
                h = h * mask.astype(h.dtype)[None, :, None, None, None]
            if axis is None:
                pad_f = (1, 1)
            else:
                h = frame_halo_pad(h, axis, halo=1, frame_axis=1)
                pad_f = (0, 0)
            h = nn.Conv(
                C,
                (3, 1, 1),
                padding=[pad_f, (0, 0), (0, 0)],
                dtype=self.policy.compute_dtype,
                param_dtype=self.policy.param_dtype,
                kernel_init=nn.initializers.zeros if i == 3 else nn.initializers.lecun_normal(),
                name=f"conv{i}",
            )(h)
        return residual + h.reshape(BF, H, W, C)


class UNet3D(nn.Module):
    config: UNet3DConfig = UNet3DConfig()
    policy: Policy = DEFAULT_POLICY
    attn_impl: str = "auto"
    # "local" or "ring:<axis>"/"ulysses:<axis>" — frame-sharded execution
    # (parallel/frame_parallel); threads to the two cross-frame ops
    # (TemporalTransformer3D, TemporalConv)
    temporal_impl: str = "local"
    # Pyramid Attention Broadcast (pipelines/base.py builds the schedule)
    pab: bool = False
    # FreeU backbone/skip re-weighting in the first two up stages
    # (nn/freeu.py); None = exact baseline program.
    freeu: Optional[FreeUConfig] = None

    def _layer(self, x, temb, context, num_frames, channels, has_attn, name,
               refresh=None, frames_valid=None):
        cfg = self.config
        r = refresh or {}
        x = ResnetBlock2D(channels, policy=self.policy, name=f"{name}_resnet")(x, temb)
        x = TemporalConv(
            policy=self.policy, temporal_impl=self.temporal_impl,
            name=f"{name}_tconv",
        )(x, num_frames, frames_valid=frames_valid)
        if has_attn:
            heads = max(1, channels // cfg.attention_head_dim)
            x = SpatialTransformer(
                heads=heads,
                head_dim=channels // heads,
                context_dim=cfg.cross_attention_dim,
                policy=self.policy,
                attn_impl=self.attn_impl,
                pab=self.pab,
                name=f"{name}_attn",
            )(x, context, refresh_self=r.get("spatial"),
              refresh_cross=r.get("cross"))
            x = TemporalTransformer3D(
                heads=heads, policy=self.policy, pab=self.pab,
                temporal_impl=self.temporal_impl, name=f"{name}_tattn"
            )(x, num_frames, refresh=r.get("temporal"),
              frames_valid=frames_valid)
        return x

    @nn.compact
    def __call__(self, sample, timestep, context, *, num_frames=None,
                 pab_refresh=None, frames_valid=None):
        cfg = self.config
        B, F, H, W, Cin = sample.shape
        num_frames = num_frames or F

        x = sample.reshape(B * F, H, W, Cin).astype(self.policy.compute_dtype)
        context = jnp.repeat(context, F, axis=0).astype(self.policy.compute_dtype)

        t = jnp.broadcast_to(jnp.atleast_1d(timestep), (B,))
        t_emb = get_timestep_embedding(t, cfg.block_out_channels[0])
        temb = TimestepEmbedding(
            cfg.block_out_channels[0] * 4, policy=self.policy, name="time_embedding"
        )(t_emb)
        temb = jnp.repeat(temb, F, axis=0)

        x = nn.Conv(
            cfg.block_out_channels[0], (3, 3), padding=[(1, 1), (1, 1)],
            dtype=self.policy.compute_dtype, param_dtype=self.policy.param_dtype,
            name="conv_in",
        )(x)
        r = pab_refresh or {}
        heads0 = max(1, cfg.block_out_channels[0] // cfg.attention_head_dim)
        x = TemporalTransformer3D(
            heads=heads0, policy=self.policy, pab=self.pab,
            temporal_impl=self.temporal_impl, name="transformer_in"
        )(x, num_frames, refresh=r.get("temporal"), frames_valid=frames_valid)

        residuals = [x]
        n = len(cfg.block_out_channels)
        for bi, ch in enumerate(cfg.block_out_channels):
            for li in range(cfg.layers_per_block):
                x = self._layer(
                    x, temb, context, num_frames, ch,
                    cfg.down_block_has_attn[bi], name=f"down_{bi}_{li}",
                    refresh=pab_refresh, frames_valid=frames_valid,
                )
                residuals.append(x)
            if bi < n - 1:
                x = Downsample2D(ch, policy=self.policy, name=f"down_{bi}_downsample")(x)
                residuals.append(x)

        mid_ch = cfg.block_out_channels[-1]
        x = self._layer(x, temb, context, num_frames, mid_ch, True,
                        name="mid_0", refresh=pab_refresh,
                        frames_valid=frames_valid)
        x = ResnetBlock2D(mid_ch, policy=self.policy, name="mid_resnet_1")(x, temb)
        x = TemporalConv(
            policy=self.policy, temporal_impl=self.temporal_impl,
            name="mid_tconv_1",
        )(x, num_frames, frames_valid=frames_valid)

        for bi, ch in enumerate(reversed(cfg.block_out_channels)):
            for li in range(cfg.layers_per_block + 1):
                skip = residuals.pop()
                if self.freeu is not None:
                    x, skip = apply_freeu(bi, x, skip, self.freeu)
                x = jnp.concatenate([x, skip], axis=-1)
                x = self._layer(
                    x, temb, context, num_frames, ch,
                    cfg.up_block_has_attn[bi], name=f"up_{bi}_{li}",
                    refresh=pab_refresh, frames_valid=frames_valid,
                )
            if bi < n - 1:
                x = Upsample2D(ch, policy=self.policy, name=f"up_{bi}_upsample")(x)

        x = GroupNormModule(32, 1e-5, self.policy, with_silu=True, name="conv_norm_out")(x)
        x = nn.Conv(
            cfg.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
            dtype=self.policy.compute_dtype, param_dtype=self.policy.param_dtype,
            name="conv_out",
        )(x)
        x = self.policy.cast_to_output(x)
        return x.reshape(B, F, H, W, cfg.out_channels)
