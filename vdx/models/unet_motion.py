"""UNetMotion — SD-1.5 UNet with interleaved temporal motion modules.

TPU-native rebuild of the 1312.7M-param denoiser the reference drives
(reference docs/02_video_diffusion_architecture.md:37-94). Per-layer op
interleave matches the reference's observed execution order
(experiments/03_trace_forward_pass.py:215-241):

    resnet -> spatial self-attn -> text cross-attn -> motion module

Layout: channels-last (NHWC — XLA TPU's native conv layout). Video enters as
[B, F, H, W, C]; spatial stages run on the flattened [B*F, H, W, C] view and
motion modules re-fold to [B*H*W, F, C] (the temporal-attention contract the
reference verifies at 03:160-169).

SD-1.5 shape facts: block channels (320, 640, 1280, 1280), 2 layers/block,
8 attention heads with head_dim = C/8, cross-attention dim 768, GN(32).
Motion modules: 8 heads, sinusoidal frame PE, max 32 frames.
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
class UNetMotionConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    attention_heads: int = 8  # spatial heads; head_dim = C / heads
    motion_heads: int = 8
    motion_max_seq: int = 32
    transformer_depth: int = 1
    # Which blocks carry spatial+cross attention (last down block doesn't).
    down_block_has_attn: Tuple[bool, ...] = (True, True, True, False)

    @classmethod
    def sd15(cls) -> "UNetMotionConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "UNetMotionConfig":
        """Small config for CPU tests: same topology, 64x fewer params."""
        return cls(
            block_out_channels=(32, 64, 64, 64),
            layers_per_block=1,
            cross_attention_dim=64,  # == CLIPTextConfig.tiny().hidden_size
            attention_heads=2,
            motion_heads=2,
        )

    @property
    def up_block_has_attn(self) -> Tuple[bool, ...]:
        return tuple(reversed(self.down_block_has_attn))


class UNetMotion(nn.Module):
    config: UNetMotionConfig = UNetMotionConfig()
    policy: Policy = DEFAULT_POLICY
    attn_impl: str = "auto"
    # "local" (all frames on-device) or "ring:<axis>" (frame-sharded inside
    # shard_map; num_frames then means the LOCAL shard size). Params are
    # identical either way.
    temporal_impl: str = "local"
    # Pyramid Attention Broadcast: attention outputs cached in the mutable
    # 'pab_cache' collection and reused on steps where the per-type refresh
    # flag is False (pipelines/base.py builds the schedule).
    pab: bool = False
    # FreeU backbone/skip re-weighting in the first two up stages
    # (nn/freeu.py); None = exact baseline program.
    freeu: Optional[FreeUConfig] = None

    def _layer(self, x, temb, context, num_frames, channels, has_attn, name,
               refresh=None, frames_valid=None):
        """One (resnet -> spatial -> cross -> motion) unit."""
        cfg = self.config
        r = refresh or {}
        x = ResnetBlock2D(channels, policy=self.policy, name=f"{name}_resnet")(x, temb)
        if has_attn:
            x = SpatialTransformer(
                heads=cfg.attention_heads,
                head_dim=channels // cfg.attention_heads,
                context_dim=cfg.cross_attention_dim,
                depth=cfg.transformer_depth,
                policy=self.policy,
                attn_impl=self.attn_impl,
                pab=self.pab,
                name=f"{name}_attn",
            )(x, context, refresh_self=r.get("spatial"),
              refresh_cross=r.get("cross"))
        x = TemporalTransformer3D(
            heads=cfg.motion_heads,
            max_seq_length=cfg.motion_max_seq,
            policy=self.policy,
            temporal_impl=self.temporal_impl,
            pab=self.pab,
            name=f"{name}_motion",
        )(x, num_frames, refresh=r.get("temporal"), frames_valid=frames_valid)
        return x

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # [B, F, H, W, C_in]
        timestep: jnp.ndarray,  # scalar or [B]
        context: jnp.ndarray,  # [B, S_text, cross_attention_dim]
        *,
        num_frames: Optional[int] = None,
        pab_refresh: Optional[dict] = None,  # {'spatial','cross','temporal'}: bool
        frames_valid: Optional[int] = None,  # GLOBAL real frame count under
        # ragged frame sharding (the frame axis was zero-padded to divide
        # the mesh axis; padded slots are masked out of every cross-frame
        # op — see nn/temporal.py). None = every frame is real.
    ) -> jnp.ndarray:
        cfg = self.config
        B, F, H, W, Cin = sample.shape
        num_frames = num_frames or F

        x = sample.reshape(B * F, H, W, Cin).astype(self.policy.compute_dtype)
        context = jnp.repeat(context, F, axis=0).astype(self.policy.compute_dtype)

        # Timestep embedding (fp32 sinusoid -> MLP), broadcast over frames.
        t = jnp.broadcast_to(jnp.atleast_1d(timestep), (B,))
        t_emb = get_timestep_embedding(t, cfg.block_out_channels[0])
        temb = TimestepEmbedding(
            cfg.block_out_channels[0] * 4, policy=self.policy, name="time_embedding"
        )(t_emb)
        temb = jnp.repeat(temb, F, axis=0)  # [B*F, 1280]

        x = nn.Conv(
            cfg.block_out_channels[0],
            (3, 3),
            padding=[(1, 1), (1, 1)],
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
            name="conv_in",
        )(x)

        # ---------------- down ----------------
        residuals = [x]
        n_blocks = len(cfg.block_out_channels)
        for bi, channels in enumerate(cfg.block_out_channels):
            has_attn = cfg.down_block_has_attn[bi]
            for li in range(cfg.layers_per_block):
                x = self._layer(
                    x, temb, context, num_frames, channels, has_attn,
                    name=f"down_{bi}_{li}", refresh=pab_refresh,
                    frames_valid=frames_valid,
                )
                residuals.append(x)
            if bi < n_blocks - 1:
                x = Downsample2D(channels, policy=self.policy, name=f"down_{bi}_downsample")(x)
                residuals.append(x)

        # ---------------- mid ----------------
        mid_ch = cfg.block_out_channels[-1]
        x = ResnetBlock2D(mid_ch, policy=self.policy, name="mid_resnet_0")(x, temb)
        _r = pab_refresh or {}
        x = SpatialTransformer(
            heads=cfg.attention_heads,
            head_dim=mid_ch // cfg.attention_heads,
            context_dim=cfg.cross_attention_dim,
            depth=cfg.transformer_depth,
            policy=self.policy,
            attn_impl=self.attn_impl,
            pab=self.pab,
            name="mid_attn",
        )(x, context, refresh_self=_r.get("spatial"), refresh_cross=_r.get("cross"))
        x = TemporalTransformer3D(
            heads=cfg.motion_heads,
            max_seq_length=cfg.motion_max_seq,
            policy=self.policy,
            temporal_impl=self.temporal_impl,
            pab=self.pab,
            name="mid_motion",
        )(x, num_frames, refresh=_r.get("temporal"), frames_valid=frames_valid)
        x = ResnetBlock2D(mid_ch, policy=self.policy, name="mid_resnet_1")(x, temb)

        # ---------------- up ----------------
        rev_channels = tuple(reversed(cfg.block_out_channels))
        for bi, channels in enumerate(rev_channels):
            has_attn = cfg.up_block_has_attn[bi]
            for li in range(cfg.layers_per_block + 1):
                skip = residuals.pop()
                if self.freeu is not None:
                    x, skip = apply_freeu(bi, x, skip, self.freeu)
                x = jnp.concatenate([x, skip], axis=-1)
                x = self._layer(
                    x, temb, context, num_frames, channels, has_attn,
                    name=f"up_{bi}_{li}", refresh=pab_refresh,
                    frames_valid=frames_valid,
                )
            if bi < n_blocks - 1:
                x = Upsample2D(channels, policy=self.policy, name=f"up_{bi}_upsample")(x)

        # ---------------- out ----------------
        x = GroupNormModule(32, 1e-5, self.policy, with_silu=True, name="conv_norm_out")(x)
        x = nn.Conv(
            cfg.out_channels,
            (3, 3),
            padding=[(1, 1), (1, 1)],
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
            name="conv_out",
        )(x)
        x = self.policy.cast_to_output(x)
        return x.reshape(B, F, H, W, cfg.out_channels)
