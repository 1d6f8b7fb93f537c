"""UNetSpatioTemporal — Stable Video Diffusion's img2vid denoiser.

Covers the "Stable Video Diffusion img2vid" target config
(BASELINE.json configs[2]). Distinctives vs UNetMotion:

  * every resnet is a PAIR: spatial ResBlock then temporal ResBlock
    (3x1x1 conv over frames), blended by a learned sigmoid mix factor
    ("AlphaBlender")
  * every transformer is a PAIR: spatial blocks then temporal blocks over
    the frame axis, alpha-blended likewise
  * cross-attention context is the CLIP image embedding [B, 1, 1024]
  * conditioning adds micro-conditions (fps, motion_bucket_id,
    noise_aug_strength) as sinusoidally-embedded "added time ids" summed
    into the time embedding
  * input latents are channel-concat(noisy latents, conditioning frame
    latents) -> in_channels 8

Channels-last video layout [B, F, H, W, C]; frame axis remains the only
cross-device axis under frame sharding (temporal resblocks + temporal
attention are the communicating ops).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vdx.core.dtypes import DEFAULT_POLICY, Policy
from vdx.nn.embeddings import TimestepEmbedding, get_timestep_embedding
from vdx.nn.freeu import FreeUConfig, apply_freeu
from vdx.nn.resnet import Downsample2D, GroupNormModule, ResnetBlock2D, Upsample2D
from vdx.nn.temporal import TemporalBlock, _shard_axis, frame_validity_mask
from vdx.nn.transformer import BasicTransformerBlock
from vdx.ops.halo import frame_halo_pad


@dataclasses.dataclass(frozen=True)
class SVDUNetConfig:
    in_channels: int = 8  # 4 noisy + 4 conditioning latents
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 1024
    attention_head_dim: int = 64
    addition_time_embed_dim: int = 256
    num_added_time_ids: int = 3  # fps, motion_bucket_id, noise_aug
    down_block_has_attn: Tuple[bool, ...] = (True, True, True, False)

    @classmethod
    def svd(cls) -> "SVDUNetConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "SVDUNetConfig":
        return cls(
            block_out_channels=(32, 64, 64, 64), layers_per_block=1,
            cross_attention_dim=64, attention_head_dim=16,
            addition_time_embed_dim=32,
        )

    @property
    def up_block_has_attn(self) -> Tuple[bool, ...]:
        return tuple(reversed(self.down_block_has_attn))


class AlphaBlender(nn.Module):
    """Learned sigmoid blend of the spatial and temporal branches."""

    @nn.compact
    def __call__(self, spatial, temporal):
        mix = self.param("mix_factor", nn.initializers.constant(0.5), (1,), jnp.float32)
        alpha = nn.sigmoid(mix)[0]
        return (
            alpha * spatial.astype(jnp.float32)
            + (1.0 - alpha) * temporal.astype(jnp.float32)
        ).astype(spatial.dtype)


class SpatioTemporalResBlock(nn.Module):
    out_channels: int
    policy: Policy = DEFAULT_POLICY
    # "local" or "ring:<axis>" — under frame sharding the 3x1x1 temporal
    # convs halo-exchange edge frames over ICI (ops/halo.py) and the GN
    # statistics pmean across the frame shards; results are exact vs local.
    temporal_impl: str = "local"

    def _tconv(self, t, axis, name, zero_init):
        # SAME zero padding over frames locally == halo-pad + VALID sharded
        if axis is None:
            pad_f = (1, 1)
        else:
            t = frame_halo_pad(t, axis, halo=1, frame_axis=1)
            pad_f = (0, 0)
        return nn.Conv(
            self.out_channels, (3, 1, 1), padding=[pad_f, (0, 0), (0, 0)],
            dtype=self.policy.compute_dtype, param_dtype=self.policy.param_dtype,
            kernel_init=nn.initializers.zeros if zero_init
            else nn.initializers.lecun_normal(),
            name=name,
        )(t)

    @nn.compact
    def __call__(self, x, temb, num_frames: int, frames_valid=None):
        # halo'd temporal convs + cross-shard GN stats apply in BOTH
        # frame-sharded modes (ring and ulysses) — only the temporal
        # transformer's attention math differs between them.
        axis = _shard_axis(self.temporal_impl)
        # Ragged sharding: padded frame slots are masked out of the GN
        # statistics, and zeroed before each size-3 frame conv so the
        # real/pad boundary reads zero — exactly the local conv's SAME
        # zero padding at the clip's true end.
        ragged = frames_valid is not None and frames_valid < num_frames * (
            1 if axis is None else jax.lax.axis_size(axis)
        )
        mask = (
            frame_validity_mask(num_frames, frames_valid, axis)
            if ragged else None
        )
        groups = 32 if self.out_channels % 32 == 0 else min(self.out_channels, 8)
        # spatial branch on [B*F, H, W, C]
        s = ResnetBlock2D(self.out_channels, policy=self.policy, name="spatial")(x, temb)
        # temporal branch: 3x1x1 resblock over frames (per-frame time emb)
        BF, H, W, C = s.shape
        B = BF // num_frames
        h = s.reshape(B, num_frames, H, W, C)
        t = GroupNormModule(
            groups, 1e-5, self.policy, with_silu=True, stats_axis=axis,
            name="tnorm1",
        )(h, frame_mask=mask)
        if ragged:
            t = t * mask.astype(t.dtype)[None, :, None, None, None]
        t = self._tconv(t, axis, "tconv1", zero_init=False)
        if temb is not None:
            te = nn.silu(temb.astype(jnp.float32)).astype(self.policy.compute_dtype)
            te = nn.Dense(
                self.out_channels, dtype=self.policy.compute_dtype,
                param_dtype=self.policy.param_dtype, name="ttime_emb_proj",
            )(te)  # temb is [B*F, D] -> per-frame bias
            t = t + te.reshape(B, num_frames, 1, 1, C)
        t = GroupNormModule(
            groups, 1e-5, self.policy, with_silu=True, stats_axis=axis,
            name="tnorm2",
        )(t, frame_mask=mask)
        if ragged:
            t = t * mask.astype(t.dtype)[None, :, None, None, None]
        t = self._tconv(t, axis, "tconv2", zero_init=True)
        t = (h + t).reshape(BF, H, W, C)
        return AlphaBlender(name="mix")(s, t)


class TransformerSpatioTemporal(nn.Module):
    heads: int
    head_dim: int
    context_dim: int
    policy: Policy = DEFAULT_POLICY
    attn_impl: str = "auto"
    temporal_impl: str = "local"
    pab: bool = False

    @nn.compact
    def __call__(self, x, context, num_frames: int, refresh=None,
                 frames_valid=None):
        r = refresh or {}
        BF, H, W, C = x.shape
        B = BF // num_frames
        residual = x
        h = GroupNormModule(32 if C % 32 == 0 else min(C, 8), 1e-6, self.policy,
                            name="norm")(x)
        h = nn.Dense(C, dtype=self.policy.compute_dtype,
                     param_dtype=self.policy.param_dtype, name="proj_in")(h)

        # spatial block over [B*F, H*W, C] with image-embedding cross-attn
        hs = h.reshape(BF, H * W, C)
        hs = BasicTransformerBlock(
            C, self.heads, self.head_dim, context_dim=self.context_dim,
            policy=self.policy, attn_impl=self.attn_impl, pab=self.pab,
            name="spatial_block",
        )(hs, context, refresh_self=r.get("spatial"),
          refresh_cross=r.get("cross"))

        # temporal block over [B*H*W, F, C]
        ht = hs.reshape(B, num_frames, H * W, C).transpose(0, 2, 1, 3)
        ht = ht.reshape(B * H * W, num_frames, C)
        ht = TemporalBlock(C, self.heads, self.head_dim, policy=self.policy,
                           temporal_impl=self.temporal_impl, pab=self.pab,
                           name="temporal_block")(ht, refresh=r.get("temporal"),
                                                  frames_valid=frames_valid)
        ht = ht.reshape(B, H * W, num_frames, C).transpose(0, 2, 1, 3)
        ht = ht.reshape(BF, H * W, C)

        h = AlphaBlender(name="mix")(hs, ht).reshape(BF, H, W, C)
        h = nn.Dense(C, dtype=self.policy.compute_dtype,
                     param_dtype=self.policy.param_dtype, name="proj_out")(h)
        return h + residual


class UNetSpatioTemporal(nn.Module):
    config: SVDUNetConfig = SVDUNetConfig()
    policy: Policy = DEFAULT_POLICY
    attn_impl: str = "auto"
    # "local" or "ring:<axis>" — frame-sharded execution (parallel/frame_parallel)
    temporal_impl: str = "local"
    # Pyramid Attention Broadcast (pipelines/base.py builds the schedule)
    pab: bool = False
    # FreeU backbone/skip re-weighting in the first two up stages
    # (nn/freeu.py); None = exact baseline program.
    freeu: Optional[FreeUConfig] = None

    def _layer(self, x, temb, context, num_frames, channels, has_attn, name,
               refresh=None, frames_valid=None):
        cfg = self.config
        x = SpatioTemporalResBlock(
            channels, policy=self.policy, temporal_impl=self.temporal_impl,
            name=f"{name}_res",
        )(x, temb, num_frames, frames_valid=frames_valid)
        if has_attn:
            heads = max(1, channels // cfg.attention_head_dim)
            x = TransformerSpatioTemporal(
                heads=heads, head_dim=channels // heads,
                context_dim=cfg.cross_attention_dim, policy=self.policy,
                attn_impl=self.attn_impl, temporal_impl=self.temporal_impl,
                pab=self.pab, name=f"{name}_attn",
            )(x, context, num_frames, refresh=refresh,
              frames_valid=frames_valid)
        return x

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # [B, F, H, W, 8]
        timestep: jnp.ndarray,  # scalar or [B] (continuous EDM t)
        image_embeds: jnp.ndarray,  # [B, 1, cross_dim]
        added_time_ids: jnp.ndarray,  # [B, 3]
        *,
        num_frames=None,
        pab_refresh=None,  # {'spatial','cross','temporal'}: bool
        frames_valid=None,  # GLOBAL real frame count under ragged frame
        # sharding (frame axis zero-padded to divide the mesh axis; padded
        # slots are masked out of every cross-frame op — nn/temporal.py).
    ) -> jnp.ndarray:
        cfg = self.config
        B, F, H, W, Cin = sample.shape
        num_frames = num_frames or F

        x = sample.reshape(B * F, H, W, Cin).astype(self.policy.compute_dtype)
        context = jnp.repeat(image_embeds, F, axis=0).astype(self.policy.compute_dtype)

        t = jnp.broadcast_to(jnp.atleast_1d(timestep), (B,))
        t_emb = get_timestep_embedding(t, cfg.block_out_channels[0])
        temb = TimestepEmbedding(
            cfg.block_out_channels[0] * 4, policy=self.policy, name="time_embedding"
        )(t_emb)
        # micro-conditioning: sinusoid each added id, flatten, project, add
        aids = added_time_ids.reshape(-1)  # [B*3]
        a_emb = get_timestep_embedding(aids, cfg.addition_time_embed_dim)
        a_emb = a_emb.reshape(B, cfg.num_added_time_ids * cfg.addition_time_embed_dim)
        temb = temb + TimestepEmbedding(
            cfg.block_out_channels[0] * 4, policy=self.policy, name="add_embedding"
        )(a_emb)
        temb = jnp.repeat(temb, F, axis=0)

        x = nn.Conv(
            cfg.block_out_channels[0], (3, 3), padding=[(1, 1), (1, 1)],
            dtype=self.policy.compute_dtype, param_dtype=self.policy.param_dtype,
            name="conv_in",
        )(x)

        residuals = [x]
        n = len(cfg.block_out_channels)
        for bi, ch in enumerate(cfg.block_out_channels):
            for li in range(cfg.layers_per_block):
                x = self._layer(x, temb, context, num_frames, ch,
                                cfg.down_block_has_attn[bi], f"down_{bi}_{li}",
                                refresh=pab_refresh, frames_valid=frames_valid)
                residuals.append(x)
            if bi < n - 1:
                x = Downsample2D(ch, policy=self.policy, name=f"down_{bi}_downsample")(x)
                residuals.append(x)

        mid_ch = cfg.block_out_channels[-1]
        x = self._layer(x, temb, context, num_frames, mid_ch, True, "mid_0",
                        refresh=pab_refresh, frames_valid=frames_valid)
        x = SpatioTemporalResBlock(
            mid_ch, policy=self.policy, temporal_impl=self.temporal_impl,
            name="mid_res_1",
        )(x, temb, num_frames, frames_valid=frames_valid)

        for bi, ch in enumerate(reversed(cfg.block_out_channels)):
            for li in range(cfg.layers_per_block + 1):
                skip = residuals.pop()
                if self.freeu is not None:
                    x, skip = apply_freeu(bi, x, skip, self.freeu)
                x = jnp.concatenate([x, skip], axis=-1)
                x = self._layer(x, temb, context, num_frames, ch,
                                cfg.up_block_has_attn[bi], f"up_{bi}_{li}",
                                refresh=pab_refresh, frames_valid=frames_valid)
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
