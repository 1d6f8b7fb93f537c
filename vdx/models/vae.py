"""AutoencoderKL — the SD-1.5 VAE, TPU-native (channels-last, frame-tiled).

Replaces the reference's ``vae.decode`` + ``enable_vae_slicing`` path
(reference experiments/01_baseline_generation.py:85,
05_grid_search_ablation.py:143): on TPU, "slicing" becomes folding frames
into the batch axis and (optionally) chunking decode via ``jax.lax.map`` so
peak activation memory stays flat with clip length — the XLA-native
equivalent of eager per-frame slicing (SURVEY.md §2b).

SD-1.5 VAE facts: block channels (128, 256, 512, 512), 2 layers/block
encoder, 3 layers/block decoder, GN(32, eps 1e-6), single-head mid
attention, latent scaling factor 0.18215, 8x spatial down/up
(latent shape verified by the reference trace, 03:79-98).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vdx.core.dtypes import DEFAULT_POLICY, Policy
from vdx.nn.resnet import GroupNormModule, ResnetBlock2D, Upsample2D
from vdx.ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    scaling_factor: float = 0.18215

    @classmethod
    def sd15(cls) -> "VAEConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "VAEConfig":
        return cls(block_out_channels=(32, 32, 64, 64), layers_per_block=1)

    @property
    def downscale(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)


class VAEAttention(nn.Module):
    """Single-head self-attention over flattened space (VAE mid block)."""

    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        residual = x
        h = GroupNormModule(32, 1e-6, self.policy, name="group_norm")(x)
        h = h.reshape(B, H * W, C)
        dense = lambda name: nn.Dense(  # noqa: E731
            C,
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
            name=name,
        )
        q = dense("to_q")(h)[:, :, None, :]  # single head: [B, S, 1, C]
        k = dense("to_k")(h)[:, :, None, :]
        v = dense("to_v")(h)[:, :, None, :]
        o = dot_product_attention(q, k, v, scale=C**-0.5)[:, :, 0, :]
        o = dense("to_out")(o)
        return o.reshape(B, H, W, C) + residual


class _Mid(nn.Module):
    policy: Policy

    @nn.compact
    def __call__(self, x):
        ch = x.shape[-1]
        x = ResnetBlock2D(ch, use_time_emb=False, eps=1e-6, policy=self.policy, name="resnet_0")(x)
        x = VAEAttention(policy=self.policy, name="attn")(x)
        x = ResnetBlock2D(ch, use_time_emb=False, eps=1e-6, policy=self.policy, name="resnet_1")(x)
        return x


class Encoder(nn.Module):
    config: VAEConfig
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        x = x.astype(self.policy.compute_dtype)
        x = nn.Conv(
            cfg.block_out_channels[0], (3, 3), padding=[(1, 1), (1, 1)],
            dtype=self.policy.compute_dtype, param_dtype=self.policy.param_dtype,
            name="conv_in",
        )(x)
        n = len(cfg.block_out_channels)
        for bi, ch in enumerate(cfg.block_out_channels):
            for li in range(cfg.layers_per_block):
                x = ResnetBlock2D(
                    ch, use_time_emb=False, eps=1e-6, policy=self.policy,
                    name=f"down_{bi}_{li}",
                )(x)
            if bi < n - 1:
                # VAE downsample: asymmetric (0,1) pad + stride-2 VALID conv
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                x = nn.Conv(
                    ch, (3, 3), strides=(2, 2), padding="VALID",
                    dtype=self.policy.compute_dtype, param_dtype=self.policy.param_dtype,
                    name=f"down_{bi}_downsample",
                )(x)
        x = _Mid(self.policy, name="mid")(x)
        x = GroupNormModule(32, 1e-6, self.policy, with_silu=True, name="conv_norm_out")(x)
        x = nn.Conv(
            2 * cfg.latent_channels, (3, 3), padding=[(1, 1), (1, 1)],
            dtype=self.policy.compute_dtype, param_dtype=self.policy.param_dtype,
            name="conv_out",
        )(x)
        # quant conv mixes mean/logvar channels
        x = nn.Conv(
            2 * cfg.latent_channels, (1, 1),
            dtype=self.policy.compute_dtype, param_dtype=self.policy.param_dtype,
            name="quant_conv",
        )(x)
        return x  # [..., 2*latent]: mean ++ logvar


class Decoder(nn.Module):
    config: VAEConfig
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        z = z.astype(self.policy.compute_dtype)
        z = nn.Conv(
            cfg.latent_channels, (1, 1),
            dtype=self.policy.compute_dtype, param_dtype=self.policy.param_dtype,
            name="post_quant_conv",
        )(z)
        x = nn.Conv(
            cfg.block_out_channels[-1], (3, 3), padding=[(1, 1), (1, 1)],
            dtype=self.policy.compute_dtype, param_dtype=self.policy.param_dtype,
            name="conv_in",
        )(z)
        x = _Mid(self.policy, name="mid")(x)
        rev = tuple(reversed(cfg.block_out_channels))
        n = len(rev)
        for bi, ch in enumerate(rev):
            for li in range(cfg.layers_per_block + 1):
                x = ResnetBlock2D(
                    ch, use_time_emb=False, eps=1e-6, policy=self.policy,
                    name=f"up_{bi}_{li}",
                )(x)
            if bi < n - 1:
                x = Upsample2D(ch, policy=self.policy, name=f"up_{bi}_upsample")(x)
        x = GroupNormModule(32, 1e-6, self.policy, with_silu=True, name="conv_norm_out")(x)
        x = nn.Conv(
            cfg.in_channels, (3, 3), padding=[(1, 1), (1, 1)],
            dtype=self.policy.compute_dtype, param_dtype=self.policy.param_dtype,
            name="conv_out",
        )(x)
        return self.policy.cast_to_output(x)  # [-1, 1] image range


class AutoencoderKL(nn.Module):
    """Bundled encoder/decoder with method-selectable apply."""

    config: VAEConfig = VAEConfig()
    policy: Policy = DEFAULT_POLICY

    def setup(self):
        self.encoder = Encoder(self.config, self.policy)
        self.decoder = Decoder(self.config, self.policy)

    def encode_moments(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.encoder(x)

    def encode(self, x: jnp.ndarray, rng=None) -> jnp.ndarray:
        """Encode to a latent sample (mean if rng is None), pre-scaled."""
        moments = self.encoder(x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        if rng is not None:
            logvar = jnp.clip(logvar, -30.0, 20.0)
            std = jnp.exp(0.5 * logvar.astype(jnp.float32))
            mean = mean + std * jax.random.normal(rng, mean.shape, dtype=std.dtype)
        return mean * self.config.scaling_factor

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        """Decode pre-scaled latents [B, h, w, 4] to images [B, H, W, 3] in [-1, 1]."""
        return self.decoder(z / self.config.scaling_factor)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.decode(self.encode(x))


class TemporalDecoder(nn.Module):
    """SVD-style video decoder: spatial decode + temporal output conv.

    Stable Video Diffusion decodes with temporal mixing so frame-wise VAE
    noise doesn't flicker (BASELINE.json configs[2] "temporal VAE decode").
    This implements the output-stage temporal conv (3x1x1 over frames) on
    top of the spatial decoder; interior temporal resblocks can be layered
    in without changing the interface.
    """

    config: VAEConfig = VAEConfig()
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, z: jnp.ndarray, num_frames: int) -> jnp.ndarray:
        """[B*F, h, w, 4] pre-scaled latents -> [B*F, H, W, 3] in [-1, 1]."""
        x = Decoder(self.config, self.policy, name="decoder")(
            z / self.config.scaling_factor
        )
        BF, H, W, C = x.shape
        B = BF // num_frames
        h = x.reshape(B, num_frames, H, W, C)
        h = nn.Conv(
            C, (3, 1, 1), padding=[(1, 1), (0, 0), (0, 0)],
            dtype=self.policy.compute_dtype, param_dtype=self.policy.param_dtype,
            kernel_init=nn.initializers.zeros, name="time_conv_out",
        )(h.astype(self.policy.compute_dtype))
        x = x + self.policy.cast_to_output(h.reshape(BF, H, W, C))
        return x


def decode_frames_tiled(vae: AutoencoderKL, params, latents: jnp.ndarray, chunk: int = 4):
    """Decode [F, h, w, 4] latents in frame chunks of ``chunk`` via lax.map.

    The XLA-native replacement for ``enable_vae_slicing``: peak decoder
    activation memory is O(chunk), independent of clip length.
    """
    F = latents.shape[0]
    pad = (-F) % chunk
    z = jnp.pad(latents, ((0, pad), (0, 0), (0, 0), (0, 0)))
    z = z.reshape(-1, chunk, *latents.shape[1:])
    out = jax.lax.map(lambda c: vae.apply(params, c, method=vae.decode), z)
    out = out.reshape(-1, *out.shape[2:])[:F]
    return out
