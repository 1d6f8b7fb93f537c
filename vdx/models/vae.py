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


class _DecoderSTResBlock(nn.Module):
    """Spatio-temporal resblock for the SVD temporal decoder.

    Spatial ResnetBlock2D (eps 1e-6, no time emb) -> temporal 3x1x1 resblock
    (eps 1e-5) -> learned sigmoid blend with the spatial-to-temporal switch
    (the decoder passes switch_spatial_to_temporal_mix=True in diffusers'
    AutoencoderKLTemporalDecoder; capability target BASELINE.json configs[2]).
    """

    out_channels: int
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x: jnp.ndarray, num_frames: int) -> jnp.ndarray:
        s = ResnetBlock2D(
            self.out_channels, use_time_emb=False, eps=1e-6, policy=self.policy,
            name="spatial",
        )(x)
        BF, H, W, C = s.shape
        B = BF // num_frames
        groups = 32 if C % 32 == 0 else min(C, 8)
        h = s.reshape(B, num_frames, H, W, C)
        t = GroupNormModule(groups, 1e-5, self.policy, with_silu=True, name="tnorm1")(h)
        t = nn.Conv(
            C, (3, 1, 1), padding=[(1, 1), (0, 0), (0, 0)],
            dtype=self.policy.compute_dtype, param_dtype=self.policy.param_dtype,
            name="tconv1",
        )(t)
        t = GroupNormModule(groups, 1e-5, self.policy, with_silu=True, name="tnorm2")(t)
        t = nn.Conv(
            C, (3, 1, 1), padding=[(1, 1), (0, 0), (0, 0)],
            dtype=self.policy.compute_dtype, param_dtype=self.policy.param_dtype,
            name="tconv2",
        )(t)
        t = (h + t).reshape(BF, H, W, C)
        # learned blend, switched: alpha weights the TEMPORAL branch here
        mix = self.param("mix_factor", nn.initializers.zeros, (1,), jnp.float32)
        alpha = nn.sigmoid(mix)[0]
        out = (
            (1.0 - alpha) * s.astype(jnp.float32) + alpha * t.astype(jnp.float32)
        )
        return out.astype(s.dtype)


class TemporalDecoder(nn.Module):
    """SVD video decoder — spatio-temporal resblocks throughout.

    Stable Video Diffusion decodes with temporal mixing so frame-wise VAE
    noise doesn't flicker (BASELINE.json configs[2] "temporal VAE decode").
    Structure mirrors diffusers' TemporalDecoder: conv_in -> mid
    (ST-resnet, single-head attention, ST-resnet) -> up blocks of
    (layers_per_block + 1) ST-resnets with upsamplers -> GN-SiLU ->
    conv_out -> temporal 3x1x1 output conv over frames.
    """

    config: VAEConfig = VAEConfig()
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, z: jnp.ndarray, num_frames: int) -> jnp.ndarray:
        """[B*F, h, w, 4] pre-scaled latents -> [B*F, H, W, 3] in [-1, 1]."""
        cfg = self.config
        z = (z / cfg.scaling_factor).astype(self.policy.compute_dtype)
        x = nn.Conv(
            cfg.block_out_channels[-1], (3, 3), padding=[(1, 1), (1, 1)],
            dtype=self.policy.compute_dtype, param_dtype=self.policy.param_dtype,
            name="conv_in",
        )(z)

        ch = cfg.block_out_channels[-1]
        x = _DecoderSTResBlock(ch, policy=self.policy, name="mid_resnet_0")(
            x, num_frames
        )
        x = VAEAttention(policy=self.policy, name="mid_attn")(x)
        x = _DecoderSTResBlock(ch, policy=self.policy, name="mid_resnet_1")(
            x, num_frames
        )

        rev = tuple(reversed(cfg.block_out_channels))
        n = len(rev)
        for bi, ch in enumerate(rev):
            for li in range(cfg.layers_per_block + 1):
                x = _DecoderSTResBlock(
                    ch, policy=self.policy, name=f"up_{bi}_{li}"
                )(x, num_frames)
            if bi < n - 1:
                x = Upsample2D(ch, policy=self.policy, name=f"up_{bi}_upsample")(x)

        x = GroupNormModule(32, 1e-6, self.policy, with_silu=True,
                            name="conv_norm_out")(x)
        x = nn.Conv(
            cfg.in_channels, (3, 3), padding=[(1, 1), (1, 1)],
            dtype=self.policy.compute_dtype, param_dtype=self.policy.param_dtype,
            name="conv_out",
        )(x)
        BF, H, W, C = x.shape
        B = BF // num_frames
        h = x.reshape(B, num_frames, H, W, C)
        h = nn.Conv(
            C, (3, 1, 1), padding=[(1, 1), (0, 0), (0, 0)],
            dtype=self.policy.compute_dtype, param_dtype=self.policy.param_dtype,
            name="time_conv_out",
        )(h)
        return self.policy.cast_to_output(h.reshape(BF, H, W, C))


def decode_spatial_tiled(
    decode_fn,
    latents: jnp.ndarray,  # [B, h, w, 4] pre-scaled latents
    upscale: int,
    tile: int = 64,
    overlap: int = 8,
) -> jnp.ndarray:
    """Spatially-tiled decode with linear overlap blending — inside XLA.

    The reference handles decoder memory with eager ``enable_vae_slicing``
    (01:85); at the SVD north-star 576x1024 (and beyond) the DECODER
    activations dominate, so we tile the latent plane into overlapping
    ``tile`` x ``tile`` windows, decode each through ``decode_fn`` (one
    lax.map -> peak memory is ONE tile), and blend the overlaps with
    linear ramps (the diffusers enable_vae_tiling recipe, reshaped for XLA:
    static window grid, gather + weighted scatter-add).

    ``decode_fn`` may CHANGE the leading dim (e.g. the CogVideoX causal
    decoder folds [B*f_lat, t, t, C] -> [B*F_out, T, T, 3]); the output
    canvas takes its leading dim from the decoded tiles.
    """
    B, h, w, C = latents.shape
    tile = min(tile, h, w)
    overlap = min(overlap, tile - 1)  # tile spanning the plane: one window
    stride = tile - overlap
    assert stride > 0

    def starts(total):
        s = list(range(0, max(total - tile, 0) + 1, stride))
        if s[-1] + tile < total:
            s.append(total - tile)
        return s

    ys, xs = starts(h), starts(w)
    grid = [(y, x) for y in ys for x in xs]
    idx = jnp.asarray(grid, jnp.int32)  # [N, 2]

    def one(start):
        z = jax.lax.dynamic_slice(
            latents, (0, start[0], start[1], 0), (B, tile, tile, C)
        )
        return decode_fn(z)  # [B, tile*u, tile*u, 3]

    tiles = jax.lax.map(one, idx)  # [N, B_out, T, T, 3]
    B_out = tiles.shape[1]

    u = upscale
    T = tile * u
    ramp = jnp.minimum(
        jnp.arange(T, dtype=jnp.float32) / max(overlap * u - 1, 1), 1.0)
    ramp = jnp.minimum(ramp, ramp[::-1])  # ramp up/down at both edges

    # weight = ramp_y * ramp_x, with the side touching a global border held 1
    def axis_weights(start_col, total):
        wgt = jnp.broadcast_to(ramp, (idx.shape[0], T))
        at_lo = (start_col == 0)[:, None]
        at_hi = (start_col == (total - tile))[:, None]
        lo_half = jnp.concatenate(
            [jnp.ones(T // 2, jnp.float32), ramp[T // 2:]])
        hi_half = jnp.concatenate(
            [ramp[: T // 2], jnp.ones(T - T // 2, jnp.float32)])
        wgt = jnp.where(at_lo, lo_half[None], wgt)
        wgt = jnp.where(at_hi, jnp.where(at_lo, jnp.ones(T)[None], hi_half[None]), wgt)
        return wgt

    wy = axis_weights(idx[:, 0], h)  # [N, T]
    wx = axis_weights(idx[:, 1], w)
    weight = wy[:, None, :, None, None] * wx[:, None, None, :, None]  # [N,1,T,T,1]

    out = jnp.zeros((B_out, h * u, w * u, 3), jnp.float32)
    den = jnp.zeros((B_out, h * u, w * u, 1), jnp.float32)

    def accum(carry, i):
        out, den = carry
        y, x = idx[i, 0] * u, idx[i, 1] * u
        patch = tiles[i].astype(jnp.float32) * weight[i]
        out = jax.lax.dynamic_update_slice(
            out, jax.lax.dynamic_slice(out, (0, y, x, 0), (B_out, T, T, 3)) + patch,
            (0, y, x, 0))
        den = jax.lax.dynamic_update_slice(
            den, jax.lax.dynamic_slice(den, (0, y, x, 0), (B_out, T, T, 1)) + weight[i],
            (0, y, x, 0))
        return (out, den), None

    (out, den), _ = jax.lax.scan(accum, (out, den), jnp.arange(len(grid)))
    return (out / jnp.maximum(den, 1e-8)).astype(tiles.dtype)


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
