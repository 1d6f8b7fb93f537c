"""Timestep and positional embeddings.

* :func:`get_timestep_embedding` — the SD UNet sinusoidal timestep embedding
  (cos-first / ``flip_sin_to_cos=True``, ``downscale_freq_shift=0``).
* :class:`TimestepEmbedding` — the 2-layer SiLU MLP lifting 320 -> 1280.
* :func:`sinusoidal_positional_encoding` — classic interleaved sin/cos PE the
  motion modules add over the frame axis (reference
  docs/02_video_diffusion_architecture.md:60-82: "SinusoidalPositionalEmbedding
  — temporal position", max 32 frames).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp

from vdx.core.dtypes import DEFAULT_POLICY, Policy


def get_timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    *,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """Sinusoidal embedding of (possibly fractional) timesteps. [B] -> [B, dim]."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half:], emb[:, :half]], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def sinusoidal_positional_encoding(seq_len: int, dim: int) -> jnp.ndarray:
    """Interleaved transformer PE: pe[p, 2i]=sin, pe[p, 2i+1]=cos. [S, dim] fp32."""
    position = jnp.arange(seq_len, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(
        jnp.arange(0, dim, 2, dtype=jnp.float32) * (-math.log(10000.0) / dim)
    )
    pe = jnp.zeros((seq_len, dim), dtype=jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(position * div_term))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div_term))
    return pe


def rope_3d(
    frames: int,
    height: int,
    width: int,
    head_dim: int,
    theta: float = 10000.0,
    text_len: int = 0,
):
    """3D rotary embedding over a (F, H, W) token grid — CogVideoX-style.

    head_dim splits into (t, h, w) sub-bands: t gets head_dim//4, h and w get
    3*head_dim//8 each (the CogVideoX 1.5 partition). Returns (cos, sin) of
    shape [text_len + F*H*W, head_dim//2]; the leading ``text_len`` rows are
    identity (cos=1, sin=0) so the same tables apply across a joint
    [text ++ video] sequence without masking.
    """
    dim_t = head_dim // 4
    dim_h = head_dim * 3 // 8
    dim_w = head_dim - dim_t - dim_h

    def axis_angles(n, d):
        inv = 1.0 / theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d)
        return jnp.arange(n, dtype=jnp.float32)[:, None] * inv[None, :]  # [n, d/2]

    at = axis_angles(frames, dim_t)
    ah = axis_angles(height, dim_h)
    aw = axis_angles(width, dim_w)
    # broadcast each axis' angles over the full grid, concat along sub-bands
    grid = jnp.concatenate(
        [
            jnp.broadcast_to(at[:, None, None, :], (frames, height, width, dim_t // 2)),
            jnp.broadcast_to(ah[None, :, None, :], (frames, height, width, dim_h // 2)),
            jnp.broadcast_to(aw[None, None, :, :], (frames, height, width, dim_w // 2)),
        ],
        axis=-1,
    ).reshape(frames * height * width, head_dim // 2)
    if text_len:
        grid = jnp.concatenate(
            [jnp.zeros((text_len, head_dim // 2), jnp.float32), grid], axis=0
        )
    return jnp.cos(grid), jnp.sin(grid)


class TimestepEmbedding(nn.Module):
    """linear -> SiLU -> linear (320 -> 1280 in SD-1.5)."""

    embed_dim: int
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, t_emb: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(
            self.embed_dim,
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
            name="linear_1",
        )(t_emb.astype(self.policy.compute_dtype))
        h = nn.silu(h.astype(jnp.float32)).astype(self.policy.compute_dtype)
        h = nn.Dense(
            self.embed_dim,
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
            name="linear_2",
        )(h)
        return h
