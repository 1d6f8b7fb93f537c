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
