"""CLIP ViT-L/14 text tower (Flax) — the SD-1.5 prompt encoder.

Rebuilds the conditioning path the reference relies on through diffusers
(prompt + negative-prompt -> [B, 77, 768] embeddings; shape verified by the
reference trace at experiments/03_trace_forward_pass.py:94-98).

Architecture facts (openai/clip-vit-large-patch14 text model): vocab 49408,
hidden 768, 12 layers, 12 heads, MLP 3072 with quick-GELU, learned position
embeddings over 77 tokens, causal mask, final LayerNorm. SD-1.5 conditions on
the final-LN last_hidden_state.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from vdx.core.dtypes import DEFAULT_POLICY, Policy
from vdx.ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 77

    @classmethod
    def sd15(cls) -> "CLIPTextConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "CLIPTextConfig":
        # vocab must cover the CLIP id space (BOS/EOS at 49406/49407) even in
        # the tiny preset — out-of-range ids would gather NaN fill values.
        return cls(vocab_size=49408, hidden_size=64, num_layers=2, num_heads=4,
                   intermediate_size=128)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    return (x32 * nn.sigmoid(1.702 * x32)).astype(x.dtype)


class CLIPAttention(nn.Module):
    config: CLIPTextConfig
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        head_dim = cfg.hidden_size // cfg.num_heads
        dense = lambda name: nn.Dense(  # noqa: E731
            cfg.hidden_size,
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
            name=name,
        )
        B, S, _ = x.shape
        q = dense("q_proj")(x).reshape(B, S, cfg.num_heads, head_dim)
        k = dense("k_proj")(x).reshape(B, S, cfg.num_heads, head_dim)
        v = dense("v_proj")(x).reshape(B, S, cfg.num_heads, head_dim)
        out = dot_product_attention(
            q, k, v, scale=head_dim**-0.5, mask=mask, impl="xla"
        )
        return dense("out_proj")(out.reshape(B, S, cfg.hidden_size))


class CLIPLayer(nn.Module):
    config: CLIPTextConfig
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        ln = lambda name: nn.LayerNorm(  # noqa: E731
            epsilon=1e-5, dtype=jnp.float32, param_dtype=self.policy.param_dtype,
            name=name,
        )
        h = ln("layer_norm1")(x).astype(x.dtype)
        x = x + CLIPAttention(cfg, self.policy, name="self_attn")(h, mask)
        h = ln("layer_norm2")(x).astype(x.dtype)
        h = nn.Dense(
            cfg.intermediate_size, dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype, name="fc1",
        )(h)
        h = quick_gelu(h)
        h = nn.Dense(
            cfg.hidden_size, dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype, name="fc2",
        )(h)
        return x + h


class CLIPTextModel(nn.Module):
    config: CLIPTextConfig = CLIPTextConfig()
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        """[B, 77] int token ids -> [B, 77, hidden] final hidden states."""
        cfg = self.config
        B, S = input_ids.shape
        tok = nn.Embed(
            cfg.vocab_size, cfg.hidden_size,
            param_dtype=self.policy.param_dtype, name="token_embedding",
        )(input_ids)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (cfg.max_position_embeddings, cfg.hidden_size),
            self.policy.param_dtype,
        )
        x = (tok + pos[None, :S]).astype(self.policy.compute_dtype)

        causal = jnp.tril(jnp.ones((S, S), dtype=bool))[None, None]
        for i in range(cfg.num_layers):
            x = CLIPLayer(cfg, self.policy, name=f"layers_{i}")(x, causal)
        x = nn.LayerNorm(
            epsilon=1e-5, dtype=jnp.float32, param_dtype=self.policy.param_dtype,
            name="final_layer_norm",
        )(x)
        return self.policy.cast_to_output(x)
