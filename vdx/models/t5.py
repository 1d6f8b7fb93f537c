"""T5 encoder stack — CogVideoX's text conditioning tower.

CogVideoX conditions on T5 (v1.1) encoder states (BASELINE.json configs[3]).
Faithful T5 encoder semantics: RMSNorm (no bias, pre-norm), relative
position bias buckets shared across layers (computed in layer 0, added to
every layer's attention logits), gated-GELU feed-forward, no biases in any
linear layer, final RMSNorm.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from vdx.core.dtypes import DEFAULT_POLICY, Policy


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128

    @classmethod
    def xxl(cls) -> "T5Config":
        return cls()

    @classmethod
    def tiny(cls) -> "T5Config":
        return cls(vocab_size=512, d_model=64, d_kv=16, d_ff=128,
                   num_layers=2, num_heads=4)


class RMSNorm(nn.Module):
    eps: float = 1e-6
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],),
                           self.policy.param_dtype)
        x32 = x.astype(jnp.float32)
        var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
        return (x32 * jnp.sqrt(1.0 / (var + self.eps)) * scale).astype(x.dtype)


def relative_position_buckets(qlen: int, klen: int, num_buckets: int,
                              max_distance: int) -> np.ndarray:
    """T5's bidirectional relative position bucketing (static, host-side)."""
    ctx = np.arange(qlen)[:, None]
    mem = np.arange(klen)[None, :]
    rel = mem - ctx
    nb = num_buckets // 2
    ret = (rel > 0).astype(np.int64) * nb
    n = np.abs(rel)
    max_exact = nb // 2
    is_small = n < max_exact
    large = max_exact + (
        np.log(np.maximum(n, 1) / max_exact)
        / np.log(max_distance / max_exact)
        * (nb - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, nb - 1)
    return ret + np.where(is_small, n, large)


class T5Attention(nn.Module):
    config: T5Config
    policy: Policy = DEFAULT_POLICY
    has_bias_table: bool = False

    @nn.compact
    def __call__(self, x, position_bias=None):
        cfg = self.config
        inner = cfg.num_heads * cfg.d_kv
        dense = lambda f, name: nn.Dense(  # noqa: E731
            f, use_bias=False, dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype, name=name)
        B, S, _ = x.shape
        q = dense(inner, "q")(x).reshape(B, S, cfg.num_heads, cfg.d_kv)
        k = dense(inner, "k")(x).reshape(B, S, cfg.num_heads, cfg.d_kv)
        v = dense(inner, "v")(x).reshape(B, S, cfg.num_heads, cfg.d_kv)

        if self.has_bias_table:
            table = self.param(
                "relative_attention_bias", nn.initializers.normal(1.0),
                (cfg.relative_attention_num_buckets, cfg.num_heads),
                self.policy.param_dtype,
            )
            buckets = relative_position_buckets(
                S, S, cfg.relative_attention_num_buckets,
                cfg.relative_attention_max_distance,
            )
            position_bias = table[jnp.asarray(buckets)]  # [S, S, H]
            position_bias = position_bias.transpose(2, 0, 1)[None]  # [1, H, S, S]

        # T5 uses UNSCALED dot product (scale folded into init) + bias.
        qt = jnp.swapaxes(q, 1, 2)
        kt = jnp.swapaxes(k, 1, 2)
        vt = jnp.swapaxes(v, 1, 2)
        scores = jnp.einsum("bhqd,bhkd->bhqk", qt, kt,
                            preferred_element_type=jnp.float32)
        if position_bias is not None:
            scores = scores + position_bias.astype(scores.dtype)
        probs = nn.softmax(scores.astype(jnp.float32), axis=-1).astype(vt.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, vt,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = jnp.swapaxes(out, 1, 2).reshape(B, S, inner)
        return dense(cfg.d_model, "o")(out), position_bias


class T5Block(nn.Module):
    config: T5Config
    policy: Policy = DEFAULT_POLICY
    first: bool = False

    @nn.compact
    def __call__(self, x, position_bias=None):
        cfg = self.config
        h = RMSNorm(policy=self.policy, name="norm1")(x)
        a, position_bias = T5Attention(
            cfg, self.policy, has_bias_table=self.first, name="attn"
        )(h, position_bias)
        x = x + a
        h = RMSNorm(policy=self.policy, name="norm2")(x)
        dense = lambda f, name: nn.Dense(  # noqa: E731
            f, use_bias=False, dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype, name=name)
        wi0 = dense(cfg.d_ff, "wi_0")(h)
        wi1 = dense(cfg.d_ff, "wi_1")(h)
        gelu = nn.gelu(wi0.astype(jnp.float32), approximate=True).astype(wi0.dtype)
        x = x + dense(cfg.d_model, "wo")(gelu * wi1)
        return x, position_bias


class T5Encoder(nn.Module):
    config: T5Config = T5Config()
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        x = nn.Embed(cfg.vocab_size, cfg.d_model,
                     param_dtype=self.policy.param_dtype, name="token_embedding")(
            input_ids).astype(self.policy.compute_dtype)
        bias = None
        for i in range(cfg.num_layers):
            x, bias = T5Block(cfg, self.policy, first=(i == 0),
                              name=f"layers_{i}")(x, bias)
        x = RMSNorm(policy=self.policy, name="final_norm")(x)
        return self.policy.cast_to_output(x)
