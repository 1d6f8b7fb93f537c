"""Attention and feed-forward Flax modules (SD-1.5 conventions).

Attention: to_q/to_k/to_v without bias, to_out with bias, per-head scaling
1/sqrt(head_dim). Works as self-attention (context=None) or cross-attention
(context = CLIP text states [B, 77, 768]). All matmuls route through
ops.dot_product_attention so the Pallas flash kernel applies uniformly.

FeedForward: GEGLU — Linear(C -> 8C), split, x * gelu(gate), Linear(4C -> C).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from vdx.core.dtypes import DEFAULT_POLICY, Policy
from vdx.ops.attention import dot_product_attention


def apply_rope(x: jnp.ndarray, rope: tuple) -> jnp.ndarray:
    """Rotate q/k [B, S, H, D] by interleaved-pair RoPE (cos, sin) [S, D/2].

    Pairs (x[2i], x[2i+1]) rotate by the i-th angle — the convention
    CogVideoX's 3D rotary embedding uses (nn/embeddings.rope_3d).
    """
    cos, sin = rope
    orig = x.dtype
    xf = x.astype(jnp.float32)
    x0 = xf[..., 0::2]
    x1 = xf[..., 1::2]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    r0 = x0 * c - x1 * s
    r1 = x1 * c + x0 * s
    return jnp.stack([r0, r1], axis=-1).reshape(x.shape).astype(orig)


class Attention(nn.Module):
    query_dim: int
    heads: int = 8
    head_dim: int = 64
    context_dim: Optional[int] = None  # None => self-attention
    out_bias: bool = True
    qkv_bias: bool = False  # CogVideoX-style projections carry bias
    qk_norm: bool = False  # per-head LayerNorm on q/k (CogVideoX)
    policy: Policy = DEFAULT_POLICY
    attn_impl: str = "auto"
    # Pyramid-Attention-Broadcast participation (arXiv:2408.12588-style
    # training-free acceleration): when enabled, the module caches its
    # output in the mutable 'pab_cache' collection; ``refresh=False`` reuses
    # the cached output instead of recomputing — attention outputs drift
    # slowly across adjacent denoise steps, so broadcasting them for a few
    # steps trades negligible quality for skipped compute.
    pab: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        refresh=None,
        rope: Optional[tuple] = None,  # (cos, sin) [S, head_dim/2]
        kv_valid: Optional[jnp.ndarray] = None,  # ring ragged-shard key mask
    ) -> jnp.ndarray:
        inner = self.heads * self.head_dim
        ctx = x if context is None else context
        dense = lambda feats, name: nn.Dense(  # noqa: E731
            feats,
            use_bias=self.qkv_bias,
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
            name=name,
        )

        def compute() -> jnp.ndarray:
            if (ctx.shape[1] == 1 and not self.qk_norm and rope is None
                    and not self.attn_impl.startswith("ring")):
                # NOT under ring sharding: there the LOCAL shard can be one
                # frame while the GLOBAL sequence is longer — the fast path
                # would silently attend locally (caught by
                # tests/test_frame_parallel.py F_local=1 parity).
                # Single-KV attention (SVD's image-embed cross-attn context
                # is [B, 1, 1024]): softmax over one key is identically 1,
                # so the attention output equals v broadcast over queries —
                # to_q, the scores, and the softmax are mathematically dead.
                # EXACT, not an approximation. to_q/to_k still run on one
                # token so the param tree is unchanged for checkpoints and
                # conversion; XLA DCEs the unused results.
                _ = dense(inner, "to_q")(x[:, :1])
                _ = dense(inner, "to_k")(ctx)
                v1 = dense(inner, "to_v")(ctx)
                out1 = nn.Dense(
                    self.query_dim,
                    use_bias=self.out_bias,
                    dtype=self.policy.compute_dtype,
                    param_dtype=self.policy.param_dtype,
                    name="to_out",
                )(v1)
                return jnp.broadcast_to(out1, x.shape[:2] + (self.query_dim,))
            q = dense(inner, "to_q")(x)
            k = dense(inner, "to_k")(ctx)
            v = dense(inner, "to_v")(ctx)
            B, Sq = q.shape[0], q.shape[1]
            Skv = k.shape[1]
            q = q.reshape(B, Sq, self.heads, self.head_dim)
            k = k.reshape(B, Skv, self.heads, self.head_dim)
            v = v.reshape(B, Skv, self.heads, self.head_dim)
            if self.qk_norm:
                ln = lambda name: nn.LayerNorm(  # noqa: E731
                    epsilon=1e-6, dtype=jnp.float32,
                    param_dtype=self.policy.param_dtype, name=name,
                )
                q = ln("norm_q")(q).astype(v.dtype)
                k = ln("norm_k")(k).astype(v.dtype)
            if rope is not None:
                q = apply_rope(q, rope)
                k = apply_rope(k, rope)
            out = dot_product_attention(
                q, k, v, scale=self.head_dim**-0.5, impl=self.attn_impl,
                kv_valid=kv_valid,
            )
            return nn.Dense(
                self.query_dim,
                use_bias=self.out_bias,
                dtype=self.policy.compute_dtype,
                param_dtype=self.policy.param_dtype,
                name="to_out",
            )(out.reshape(B, Sq, inner))

        if not self.pab or refresh is None:
            return compute()

        out_shape = x.shape[:-1] + (self.query_dim,)
        cache = self.variable(
            "pab_cache", "out",
            lambda: jnp.zeros(out_shape, self.policy.compute_dtype),
        )
        if self.is_initializing():
            out = compute()
        else:
            import jax

            out = jax.lax.cond(refresh, compute, lambda: cache.value)
        cache.value = out
        return out


class GEGLU(nn.Module):
    dim_out: int
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(
            self.dim_out * 2,
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
            name="proj",
        )(x)
        h, gate = jnp.split(h, 2, axis=-1)
        # diffusers' GEGLU uses the EXACT (erf) gelu (F.gelu default) — the
        # tanh approximation drifts ~1e-3 at |x|~2, visible against real
        # checkpoints at fp32 (tests/test_block_parity.py). Under bf16
        # compute the product is rounded to bf16 (~4e-3 relative) anyway,
        # and exact erf measures +34 ms on the UNet forward (+8.4%,
        # PERF.md round 5) — so bf16 keeps the tanh form, a scoped
        # precision-policy exception like the bf16-probs softmax
        # (CLAUDE.md invariants).
        approx = h.dtype == jnp.bfloat16
        return h * nn.gelu(gate.astype(jnp.float32), approximate=approx).astype(
            h.dtype
        )


class FeedForward(nn.Module):
    dim: int
    mult: int = 4
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = GEGLU(self.dim * self.mult, policy=self.policy, name="net_0")(x)
        return nn.Dense(
            self.dim,
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
            name="net_2",
        )(h)


class _GELUProj(nn.Module):
    """diffusers GELU activation module: Linear 'proj' + tanh-approx gelu."""

    dim_out: int
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(
            self.dim_out,
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
            name="proj",
        )(x)
        return nn.gelu(h.astype(jnp.float32), approximate=True).astype(h.dtype)


class GELUFeedForward(nn.Module):
    """diffusers FeedForward(activation_fn="gelu-approximate") — the
    PixArt/ada_norm_single family's FF (Latte uses this, NOT GEGLU).
    Param paths mirror FeedForward (net_0/proj, net_2) so the conversion
    rules' key structure is shared; only the proj width differs (4C vs 8C)."""

    dim: int
    mult: int = 4
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = _GELUProj(self.dim * self.mult, policy=self.policy, name="net_0")(x)
        return nn.Dense(
            self.dim,
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
            name="net_2",
        )(h)
