"""CLIP ViT vision tower — SVD's image-conditioning encoder.

Stable Video Diffusion conditions on OpenCLIP ViT-H/14 image embeddings
(BASELINE.json configs[2]); this is the generic ViT implementation with the
ViT-H preset and a projection head to the UNet's cross-attention width.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from vdx.core.dtypes import DEFAULT_POLICY, Policy
from vdx.ops.attention import dot_product_attention

# CLIP image normalisation
IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1280
    num_layers: int = 32
    num_heads: int = 16
    intermediate_size: int = 5120
    projection_dim: int = 1024

    @classmethod
    def vit_h(cls) -> "CLIPVisionConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "CLIPVisionConfig":
        return cls(image_size=32, patch_size=8, hidden_size=64, num_layers=2,
                   num_heads=2, intermediate_size=128, projection_dim=64)


class _VitBlock(nn.Module):
    config: CLIPVisionConfig
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        head_dim = cfg.hidden_size // cfg.num_heads
        ln = lambda name: nn.LayerNorm(  # noqa: E731
            epsilon=1e-5, dtype=jnp.float32, param_dtype=self.policy.param_dtype,
            name=name)
        dense = lambda f, name: nn.Dense(  # noqa: E731
            f, dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype, name=name)

        h = ln("ln1")(x).astype(x.dtype)
        B, S, D = h.shape
        q = dense(D, "q_proj")(h).reshape(B, S, cfg.num_heads, head_dim)
        k = dense(D, "k_proj")(h).reshape(B, S, cfg.num_heads, head_dim)
        v = dense(D, "v_proj")(h).reshape(B, S, cfg.num_heads, head_dim)
        a = dot_product_attention(q, k, v, scale=head_dim**-0.5, impl="xla")
        x = x + dense(D, "out_proj")(a.reshape(B, S, D))

        h = ln("ln2")(x).astype(x.dtype)
        h = dense(cfg.intermediate_size, "fc1")(h)
        h32 = h.astype(jnp.float32)
        h = (h32 * nn.sigmoid(1.702 * h32)).astype(h.dtype)  # quick-gelu
        x = x + dense(cfg.hidden_size, "fc2")(h)
        return x


class CLIPVisionModel(nn.Module):
    """[B, H, W, 3] in [0,1] -> pooled projected embedding [B, projection_dim]."""

    config: CLIPVisionConfig = CLIPVisionConfig()
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        mean = jnp.asarray(IMAGE_MEAN)
        std = jnp.asarray(IMAGE_STD)
        x = ((pixels - mean) / std).astype(self.policy.compute_dtype)

        p = cfg.patch_size
        x = nn.Conv(
            cfg.hidden_size, (p, p), strides=(p, p), padding="VALID", use_bias=False,
            dtype=self.policy.compute_dtype, param_dtype=self.policy.param_dtype,
            name="patch_embed",
        )(x)
        B, hp, wp, D = x.shape
        x = x.reshape(B, hp * wp, D)

        cls_tok = self.param(
            "class_embedding", nn.initializers.normal(0.02), (D,), self.policy.param_dtype
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_tok, (B, 1, D)).astype(x.dtype), x], axis=1
        )
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02),
            (1 + (cfg.image_size // p) ** 2, D), self.policy.param_dtype,
        )
        x = x + pos[None, : x.shape[1]].astype(x.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=self.policy.param_dtype, name="pre_ln")(x).astype(x.dtype)

        for i in range(cfg.num_layers):
            x = _VitBlock(cfg, self.policy, name=f"layers_{i}")(x)

        pooled = nn.LayerNorm(
            epsilon=1e-5, dtype=jnp.float32, param_dtype=self.policy.param_dtype,
            name="post_ln",
        )(x[:, 0]).astype(x.dtype)
        out = nn.Dense(
            cfg.projection_dim, use_bias=False,
            dtype=self.policy.compute_dtype, param_dtype=self.policy.param_dtype,
            name="visual_projection",
        )(pooled)
        return self.policy.cast_to_output(out)
