"""CogVideoX-class model family: joint-attention 3D DiT + 3D causal VAE.

Covers the "CogVideoX-2B DiT (3D full attention + 3D causal VAE)" target
config (BASELINE.json configs[3]). The fourth architecture family in the
framework: unlike Latte's factorised space/time blocks, CogVideoX runs ONE
full attention over the joint sequence [text tokens ++ all video patch
tokens] — text and video co-attend in every block — with separate ("expert")
adaLN modulation for the text and video segments.

The 3D causal VAE compresses (T, H, W) by (4, 8, 8) with causal temporal
convs (frame t never sees t+1 — enables streaming decode); first frame is
kept intact so F_latent = 1 + (F-1)/4.

TPU notes: the joint sequence at 2B scale (49f @480x720 -> 13x30x45 + 226
text = ~17.8k tokens) is exactly the flash-attention kernel's regime; 3D
full attention has no frame-local structure, so scaling uses sequence
sharding of the joint axis (ring attention) rather than frame-local
sharding.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from vdx.core.dtypes import DEFAULT_POLICY, Policy
from vdx.nn.attention import Attention
from vdx.nn.embeddings import (
    TimestepEmbedding,
    get_timestep_embedding,
    rope_3d,
    sinusoidal_positional_encoding,
)
from vdx.nn.resnet import GroupNormModule


# ======================================================================
# DiT
# ======================================================================


@dataclasses.dataclass(frozen=True)
class CogVideoXConfig:
    in_channels: int = 16
    out_channels: int = 16
    patch_size: int = 2
    hidden_size: int = 1920
    depth: int = 30
    num_heads: int = 30
    text_dim: int = 4096
    max_text_len: int = 226
    mlp_ratio: int = 4
    time_embed_dim: int = 512
    # 3D rotary positional embedding over the (F, h, w) video token grid
    # (CogVideoX-1.5/5B); False selects the factorised sinusoidal PE the
    # 2B checkpoint trains with.
    use_rotary: bool = True

    @classmethod
    def b2(cls) -> "CogVideoXConfig":
        return cls(use_rotary=False)

    @classmethod
    def v1_5(cls) -> "CogVideoXConfig":
        return cls(hidden_size=3072, depth=42, num_heads=48, use_rotary=True)

    @classmethod
    def tiny(cls) -> "CogVideoXConfig":
        return cls(hidden_size=64, depth=2, num_heads=2, text_dim=64,
                   max_text_len=8)


class CogVideoXLayerNormZero(nn.Module):
    """adaLN-zero producing (vid, txt, gate_vid, gate_txt) from the cond.

    One SiLU+Linear emits 6 chunks (shift/scale/gate for the video segment,
    then for the text segment); a SHARED affine LayerNorm normalises both —
    the CogVideoX 'expert adaLN' structure, kept layout-identical so the
    checkpoint's norm1/norm2 linears convert directly (core/convert.py).
    """

    dim: int
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, vid, txt, c):
        h = nn.silu(c.astype(jnp.float32)).astype(self.policy.compute_dtype)
        mod = nn.Dense(
            6 * self.dim, kernel_init=nn.initializers.zeros,
            dtype=self.policy.compute_dtype, param_dtype=self.policy.param_dtype,
            name="linear",
        )(h)[:, None, :]
        shift, scale, gate, e_shift, e_scale, e_gate = jnp.split(mod, 6, axis=-1)
        ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                          param_dtype=self.policy.param_dtype, name="norm")
        vid = (ln(vid) * (1.0 + scale) + shift).astype(mod.dtype)
        txt = (ln(txt) * (1.0 + e_scale) + e_shift).astype(mod.dtype)
        return vid, txt, gate, e_gate


class CogVideoXBlock(nn.Module):
    """Joint text+video attention block with expert adaLN."""

    config: CogVideoXConfig
    policy: Policy = DEFAULT_POLICY
    attn_impl: str = "auto"
    pab: bool = False

    @nn.compact
    def __call__(self, vid, txt, c, rope=None, pab_refresh=None):
        cfg = self.config
        D = cfg.hidden_size
        head_dim = D // cfg.num_heads
        S_txt = txt.shape[1]

        hv, ht, gate, e_gate = CogVideoXLayerNormZero(
            D, self.policy, name="norm1")(vid, txt, c)
        joint = jnp.concatenate([ht, hv], axis=1)
        # CogVideoX attention: biased qkv + per-head LayerNorm on q/k; the
        # rope tables carry identity rows for the text segment. The joint
        # attention output is the model's (single) PAB broadcast site —
        # PABConfig.joint_interval; there are no separable spatial/temporal/
        # cross sites in this family.
        out = Attention(D, cfg.num_heads, head_dim, qkv_bias=True,
                        qk_norm=True, policy=self.policy,
                        attn_impl=self.attn_impl, pab=self.pab,
                        name="attn")(
            joint, refresh=(pab_refresh or {}).get("joint"), rope=rope)
        vid = vid + gate * out[:, S_txt:]
        txt = txt + e_gate * out[:, :S_txt]

        hv, ht, gate, e_gate = CogVideoXLayerNormZero(
            D, self.policy, name="norm2")(vid, txt, c)
        # ONE shared feed-forward over the joint sequence (gelu-approximate)
        h = jnp.concatenate([ht, hv], axis=1)
        h = nn.Dense(D * cfg.mlp_ratio, dtype=self.policy.compute_dtype,
                     param_dtype=self.policy.param_dtype, name="ff_in")(h)
        h = nn.gelu(h.astype(jnp.float32), approximate=True).astype(h.dtype)
        h = nn.Dense(D, dtype=self.policy.compute_dtype,
                     param_dtype=self.policy.param_dtype, name="ff_out")(h)
        vid = vid + gate * h[:, S_txt:]
        txt = txt + e_gate * h[:, :S_txt]
        return vid, txt


class CogVideoXDiT(nn.Module):
    config: CogVideoXConfig = CogVideoXConfig()
    policy: Policy = DEFAULT_POLICY
    attn_impl: str = "auto"
    pab: bool = False

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # [B, F, h, w, C] latent video
        timestep: jnp.ndarray,
        text_states: jnp.ndarray,  # [B, S_txt, text_dim] T5 states
        pab_refresh=None,  # {'joint': bool | None} broadcast refresh flags
    ) -> jnp.ndarray:
        cfg = self.config
        B, F, H, W, C = sample.shape
        p = cfg.patch_size
        hp, wp = H // p, W // p
        N = F * hp * wp
        D = cfg.hidden_size

        x = sample.astype(self.policy.compute_dtype)
        x = x.reshape(B, F, hp, p, wp, p, C).transpose(0, 1, 2, 4, 3, 5, 6)
        x = x.reshape(B, N, p * p * C)
        vid = nn.Dense(D, dtype=self.policy.compute_dtype,
                       param_dtype=self.policy.param_dtype, name="patch_embed")(x)
        rope = None
        if cfg.use_rotary:
            # 3D RoPE over the (F, hp, wp) grid, identity on text tokens
            head_dim = D // cfg.num_heads
            rope = rope_3d(F, hp, wp, head_dim, text_len=text_states.shape[1])
        else:
            # factorised 3D positional encoding: frame PE + spatial PE summed
            pos_s = sinusoidal_positional_encoding(hp * wp, D).astype(vid.dtype)
            pos_t = sinusoidal_positional_encoding(F, D).astype(vid.dtype)
            pos = (pos_t[:, None, :] + pos_s[None, :, :]).reshape(N, D)
            vid = vid + pos[None]

        txt = nn.Dense(D, dtype=self.policy.compute_dtype,
                       param_dtype=self.policy.param_dtype, name="text_proj")(
            text_states.astype(self.policy.compute_dtype))

        # sinusoid at model width, MLP down to the adaLN conditioning width
        t = jnp.broadcast_to(jnp.atleast_1d(timestep), (B,))
        c = get_timestep_embedding(t, D).astype(self.policy.compute_dtype)
        c = TimestepEmbedding(cfg.time_embed_dim, policy=self.policy,
                              name="time_embedding")(c)

        for i in range(cfg.depth):
            vid, txt = CogVideoXBlock(cfg, self.policy, self.attn_impl,
                                      pab=self.pab, name=f"blocks_{i}")(
                vid, txt, c, rope=rope, pab_refresh=pab_refresh)

        # final LN over the JOINT sequence, then adaLN on the video part
        ln_f = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                            param_dtype=self.policy.param_dtype, name="final_norm")
        joint = ln_f(jnp.concatenate([txt, vid], axis=1)).astype(vid.dtype)
        vid = joint[:, txt.shape[1]:]
        h = nn.silu(c.astype(jnp.float32)).astype(self.policy.compute_dtype)
        mod = nn.Dense(2 * D, dtype=self.policy.compute_dtype,
                       param_dtype=self.policy.param_dtype,
                       name="norm_out_linear")(h)[:, None, :]
        shift, scale = jnp.split(mod, 2, axis=-1)
        ln_o = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                            param_dtype=self.policy.param_dtype, name="norm_out")
        vid = (ln_o(vid) * (1.0 + scale) + shift).astype(mod.dtype)
        vid = nn.Dense(p * p * cfg.out_channels, kernel_init=nn.initializers.zeros,
                       dtype=self.policy.compute_dtype,
                       param_dtype=self.policy.param_dtype, name="final_proj")(vid)
        vid = vid.reshape(B, F, hp, wp, p, p, cfg.out_channels)
        vid = vid.transpose(0, 1, 2, 4, 3, 5, 6).reshape(B, F, H, W, cfg.out_channels)
        return self.policy.cast_to_output(vid)


# ======================================================================
# 3D causal VAE
# ======================================================================


@dataclasses.dataclass(frozen=True)
class CausalVAEConfig:
    in_channels: int = 3
    latent_channels: int = 16
    block_out_channels: Tuple[int, ...] = (128, 256, 256, 512)
    layers_per_block: int = 3
    temporal_downsample: Tuple[bool, ...] = (False, True, True, False)
    scaling_factor: float = 1.15258426

    @classmethod
    def cogvideox(cls) -> "CausalVAEConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "CausalVAEConfig":
        return cls(block_out_channels=(16, 32, 32, 32), layers_per_block=1)

    @property
    def spatial_downscale(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)

    @property
    def temporal_downscale(self) -> int:
        return 2 ** sum(self.temporal_downsample)


class CausalConv3d(nn.Module):
    """Conv over [B, F, H, W, C] with CAUSAL temporal padding."""

    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    strides: Tuple[int, int, int] = (1, 1, 1)
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        kt, kh, kw = self.kernel
        x = jnp.pad(
            x,
            ((0, 0), (kt - 1, 0), (kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0)),
            mode="edge",
        )
        return nn.Conv(
            self.features, self.kernel, strides=self.strides, padding="VALID",
            dtype=self.policy.compute_dtype, param_dtype=self.policy.param_dtype,
            name="conv",
        )(x)


class CausalResBlock3D(nn.Module):
    out_channels: int
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        Cin = x.shape[-1]
        g = 32 if self.out_channels % 32 == 0 and Cin % 32 == 0 else min(Cin, 8)
        h = GroupNormModule(g, 1e-6, self.policy, with_silu=True, name="norm1")(x)
        h = CausalConv3d(self.out_channels, policy=self.policy, name="conv1")(h)
        g2 = 32 if self.out_channels % 32 == 0 else min(self.out_channels, 8)
        h = GroupNormModule(g2, 1e-6, self.policy, with_silu=True, name="norm2")(h)
        h = CausalConv3d(self.out_channels, policy=self.policy, name="conv2")(h)
        if Cin != self.out_channels:
            x = nn.Dense(self.out_channels, dtype=self.policy.compute_dtype,
                         param_dtype=self.policy.param_dtype, name="shortcut")(x)
        return x + h


class CausalVAEEncoder(nn.Module):
    config: CausalVAEConfig = CausalVAEConfig()
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, video: jnp.ndarray) -> jnp.ndarray:
        """[B, F, H, W, 3] -> latent moments [B, F', h, w, 2*latent]."""
        cfg = self.config
        x = CausalConv3d(cfg.block_out_channels[0], policy=self.policy,
                         name="conv_in")(video.astype(self.policy.compute_dtype))
        n = len(cfg.block_out_channels)
        for bi, ch in enumerate(cfg.block_out_channels):
            for li in range(cfg.layers_per_block):
                x = CausalResBlock3D(ch, policy=self.policy,
                                     name=f"down_{bi}_{li}")(x)
            if bi < n - 1:
                ts = 2 if cfg.temporal_downsample[bi] else 1
                x = CausalConv3d(ch, kernel=(3, 3, 3), strides=(ts, 2, 2),
                                 policy=self.policy, name=f"down_{bi}_ds")(x)
        x = CausalResBlock3D(x.shape[-1], policy=self.policy, name="mid_0")(x)
        x = CausalResBlock3D(x.shape[-1], policy=self.policy, name="mid_1")(x)
        x = GroupNormModule(32 if x.shape[-1] % 32 == 0 else 8, 1e-6, self.policy,
                            with_silu=True, name="norm_out")(x)
        x = CausalConv3d(2 * cfg.latent_channels, policy=self.policy,
                         name="conv_out")(x)
        return x


class CausalVAEDecoder(nn.Module):
    config: CausalVAEConfig = CausalVAEConfig()
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        x = CausalConv3d(cfg.block_out_channels[-1], policy=self.policy,
                         name="conv_in")(z.astype(self.policy.compute_dtype))
        x = CausalResBlock3D(x.shape[-1], policy=self.policy, name="mid_0")(x)
        x = CausalResBlock3D(x.shape[-1], policy=self.policy, name="mid_1")(x)
        rev = tuple(reversed(cfg.block_out_channels))
        rev_td = tuple(reversed(cfg.temporal_downsample))
        n = len(rev)
        for bi, ch in enumerate(rev):
            for li in range(cfg.layers_per_block + 1):
                x = CausalResBlock3D(ch, policy=self.policy, name=f"up_{bi}_{li}")(x)
            if bi < n - 1:
                B, F, H, W, C = x.shape
                tu = 2 if rev_td[n - 2 - bi] else 1
                x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
                if tu == 2:
                    x = jnp.repeat(x, 2, axis=1)
                x = CausalConv3d(ch, policy=self.policy, name=f"up_{bi}_us")(x)
        x = GroupNormModule(32 if x.shape[-1] % 32 == 0 else 8, 1e-6, self.policy,
                            with_silu=True, name="norm_out")(x)
        x = CausalConv3d(cfg.in_channels, policy=self.policy, name="conv_out")(x)
        return self.policy.cast_to_output(x)
