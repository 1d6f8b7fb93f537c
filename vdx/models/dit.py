"""Latte-style spatiotemporal DiT — factorised space/time transformer denoiser.

Covers the "Latte-style spatiotemporal DiT with CFG batching and
frame-parallel sharding" target config (BASELINE.json configs[4]). The
second video-diffusion architecture family (beside UNetMotion's
inserted-temporal-attention family) per docs/02: alternating
spatial transformer blocks (tokens = patches within a frame) and temporal
transformer blocks (tokens = same patch across frames), with adaLN-Zero
timestep conditioning and cross-attention to text in the spatial blocks.

TPU notes: tokens stay [B*F, N, D] / [B*N, F, D] — both reshapes are static;
the temporal blocks are again the only cross-frame ops, so frame-axis
sharding maps exactly like the UNet's motion modules (parallel/ring_attention).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vdx.core.dtypes import DEFAULT_POLICY, Policy
from vdx.nn.attention import Attention, GELUFeedForward
from vdx.nn.embeddings import get_timestep_embedding, sinusoidal_positional_encoding


@dataclasses.dataclass(frozen=True)
class LatteConfig:
    in_channels: int = 4
    out_channels: int = 4
    patch_size: int = 2
    hidden_size: int = 1152
    depth: int = 28  # total blocks; alternating spatial/temporal
    num_heads: int = 16
    cross_attention_dim: int = 768
    mlp_ratio: int = 4

    @classmethod
    def xl(cls) -> "LatteConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "LatteConfig":
        return cls(hidden_size=64, depth=4, num_heads=2, cross_attention_dim=64)


class AdaLNModulation(nn.Module):
    """SiLU + Dense producing n_chunks modulation vectors from cond."""

    hidden_size: int
    n_chunks: int
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, c: jnp.ndarray):
        h = nn.silu(c.astype(jnp.float32)).astype(self.policy.compute_dtype)
        h = nn.Dense(
            self.n_chunks * self.hidden_size,
            kernel_init=nn.initializers.zeros,  # adaLN-Zero
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
            name="proj",
        )(h)
        return jnp.split(h[:, None, :], self.n_chunks, axis=-1)


def _modulate(x, shift, scale):
    return x * (1 + scale) + shift


class DiTBlock(nn.Module):
    """adaLN-Zero transformer block; optional cross-attention to text.

    ``attn_impl`` applies to the SELF-attention (ring attention under frame
    sharding); cross-attention is always sequence-local."""

    config: LatteConfig
    use_cross_attn: bool = False
    policy: Policy = DEFAULT_POLICY
    pab: bool = False
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x, c, context: Optional[jnp.ndarray] = None,
                 refresh_self=None, refresh_cross=None, kv_valid=None):
        cfg = self.config
        D = cfg.hidden_size
        head_dim = D // cfg.num_heads
        ln = lambda name: nn.LayerNorm(  # noqa: E731
            epsilon=1e-6, use_bias=False, use_scale=False,
            dtype=jnp.float32, name=name,
        )
        shift_a, scale_a, gate_a, shift_m, scale_m, gate_m = AdaLNModulation(
            D, 6, self.policy, name="adaln"
        )(c)

        h = ln("norm1")(x).astype(x.dtype)
        h = _modulate(h, shift_a, scale_a)
        h = Attention(D, cfg.num_heads, head_dim, policy=self.policy,
                      pab=self.pab, attn_impl=self.attn_impl,
                      name="attn")(h, refresh=refresh_self, kv_valid=kv_valid)
        x = x + gate_a * h

        if self.use_cross_attn and context is not None:
            # ada_norm_single applies cross-attention on the RAW hidden
            # states (diffusers skips norm2 before attn2 for the PixArt/
            # Latte block family) — pinned vs torch in
            # tests/test_block_parity.py::test_latte_dit_block_matches_torch
            h = Attention(
                D, cfg.num_heads, head_dim,
                context_dim=cfg.cross_attention_dim,
                policy=self.policy, pab=self.pab, name="cross_attn",
            )(x, context, refresh=refresh_cross)
            x = x + h

        h = ln("norm2")(x).astype(x.dtype)
        h = _modulate(h, shift_m, scale_m)
        # gelu-approximate FF — the checkpoint family's activation (not GEGLU)
        h = GELUFeedForward(
            D, mult=cfg.mlp_ratio, policy=self.policy, name="mlp"
        )(h)
        x = x + gate_m * h
        return x


class LatteDiT(nn.Module):
    config: LatteConfig = LatteConfig()
    policy: Policy = DEFAULT_POLICY
    attn_impl: str = "auto"  # threaded through ops.attention's dispatch
    # "local" or "ring:<axis>"/"ulysses:<axis>" — frame-sharded execution
    # (BASELINE configs[4]: "frame-parallel sharding over ICI"). Spatial
    # blocks are frame-local; only the odd (temporal) blocks communicate:
    # Ulysses all_to_all axis swap when B*N divides the mesh axis, ring
    # attention otherwise; the frame PE uses global indices.
    temporal_impl: str = "local"
    # Pyramid Attention Broadcast — the PAB paper's native architecture
    # family is exactly this (factorised space/time DiT)
    pab: bool = False

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # [B, F, h, w, C]
        timestep: jnp.ndarray,  # scalar or [B]
        context: Optional[jnp.ndarray] = None,  # [B, S, cross_dim]
        *,
        pab_refresh=None,  # {'spatial','temporal','cross'}: bool | None
        frames_valid=None,  # GLOBAL real frame count under ragged frame
        # sharding (frame axis zero-padded to divide the mesh axis)
    ) -> jnp.ndarray:
        cfg = self.config
        B, F, H, W, C = sample.shape
        p = cfg.patch_size
        assert H % p == 0 and W % p == 0
        hp, wp = H // p, W // p
        N = hp * wp
        D = cfg.hidden_size

        x = sample.astype(self.policy.compute_dtype)
        # Patchify: [B, F, hp, p, wp, p, C] -> [B, F, N, p*p*C] -> Dense D
        x = x.reshape(B, F, hp, p, wp, p, C).transpose(0, 1, 2, 4, 3, 5, 6)
        x = x.reshape(B, F, N, p * p * C)
        x = nn.Dense(
            D, dtype=self.policy.compute_dtype, param_dtype=self.policy.param_dtype,
            name="patch_embed",
        )(x)

        # Positional embeddings: spatial (per patch) + temporal (per frame)
        pos_s = sinusoidal_positional_encoding(N, D).astype(x.dtype)
        pos_t = sinusoidal_positional_encoding(F, D).astype(x.dtype)
        x = x + pos_s[None, None]

        # Timestep conditioning
        t = jnp.broadcast_to(jnp.atleast_1d(timestep), (B,))
        t_emb = get_timestep_embedding(t, 256)
        c = nn.Dense(D, dtype=self.policy.compute_dtype,
                     param_dtype=self.policy.param_dtype, name="t_proj_1")(
            t_emb.astype(self.policy.compute_dtype))
        c = nn.silu(c.astype(jnp.float32)).astype(self.policy.compute_dtype)
        c = nn.Dense(D, dtype=self.policy.compute_dtype,
                     param_dtype=self.policy.param_dtype, name="t_proj_2")(c)

        if context is not None:
            context = context.astype(self.policy.compute_dtype)

        r = pab_refresh or {}
        for i in range(cfg.depth):
            if i % 2 == 0:
                # spatial block: [B*F, N, D]
                xs = x.reshape(B * F, N, D)
                cs = jnp.repeat(c, F, axis=0)
                ctx = jnp.repeat(context, F, axis=0) if context is not None else None
                xs = DiTBlock(
                    cfg, use_cross_attn=context is not None,
                    policy=self.policy, pab=self.pab, name=f"blocks_{i}",
                )(xs, cs, ctx, refresh_self=r.get("spatial"),
                  refresh_cross=r.get("cross"))
                x = xs.reshape(B, F, N, D)
            else:
                # temporal block: [B*N, F, D] (+ frame PE on first temporal
                # block). F is the LOCAL shard under frame sharding; the PE
                # uses global frame indices, and the block communicates via
                # Ulysses all_to_all (or ring attention where B*N doesn't
                # divide the mesh axis) — nn/temporal.py module doc.
                from vdx.nn.temporal import _shard_axis, _ulysses_axis

                s_axis = _shard_axis(self.temporal_impl)
                xt = x.transpose(0, 2, 1, 3).reshape(B * N, F, D)
                if i == 1:
                    if s_axis is None:
                        xt = xt + pos_t[None]
                    else:
                        n_sh = jax.lax.axis_size(s_axis)
                        idx = jax.lax.axis_index(s_axis)
                        pe_g = sinusoidal_positional_encoding(
                            F * n_sh, D).astype(x.dtype)
                        xt = xt + jax.lax.dynamic_slice_in_dim(
                            pe_g, idx * F, F, axis=0)[None]
                ct = jnp.repeat(c, N, axis=0)
                attn_impl = "auto"
                u_axis = _ulysses_axis(self.temporal_impl)
                if u_axis is not None and (
                    (B * N) % jax.lax.axis_size(u_axis) != 0
                ):
                    u_axis = None  # static per-site fallback to the ring
                kv_valid = None
                pad_ft = 0
                if u_axis is not None:
                    n_sh = jax.lax.axis_size(u_axis)
                    idx = jax.lax.axis_index(u_axis)
                    xt = jax.lax.all_to_all(xt, u_axis, split_axis=0,
                                            concat_axis=1, tiled=True)
                    ct = jax.lax.dynamic_slice_in_dim(
                        ct, idx * (B * N // n_sh), B * N // n_sh, axis=0)
                    if (frames_valid is not None
                            and frames_valid < xt.shape[1]):
                        # ragged: full padded frame axis on-device — slice
                        # to the real frames, run the exact local block,
                        # zero-fill the pad slots after (nn/temporal.py)
                        pad_ft = xt.shape[1] - frames_valid
                        xt = xt[:, :frames_valid]
                elif s_axis is not None:
                    attn_impl = f"ring:{s_axis}"
                    if (frames_valid is not None and frames_valid
                            < F * jax.lax.axis_size(s_axis)):
                        from vdx.nn.temporal import frame_validity_mask

                        kv_valid = frame_validity_mask(
                            F, frames_valid, s_axis)
                xt = DiTBlock(cfg, policy=self.policy, pab=self.pab,
                              attn_impl=attn_impl, name=f"blocks_{i}")(
                    xt, ct, refresh_self=r.get("temporal"),
                    kv_valid=kv_valid)
                if pad_ft:
                    xt = jnp.pad(xt, ((0, 0), (0, pad_ft), (0, 0)))
                if u_axis is not None:
                    xt = jax.lax.all_to_all(xt, u_axis, split_axis=1,
                                            concat_axis=0, tiled=True)
                x = xt.reshape(B, N, F, D).transpose(0, 2, 1, 3)

        # Final adaLN + projection, unpatchify. The checkpoint family's
        # final modulation is table + RAW embedded timestep (no silu, no
        # linear — diffusers adds `scale_shift_table[None] +
        # embedded_timestep[:, None]`), so this is a bare table param, not
        # an AdaLNModulation.
        ft = self.param(
            "final_scale_shift_table", nn.initializers.zeros, (2, D),
            self.policy.param_dtype,
        ).astype(jnp.float32)
        cm = c.astype(jnp.float32)
        shift = (ft[0][None] + cm)[:, None, :].astype(x.dtype)
        scale = (ft[1][None] + cm)[:, None, :].astype(x.dtype)
        ln_f = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                            dtype=jnp.float32, name="final_norm")
        x = _modulate(ln_f(x.reshape(B, F * N, D)).astype(x.dtype),
                      shift, scale).reshape(B, F, N, D)
        x = nn.Dense(
            p * p * cfg.out_channels,
            kernel_init=nn.initializers.zeros,
            dtype=self.policy.compute_dtype, param_dtype=self.policy.param_dtype,
            name="final_proj",
        )(x)
        x = x.reshape(B, F, hp, wp, p, p, cfg.out_channels)
        x = x.transpose(0, 1, 2, 4, 3, 5, 6).reshape(B, F, H, W, cfg.out_channels)
        return self.policy.cast_to_output(x)
