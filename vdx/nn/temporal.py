"""Temporal (motion) transformer — the AnimateDiff-style motion module.

Implements the structure the reference documents and traces
(reference docs/02_video_diffusion_architecture.md:52-82, verified shapes at
experiments/03_trace_forward_pass.py:160-169, 266-275):

    GroupNorm -> proj_in (Linear)
      -> [B*H*W, F, C]           (each spatial position attends across frames)
      -> TemporalBlock x depth   (sinusoidal frame PE, double temporal
                                  self-attention, GEGLU ff)
    -> proj_out (Linear) -> +residual

GroupNorm statistics span frames AND space jointly (torch GN over
[B, C, F, H, W]); ops.group_norm reproduces that on the channels-last layout.

Sequence parallelism (the long-clip north star, SURVEY.md §5): this module
is the ONLY cross-frame op in the UNet. Two frame-sharded execution modes,
both exact vs local and both with parameter trees IDENTICAL to local mode —
the same weights run sharded or not:

  * ``temporal_impl="ring:frames"`` — ring attention: the local Q block
    stays put while KV blocks rotate around the mesh axis
    (parallel/ring_attention); GroupNorm statistics psum across the frame
    shards; the sinusoidal frame PE uses global frame indices.  ICI traffic
    per attention site: 2 * (n-1) * |KV_local| (every KV shard visits every
    device).
  * ``temporal_impl="ulysses:frames"`` — Ulysses/DeepSpeed-style axis swap
    (the all-to-all design SURVEY.md §5 names): two ``lax.all_to_all``s
    reshard [positions, F_local, C] -> [positions/n, F_global, C] around the
    whole TemporalBlock, which then runs the PLAIN LOCAL math (local PE,
    local fast-path attention, local softmax).  ICI traffic per site:
    2 * (n-1)/n * |x_local| — at video shapes (F ~ 16-32, positions ~ 10^4)
    this is ~4 * F_local/C-independent ~8x less than the ring, and the inner
    attention gets the single-program short-seq fast path instead of a
    per-hop online-softmax loop.  Needs positions % n == 0 at a site; a site
    that doesn't divide (1x1 mid blocks at tiny resolutions) statically
    falls back to the ring — at production resolutions every level divides.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from vdx.core.dtypes import DEFAULT_POLICY, Policy
from vdx.nn.attention import Attention, FeedForward
from vdx.nn.embeddings import sinusoidal_positional_encoding
from vdx.nn.transformer import LayerNormF32
from vdx.ops.groupnorm import group_norm


def _ring_axis(temporal_impl: str):
    return temporal_impl.split(":", 1)[1] if temporal_impl.startswith("ring:") else None


def _ulysses_axis(temporal_impl: str):
    return (
        temporal_impl.split(":", 1)[1]
        if temporal_impl.startswith("ulysses:")
        else None
    )


def _shard_axis(temporal_impl: str):
    """Mesh axis the frame dim is sharded over, in EITHER sharded mode.

    Ring and Ulysses differ only inside the temporal transformer blocks;
    everything else that touches sharded frames (GroupNorm statistics, halo
    temporal convs, global-frame positional indices) behaves identically and
    keys off this."""
    return _ring_axis(temporal_impl) or _ulysses_axis(temporal_impl)


def _axis_size(axis) -> int:
    return jax.lax.axis_size(axis)


def frame_validity_mask(frames_local: int, frames_valid: int, axis):
    """[F_local] bool: which LOCAL frame slots hold REAL frames.

    Ragged frame sharding zero-pads the global frame axis to the next
    multiple of the mesh axis; a slot is real iff its GLOBAL index
    (shard_index * F_local + local_index, or just local_index when
    ``axis`` is None) is < ``frames_valid``.
    """
    idx = jnp.arange(frames_local)
    if axis is not None:
        idx = idx + jax.lax.axis_index(axis) * frames_local
    return idx < frames_valid


class FrameConv3(nn.Module):
    """3x1x1 conv over frames computed as three shifted CxC matmuls.

    Parameter tree is IDENTICAL to ``nn.Conv(features, (3, 1, 1))`` —
    kernel [3, 1, 1, Cin, Cout] + bias — so checkpoints and the
    conversion rules (core/convert.py) see no difference. The three
    frame taps become three [M, Cin] x [Cin, Cout] contractions with a
    pad-shift, which XLA tiles straight onto the MXU instead of lowering
    a kernel-3 depth conv (measured vs nn.Conv in
    scripts/bench_svd_fwd_breakdown.py tconv-mm).

    ``padding="same"``: zero padding over frames (local execution).
    ``padding="valid"``: input already halo-padded by one frame on each
    side (frame-sharded execution, ops/halo.py).
    """

    features: int
    padding: str = "same"
    policy: Policy = DEFAULT_POLICY
    zero_init: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, F, H, W, C]
        Cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.zeros if self.zero_init
            else nn.initializers.lecun_normal(),
            (3, 1, 1, Cin, self.features), self.policy.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          self.policy.param_dtype)
        w = kernel.reshape(3, Cin, self.features).astype(self.policy.compute_dtype)
        xc = x.astype(self.policy.compute_dtype)
        mm = lambda t, wi: jnp.einsum("bfhwc,cd->bfhwd", t, wi)  # noqa: E731
        pad5 = lambda y, lo, hi: jnp.pad(  # noqa: E731
            y, ((0, 0), (lo, hi), (0, 0), (0, 0), (0, 0)))
        if self.padding == "same":
            y = mm(xc, w[1])
            y = y + pad5(mm(xc[:, :-1], w[0]), 1, 0)
            y = y + pad5(mm(xc[:, 1:], w[2]), 0, 1)
        else:  # valid over a halo-padded frame axis: F_out = F - 2
            y = mm(xc[:, :-2], w[0]) + mm(xc[:, 1:-1], w[1]) + mm(xc[:, 2:], w[2])
        return y + bias.astype(y.dtype)


class TemporalBlock(nn.Module):
    """BasicTransformerBlock with sinusoidal frame PE and double self-attn."""

    dim: int
    heads: int
    head_dim: int
    max_seq_length: int = 32
    policy: Policy = DEFAULT_POLICY
    temporal_impl: str = "local"
    pab: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, refresh=None,
                 frames_valid=None) -> jnp.ndarray:
        impl = self.temporal_impl
        u_axis = _ulysses_axis(impl)
        if u_axis is not None and x.shape[0] % jax.lax.axis_size(u_axis) != 0:
            # Positions not divisible by the mesh axis (e.g. a 1x1 mid block
            # at tiny resolutions): this site falls back to the ring — a
            # static, per-site decision; both modes are exact, so mixing is
            # too. At production resolutions every level divides.
            impl = f"ring:{u_axis}"
            u_axis = None
        if u_axis is not None:
            # Ulysses axis swap: [P, F_local, C] -> [P/n, F_global, C]; the
            # block body below then takes the plain LOCAL path (full frame
            # axis on-device), and a second all_to_all restores the frame
            # sharding on the way out.  Exactness vs local is tested at
            # tests/test_frame_parallel.py.
            x = jax.lax.all_to_all(x, u_axis, split_axis=0, concat_axis=1,
                                   tiled=True)
            impl = "local"
        axis = _ring_axis(impl)
        # Ragged frame sharding (``frames_valid`` = GLOBAL real frame count,
        # static): the frame axis was zero-padded to divide the mesh axis.
        #   * local (incl. post-Ulysses): the full padded axis is on-device —
        #     slice to the real frames, run the EXACT unpadded local program,
        #     zero-fill the padded slots on the way out.
        #   * ring: keys at padded global positions are masked out of every
        #     softmax (the mask rotates with its KV block); padded-position
        #     queries produce finite don't-care values.
        kv_valid = None
        pad_f = 0
        if frames_valid is not None:
            if axis is None:
                pad_f = x.shape[1] - frames_valid
                if pad_f:
                    x = x[:, :frames_valid]
            elif frames_valid < x.shape[1] * jax.lax.axis_size(axis):
                F_l = x.shape[1]
                gidx = jnp.arange(F_l) + jax.lax.axis_index(axis) * F_l
                kv_valid = gidx < frames_valid
        F = x.shape[1]
        if axis is None:
            pe = sinusoidal_positional_encoding(F, self.dim).astype(x.dtype)
            attn_impl = "auto"
        else:
            # F is the LOCAL shard; PE must use global frame positions.
            n = jax.lax.axis_size(axis)
            idx = jax.lax.axis_index(axis)
            pe_global = sinusoidal_positional_encoding(F * n, self.dim).astype(x.dtype)
            pe = jax.lax.dynamic_slice_in_dim(pe_global, idx * F, F, axis=0)
            attn_impl = impl

        h = LayerNormF32(policy=self.policy, name="norm1")(x)
        h = h + pe[None]
        x = x + Attention(
            self.dim, self.heads, self.head_dim, policy=self.policy,
            attn_impl=attn_impl, pab=self.pab, name="attn1",
        )(h, refresh=refresh, kv_valid=kv_valid)

        h = LayerNormF32(policy=self.policy, name="norm2")(x)
        h = h + pe[None]
        x = x + Attention(
            self.dim, self.heads, self.head_dim, policy=self.policy,
            attn_impl=attn_impl, pab=self.pab, name="attn2",
        )(h, refresh=refresh, kv_valid=kv_valid)

        h = LayerNormF32(policy=self.policy, name="norm3")(x)
        x = x + FeedForward(self.dim, policy=self.policy, name="ff")(h)
        if pad_f:
            x = jnp.pad(x, ((0, 0), (0, pad_f), (0, 0)))
        if u_axis is not None:
            # [P/n, F_global, C] -> [P, F_local, C]
            x = jax.lax.all_to_all(x, u_axis, split_axis=1, concat_axis=0,
                                   tiled=True)
        return x


class TemporalTransformer3D(nn.Module):
    """Motion module. Input [B*F, H, W, C] + static num_frames; same output.

    ``num_frames`` is the LOCAL frame count when running frame-sharded.
    """

    heads: int = 8
    depth: int = 1
    max_seq_length: int = 32
    policy: Policy = DEFAULT_POLICY
    temporal_impl: str = "local"
    pab: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, num_frames: int, refresh=None,
                 frames_valid=None) -> jnp.ndarray:
        BF, H, W, C = x.shape
        F = num_frames
        B = BF // F
        residual = x
        # GN statistics span the GLOBAL frame axis in both sharded modes.
        axis = _shard_axis(self.temporal_impl)
        # Ragged sharding: a padded frame axis. Exclude padded slots from
        # the GN statistics; frames_valid == the global axis size degrades
        # to the unpadded program.
        ragged = (
            frames_valid is not None
            and frames_valid < F * (1 if axis is None else _axis_size(axis))
        )

        scale = self.param("norm_scale", nn.initializers.ones, (C,), self.policy.param_dtype)
        bias = self.param("norm_bias", nn.initializers.zeros, (C,), self.policy.param_dtype)
        h = x.reshape(B, F, H, W, C)
        groups = math.gcd(32, C)
        if axis is None and not ragged:
            # GN with stats over (F, H, W) jointly
            h = group_norm(h, groups, scale, bias, eps=1e-6)
        elif ragged:
            mask = frame_validity_mask(F, frames_valid, axis)
            h = group_norm(h, groups, scale, bias, eps=1e-6,
                           stats_axis_name=axis, frame_mask=mask)
        else:
            # sharded stats: local moments + psum over the frame shards
            xg = h.astype(jnp.float32).reshape(B, F, H, W, groups, C // groups)
            axes = (1, 2, 3, 5)
            mean = jax.lax.pmean(xg.mean(axis=axes, keepdims=True), axis)
            sq = jax.lax.pmean((xg * xg).mean(axis=axes, keepdims=True), axis)
            var = sq - mean * mean
            xg = (xg - mean) * jax.lax.rsqrt(var + 1e-6)
            h = xg.reshape(B, F, H, W, C)
            h = (h * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)

        # [B, F, H, W, C] -> [B*H*W, F, C]
        h = h.transpose(0, 2, 3, 1, 4).reshape(B * H * W, F, C)
        h = nn.Dense(
            C,
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
            name="proj_in",
        )(h)
        head_dim = C // self.heads
        for i in range(self.depth):
            h = TemporalBlock(
                C,
                self.heads,
                head_dim,
                max_seq_length=self.max_seq_length,
                policy=self.policy,
                temporal_impl=self.temporal_impl,
                pab=self.pab,
                name=f"blocks_{i}",
            )(h, refresh=refresh,
              frames_valid=frames_valid if ragged else None)
        h = nn.Dense(
            C,
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
            name="proj_out",
        )(h)

        # [B*H*W, F, C] -> [B*F, H, W, C]
        h = h.reshape(B, H, W, F, C).transpose(0, 3, 1, 2, 4).reshape(BF, H, W, C)
        return h + residual
