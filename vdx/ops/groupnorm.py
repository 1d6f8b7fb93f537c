"""GroupNorm (+fused SiLU) over channels-last tensors.

Matches torch ``nn.GroupNorm`` semantics: statistics per (batch, group) over
all remaining dims. The reference UNet uses GN(32, eps=1e-5) in ResNet blocks
and GN(32, eps=1e-6) in transformer/motion projections (SD-1.5 conventions;
module structure per reference docs/02_video_diffusion_architecture.md:52-82).

Stats are computed in fp32 regardless of input dtype (core/dtypes.py policy).
On TPU the fused GN+SiLU Pallas kernel (kernels/groupnorm.py) is used for the
UNet hot loop; this XLA formulation is the reference/fallback path and is
itself fully fuseable by XLA.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=1)
def _pallas_gn_available() -> bool:
    if os.environ.get("VDX_GN_IMPL") == "xla":
        return False
    try:
        from vdx.kernels import groupnorm  # noqa: F401

        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _group_norm_xla(
    x: jnp.ndarray,
    num_groups: int,
    scale: Optional[jnp.ndarray],
    bias: Optional[jnp.ndarray],
    eps: float = 1e-5,
    stats_axis_name: Optional[str] = None,
    frame_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """XLA reference formulation (fully fuseable; used on CPU and as the
    differentiation rule for the Pallas path)."""
    orig_dtype = x.dtype
    C = x.shape[-1]
    assert C % num_groups == 0, (C, num_groups)
    gshape = x.shape[:-1] + (num_groups, C // num_groups)
    xg = x.astype(jnp.float32).reshape(gshape)
    axes = tuple(range(1, xg.ndim - 2)) + (xg.ndim - 1,)
    if frame_mask is not None:
        # Ragged frame sharding: axis 1 of x is a (possibly padded) frame
        # axis and ``frame_mask`` [F_local] marks which of its slots are
        # REAL frames. Statistics must span only real frames — padded slots
        # carry garbage and, across shards, the per-shard real counts are
        # UNEQUAL, so pmean-of-means is wrong; use psum of masked sums over
        # a psum'd count instead.
        w = frame_mask.astype(jnp.float32).reshape(
            (1, frame_mask.shape[0]) + (1,) * (xg.ndim - 2)
        )
        per_frame = 1.0
        for a in axes:
            if a != 1:
                per_frame *= xg.shape[a]
        cnt = jnp.sum(frame_mask.astype(jnp.float32)) * per_frame
        s1 = jnp.sum(xg * w, axis=axes, keepdims=True)
        s2 = jnp.sum(xg * xg * w, axis=axes, keepdims=True)
        if stats_axis_name is not None:
            cnt = jax.lax.psum(cnt, stats_axis_name)
            s1 = jax.lax.psum(s1, stats_axis_name)
            s2 = jax.lax.psum(s2, stats_axis_name)
        mean = s1 / cnt
        var = s2 / cnt - mean * mean
    elif stats_axis_name is not None:
        mean = jax.lax.pmean(xg.mean(axis=axes, keepdims=True), stats_axis_name)
        sq = jax.lax.pmean((xg * xg).mean(axis=axes, keepdims=True), stats_axis_name)
        var = sq - mean * mean
    else:
        mean = xg.mean(axis=axes, keepdims=True)
        var = xg.var(axis=axes, keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    x = xg.reshape(x.shape)
    if scale is not None:
        x = x * scale.astype(jnp.float32)
    if bias is not None:
        x = x + bias.astype(jnp.float32)
    return x.astype(orig_dtype)


def _group_norm_silu_xla(x, num_groups, scale, bias, eps=1e-5,
                         stats_axis_name=None, frame_mask=None):
    y = _group_norm_xla(x, num_groups, scale, bias, eps, stats_axis_name,
                        frame_mask)
    y32 = y.astype(jnp.float32)
    return (y32 * jnp.reciprocal(1.0 + jnp.exp(-y32))).astype(x.dtype)


# ----------------------------------------------------------------------
# Pallas dispatch: fused single/two-phase kernels on TPU, XLA backward
# (the kernel is forward-only; gradients reuse the XLA formulation's VJP).
# ----------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _gn_pallas(x, scale, bias, num_groups, eps, with_silu):
    from vdx.kernels.groupnorm import group_norm_silu_pallas

    return group_norm_silu_pallas(x, num_groups, scale, bias, eps, with_silu)


def _gn_pallas_fwd(x, scale, bias, num_groups, eps, with_silu):
    return _gn_pallas(x, scale, bias, num_groups, eps, with_silu), (x, scale, bias)


def _gn_pallas_bwd(num_groups, eps, with_silu, res, g):
    x, scale, bias = res
    ref = _group_norm_silu_xla if with_silu else _group_norm_xla
    _, vjp = jax.vjp(
        lambda xx, ss, bb: ref(xx, num_groups, ss, bb, eps), x, scale, bias
    )
    return vjp(g)


_gn_pallas.defvjp(_gn_pallas_fwd, _gn_pallas_bwd)


def _dispatch(x, num_groups, scale, bias, eps, stats_axis_name, with_silu,
              frame_mask=None):
    if (
        stats_axis_name is None
        and frame_mask is None
        and scale is not None
        and bias is not None
        and x.ndim >= 3
        and x.shape[-1] % num_groups == 0
        and _pallas_gn_available()
    ):
        from vdx.kernels.groupnorm import pallas_gn_viable

        if pallas_gn_viable(x.shape, x.dtype.itemsize):
            return _gn_pallas(x, scale, bias, num_groups, eps, with_silu)
    ref = _group_norm_silu_xla if with_silu else _group_norm_xla
    return ref(x, num_groups, scale, bias, eps, stats_axis_name, frame_mask)


def group_norm(
    x: jnp.ndarray,
    num_groups: int,
    scale: Optional[jnp.ndarray],
    bias: Optional[jnp.ndarray],
    eps: float = 1e-5,
    stats_axis_name: Optional[str] = None,
    frame_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """GroupNorm over a channels-last tensor [..., C] with batch on axis 0.

    All axes except 0 (batch) and the group split of the last axis are
    reduction axes — for [B, F, H, W, C] inputs the stats correctly span
    frames and space jointly, matching torch GN over [B, C, F, H, W].

    ``stats_axis_name``: when the reduction dims are sharded over a mesh axis
    (frame sharding inside shard_map), pmean the moments across it so the
    statistics span the GLOBAL tensor.

    ``frame_mask`` ([F] bool, axis 1 of x): ragged frame sharding — padded
    frame slots are excluded from the statistics (masked psum'd sums over a
    psum'd real count, since per-shard real counts are unequal).

    On TPU, dispatches to the fused Pallas kernel (kernels/groupnorm.py);
    set VDX_GN_IMPL=xla to force the XLA formulation.
    """
    return _dispatch(x, num_groups, scale, bias, eps, stats_axis_name, False,
                     frame_mask)


def group_norm_silu(
    x: jnp.ndarray,
    num_groups: int,
    scale: Optional[jnp.ndarray],
    bias: Optional[jnp.ndarray],
    eps: float = 1e-5,
    stats_axis_name: Optional[str] = None,
    frame_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """GroupNorm followed by SiLU — the UNet ResNet hot pattern."""
    return _dispatch(x, num_groups, scale, bias, eps, stats_axis_name, True,
                     frame_mask)
