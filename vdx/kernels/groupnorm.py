"""Fused GroupNorm(+SiLU) — Pallas TPU kernels.

The UNet ResNet hot pattern (GN(32) -> SiLU -> conv) appears ~50x per
forward; XLA decomposes GN into several HBM-bound passes. These kernels do
stats + normalise + affine + SiLU in as few passes over HBM as possible.

Group reductions use one-hot matmuls instead of reshapes: with C=320,
C/G=10 — far below the 128-lane tile — a [S, G, C/G] reshape would be
catastrophically padded, while  sums[g] = ones_S^T (x @ onehot_{C x G})
keeps every intermediate lane-aligned and on the MXU.

Two variants:

* :func:`fused_group_norm` — one program per sample, whole [S, C] block
  resident in VMEM; the S axis is processed in fp32 CHUNKS inside the
  kernel so peak VMEM stays at the bf16 block + one chunk of fp32
  intermediates (the round-1 version materialised x, x*x and y in fp32 and
  OOM'd VMEM at the UNet's [4096, 320] level-0 shape — PERF.md).
* :func:`fused_group_norm_2phase` — for samples whose [S, C] block exceeds
  VMEM (the motion-module GN spans frames AND space jointly: S = F*H*W =
  65536 at level 0): phase 1 accumulates per-group moments over an
  (B, S-chunk) grid, phase 2 normalises chunk-by-chunk. Two HBM passes over
  x — the streaming minimum for exact (non-Welford-approximate) GN.

fp32 statistics regardless of input dtype (core/dtypes policy).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _pick_chunk(S: int, target: int = 512, multiple: int = 1) -> int:
    """Largest divisor of S that is <= target and a multiple of ``multiple``
    (S chunks must tile exactly). Returns 0 when none exists.

    ``multiple=8``: Mosaic requires grid block dims divisible by the 8-row
    sublane tile unless the block spans the whole axis — the 2-phase
    kernel's S-chunks hit this (caught live at CogVideoX's causal-VAE shape
    S=70200, whose best <=1024 divisor is 975)."""
    best = 0
    for c in range(multiple, min(S, target) + 1, multiple):
        if S % c == 0:
            best = c
    return best


def _onehot(C: int, G: int) -> jnp.ndarray:
    return jnp.asarray(np.repeat(np.eye(G, dtype=np.float32), C // G, axis=0))


# ----------------------------------------------------------------------
# single-program variant (block fits VMEM)
# ----------------------------------------------------------------------


def _gn_kernel(x_ref, onehot_ref, scale_ref, bias_ref, o_ref, *, chunk,
               group_size, eps, with_silu, hp):
    S = x_ref.shape[1]
    G = onehot_ref.shape[1]
    onehot = onehot_ref[:]  # [C, G] fp32
    n_chunks = S // chunk
    denom = S * group_size

    def stat_body(i, carry):
        gsum, gsq = carry
        xa = x_ref[0, pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        gsum = gsum + jnp.sum(
            jax.lax.dot_general(xa, onehot, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32),
            axis=0, keepdims=True)
        gsq = gsq + jnp.sum(
            jax.lax.dot_general(xa * xa, onehot, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32),
            axis=0, keepdims=True)
        return gsum, gsq

    gsum, gsq = jax.lax.fori_loop(
        0, n_chunks, stat_body,
        (jnp.zeros((1, G), jnp.float32), jnp.zeros((1, G), jnp.float32)),
    )
    mean = gsum / denom  # [1, G]
    var = gsq / denom - mean * mean
    inv = jax.lax.rsqrt(var + eps)

    # broadcast group stats back to channels: [1, G] @ [G, C] -> [1, C]
    mean_c = jax.lax.dot_general(mean, onehot, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST
                            if hp else None)
    inv_c = jax.lax.dot_general(inv, onehot, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST
                            if hp else None)
    sc = scale_ref[:].astype(jnp.float32)[None, :] * inv_c
    off = bias_ref[:].astype(jnp.float32)[None, :] - mean_c * sc

    def norm_body(i, _):
        xa = x_ref[0, pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        y = xa * sc + off
        if with_silu:
            y = y * jax.nn.sigmoid(y)
        o_ref[0, pl.ds(i * chunk, chunk), :] = y.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_chunks, norm_body, 0)


@functools.partial(
    jax.jit, static_argnames=("num_groups", "eps", "with_silu")
)
def fused_group_norm(
    x: jnp.ndarray,  # [B, S, C] — S collapses all spatial (and frame) axes
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    num_groups: int,
    eps: float = 1e-5,
    with_silu: bool = False,
) -> jnp.ndarray:
    B, S, C = x.shape
    G = num_groups
    assert C % G == 0

    # fp32 chunk temporaries stay ~1 MB: chunk*C <= 2^18
    kernel = functools.partial(
        _gn_kernel, chunk=_pick_chunk(S, max(8, 2**18 // C)),
        group_size=C // G, eps=eps, with_silu=with_silu,
        hp=x.dtype == jnp.float32,
    )
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, S, C), lambda b: (b, 0, 0)),
            pl.BlockSpec((C, G), lambda b: (0, 0)),
            pl.BlockSpec((C,), lambda b: (0,)),
            pl.BlockSpec((C,), lambda b: (0,)),
        ],
        out_specs=pl.BlockSpec((1, S, C), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, S, C), x.dtype),
    )(x, _onehot(C, G), scale, bias)


# ----------------------------------------------------------------------
# two-phase grid variant (block exceeds VMEM)
# ----------------------------------------------------------------------


def _gn_stats_kernel(x_ref, onehot_ref, m_ref):
    """Accumulate [1, 2, G] (sum, sumsq) over the S-chunk grid axis."""
    s = pl.program_id(1)
    xa = x_ref[0].astype(jnp.float32)  # [CH, C]
    onehot = onehot_ref[:]
    gsum = jnp.sum(
        jax.lax.dot_general(xa, onehot, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32),
        axis=0, keepdims=True)
    gsq = jnp.sum(
        jax.lax.dot_general(xa * xa, onehot, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32),
        axis=0, keepdims=True)
    update = jnp.concatenate([gsum, gsq], axis=0)[None]  # [1, 2, G]

    @pl.when(s == 0)
    def _():
        m_ref[:] = update

    @pl.when(s > 0)
    def _():
        m_ref[:] = m_ref[:] + update


def _gn_apply_kernel(x_ref, m_ref, onehot_ref, scale_ref, bias_ref, o_ref, *,
                     denom, eps, with_silu, hp):
    xa = x_ref[0].astype(jnp.float32)  # [CH, C]
    onehot = onehot_ref[:]
    mean = m_ref[0, 0][None] / denom  # [1, G]
    var = m_ref[0, 1][None] / denom - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    mean_c = jax.lax.dot_general(mean, onehot, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST
                            if hp else None)
    inv_c = jax.lax.dot_general(inv, onehot, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST
                            if hp else None)
    sc = scale_ref[:].astype(jnp.float32)[None, :] * inv_c
    off = bias_ref[:].astype(jnp.float32)[None, :] - mean_c * sc
    y = xa * sc + off
    if with_silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_groups", "eps", "with_silu")
)
def fused_group_norm_2phase(
    x: jnp.ndarray,  # [B, S, C]
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    num_groups: int,
    eps: float = 1e-5,
    with_silu: bool = False,
) -> jnp.ndarray:
    B, S, C = x.shape
    G = num_groups
    assert C % G == 0
    # block bytes (in+out, double-buffered) ~ chunk*C*8 B: keep chunk*C <= 2^19
    chunk = _pick_chunk(S, target=max(8, 2**19 // C), multiple=8)
    assert chunk, (
        f"S={S} has no 8-divisible chunk <= {max(8, 2**19 // C)}; "
        "dispatch should have routed to XLA (pallas_gn_viable)"
    )
    n_chunks = S // chunk
    onehot = _onehot(C, G)

    moments = pl.pallas_call(
        _gn_stats_kernel,
        grid=(B, n_chunks),
        in_specs=[
            pl.BlockSpec((1, chunk, C), lambda b, s: (b, s, 0)),
            pl.BlockSpec((C, G), lambda b, s: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2, G), lambda b, s: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, 2, G), jnp.float32),
    )(x, onehot)

    kernel = functools.partial(
        _gn_apply_kernel, denom=float(S * (C // G)), eps=eps,
        with_silu=with_silu, hp=x.dtype == jnp.float32,
    )
    return pl.pallas_call(
        kernel,
        grid=(B, n_chunks),
        in_specs=[
            pl.BlockSpec((1, chunk, C), lambda b, s: (b, s, 0)),
            pl.BlockSpec((1, 2, G), lambda b, s: (b, 0, 0)),
            pl.BlockSpec((C, G), lambda b, s: (0, 0)),
            pl.BlockSpec((C,), lambda b, s: (0,)),
            pl.BlockSpec((C,), lambda b, s: (0,)),
        ],
        out_specs=pl.BlockSpec((1, chunk, C), lambda b, s: (b, s, 0)),
        out_shape=jax.ShapeDtypeStruct((B, S, C), x.dtype),
    )(x, moments, onehot, scale, bias)


# Block bytes (in + out, double-buffered) must clear the ~19 MB scoped
# VMEM budget with room for the fp32 chunk intermediates: S*C elems *
# itemsize * 2 bufs * 2 (in+out) + ~3 MB temps. The budget is in BYTES —
# an fp32 input halves the element allowance (caught live: the TPU fp32
# parity leg OOM'd scoped vmem at [16, 1024, 960] f32, which fits in bf16).
_SINGLE_PROGRAM_MAX_BYTES = 1_441_792 * 2  # (1.375 * 2^20 elems) * 2 B


def pallas_gn_viable(shape, itemsize: int = 2) -> bool:
    """True when the Pallas dispatch can lower this channels-last shape.

    Large blocks route to the 2-phase grid kernel, whose S-chunks must be
    8-divisible divisors of S (Mosaic sublane tiling); shapes like
    CogVideoX's causal-VAE GN (S = 13*60*90 = 70200 at C=512 — largest
    valid divisor is 8, a degenerate 8775-step grid) stay on XLA."""
    C = shape[-1]
    S = int(np.prod(shape[1:-1]))
    if S * C * itemsize <= _SINGLE_PROGRAM_MAX_BYTES:
        return True
    return _pick_chunk(S, target=max(8, 2**19 // C), multiple=8) >= 64


def group_norm_silu_pallas(x: jnp.ndarray, num_groups: int, scale, bias,
                           eps: float = 1e-5, with_silu: bool = True) -> jnp.ndarray:
    """Channels-last [..., C] wrapper: folds every non-batch axis into S."""
    shape = x.shape
    B = shape[0]
    C = shape[-1]
    S = int(np.prod(shape[1:-1]))
    fn = (fused_group_norm
          if S * C * x.dtype.itemsize <= _SINGLE_PROGRAM_MAX_BYTES
          else fused_group_norm_2phase)
    y = fn(
        x.reshape(B, S, C), scale, bias,
        num_groups=num_groups, eps=eps, with_silu=with_silu,
    )
    return y.reshape(shape)
