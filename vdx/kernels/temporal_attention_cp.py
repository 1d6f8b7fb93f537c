"""Temporal attention in the C-major / positions-on-lanes layout.

The motion module's S=16 attention sites are the measured hot spot left in
the UNet forward (PERF.md round-2: six implementations converge at
~5 ms/site vs a ~0.4 ms HBM floor at [8192, 16, 8, 40]). Every attempt so
far kept POSITIONS on the second-minor (sublane) axis, which forces either
8x lane padding of the S=16 score dim (XLA) or expensive in-VMEM
transposes (the blockdiag Pallas family).

This kernel flips the layout: tensors live as [F, C, P] — channels on
sublanes, a 128-position block on lanes. Then:

  * head slicing is a SUBLANE slice at D=40 offsets (40 % 8 == 0: tile
    aligned in fp32) — no lane-dim games at all;
  * scores[f, g, p] for one head = sum over d of q[f, hd, p] * k[g, hd, p]:
    an elementwise VPU multiply + segmented sublane reduction — the MXU
    (and its 128-lane score padding) is never involved;
  * softmax over g is a tiny [F, F, P] reduction with p vectorised on
    lanes;
  * probs @ v is again a broadcast-multiply + leading-axis reduction.

The hypothesis being tested (round-3 VERDICT #4, measure-first): the
"short-seq lowering floor" is an artifact of score-in-lanes layouts, and a
VPU formulation with positions on lanes beats it. If it measures >= the
XLA path, this file becomes a documented dead end like the blockdiag
family (kept, tested, undispatched).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _temporal_cp_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    """One (head, position-block) of the grid: full attention over F.

    q/k/v/o refs: [F, D, P_blk] fp32 — one head's slice. Keeping the head
    on the GRID (not inside the block) keeps each double-buffered block at
    [16, 40, 128] fp32 = 328 KB; whole-C blocks blow the 16 MB scoped-vmem
    budget on double-buffering alone.
    """
    qh = q_ref[...] * scale  # [F, D, P]
    kh = k_ref[...]
    vh = v_ref[...]

    # scores[f, g, p] = sum_d qh[f, d, p] * kh[g, d, p]
    s = jnp.sum(qh[:, None] * kh[None, :], axis=2)  # [F, F, P]

    # softmax over g (axis 1), p vectorised on lanes
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    p_ = e / jnp.sum(e, axis=1, keepdims=True)  # [F, F, P]

    # out[f, d, p] = sum_g p_[f, g, p] * vh[g, d, p]
    o_ref[...] = jnp.sum(p_[:, :, None, :] * vh[None], axis=1)  # [F, D, P]


def temporal_attention_cp(q, k, v, *, scale: float | None = None,
                          block_p: int = 128, interpret: bool = False):
    """q, k, v: [P, F, H, D] (the motion-module site layout) -> same shape.

    Relayouts to [F, H*D, P] outside the kernel (one XLA transpose each
    way — in a full fused-module kernel these amortise over the whole
    block). P must divide by block_p; F and H*D must tile (F any, H*D % 8).
    """
    P, F, H, D = q.shape
    C = H * D
    if scale is None:
        scale = D ** -0.5
    assert P % block_p == 0, (P, block_p)
    assert (D % 8 == 0) or (C % 8 == 0), (D, C)

    def fold(x):  # [P, F, H, D] -> [F, C, P]
        return x.transpose(1, 2, 3, 0).reshape(F, C, P).astype(jnp.float32)

    qt, kt, vt = fold(q), fold(k), fold(v)

    spec = pl.BlockSpec((F, D, block_p), lambda h, i: (0, h, i))
    out = pl.pallas_call(
        functools.partial(_temporal_cp_kernel, scale=scale),
        grid=(H, P // block_p),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((F, C, P), jnp.float32),
        interpret=interpret,
    )(qt, kt, vt)

    # [F, C, P] -> [P, F, H, D]
    return (
        out.reshape(F, H, D, P).transpose(3, 0, 1, 2).astype(q.dtype)
    )
