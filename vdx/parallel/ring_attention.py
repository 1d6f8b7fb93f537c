"""Ring attention over the frame axis — sequence parallelism for long clips.

The north-star long-context path (SURVEY.md §5): shard the frame axis F over
the ``frames`` mesh axis. Spatial and cross attention are frame-local (zero
communication); ONLY the motion modules attend across frames, so only they
communicate. Here that communication is a ring: each device holds its local
Q block permanently and rotates KV blocks around the ``frames`` axis with
``jax.lax.ppermute`` while accumulating online-softmax partial results —
comm overlaps compute, memory stays O(F/devices), and the result is exactly
full attention.

Built on ``shard_map`` + XLA collectives (the TPU-native replacement for the
reference stack's NCCL paths); a Pallas RDMA ring kernel can slot in later
without changing this interface.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _block_attention(q, k, v, scale, kv_valid=None):
    """Unnormalised block attention -> (numerator, denominator, rowmax).

    q: [B, Sq, H, D], k/v: [B, Skv, H, D]; kv_valid: optional [Skv] bool
    marking which KEY positions are real (ragged frame sharding — padded
    frames must not contribute probability mass to any query).
    returns acc [B, Sq, H, D] (f32), l [B, Sq, H, 1], m [B, Sq, H, 1]
    """
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s * scale
    if kv_valid is not None:
        s = jnp.where(kv_valid[None, None, None, :], s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)  # [B, H, Sq, 1]
    if kv_valid is not None:
        # A block whose keys are ALL padding (a fully-pad shard) has
        # m = -inf; clamp so exp(s - m) = exp(-inf) = 0 instead of NaN.
        # _combine then weights this block's contribution by exp(m - m') = 0.
        m = jnp.maximum(m, jnp.float32(-1e30))
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jnp.einsum("bhqk,bkhd->bhqd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    # -> [B, Sq, H, *]
    to_sqh = lambda x: jnp.swapaxes(x, 1, 2)  # noqa: E731
    return to_sqh(acc), to_sqh(l), to_sqh(m)


def _combine(acc1, l1, m1, acc2, l2, m2):
    """Merge two online-softmax partials."""
    m = jnp.maximum(m1, m2)
    a1 = jnp.exp(m1 - m)
    a2 = jnp.exp(m2 - m)
    return acc1 * a1 + acc2 * a2, l1 * a1 + l2 * a2, m


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    axis_name: str,
    scale: Optional[float] = None,
    kv_valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Full attention with KV sharded over ``axis_name``.

    Call INSIDE shard_map; q/k/v are the local shards [B, S_local, H, D].
    Returns the local output shard [B, S_local, H, D].

    ``kv_valid`` ([S_local] bool): ragged sharding — marks which LOCAL key
    positions are real frames. The mask rotates around the ring with its
    KV block, so padded frames are excluded from every device's softmax.
    Queries at padded positions produce don't-care (finite) values: the
    final l always includes at least the real blocks' mass.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    n = jax.lax.psum(1, axis_name)

    acc, l, m = _block_attention(q, k, v, scale, kv_valid)

    def body(i, carry):
        acc, l, m, k, v, kv_valid = carry
        # rotate KV (and its validity mask) one step around the ring
        perm = [(j, (j + 1) % n) for j in range(n)]
        k = jax.lax.ppermute(k, axis_name, perm)
        v = jax.lax.ppermute(v, axis_name, perm)
        if kv_valid is not None:
            kv_valid = jax.lax.ppermute(kv_valid, axis_name, perm)
        a2, l2, m2 = _block_attention(q, k, v, scale, kv_valid)
        acc, l, m = _combine(acc, l, m, a2, l2, m2)
        return acc, l, m, k, v, kv_valid

    if kv_valid is None:
        def body_nomask(i, carry):
            acc, l, m, k, v = carry
            acc, l, m, k, v, _ = body(i, (acc, l, m, k, v, None))
            return acc, l, m, k, v

        acc, l, m, _, _ = jax.lax.fori_loop(
            0, n - 1, body_nomask, (acc, l, m, k, v)
        )
    else:
        acc, l, m, _, _, _ = jax.lax.fori_loop(
            0, n - 1, body, (acc, l, m, k, v, kv_valid)
        )
    return (acc / l).astype(q.dtype)


def make_sharded_temporal_attention(mesh: Mesh, axis_name: str = "frames"):
    """Returns attention(q, k, v, scale) over [B, F, H, D] with F sharded.

    Global-view function: inputs/outputs are global arrays sharded
    P(None, axis_name); internally shard_map + ring.
    """
    from jax import shard_map

    spec = P(None, axis_name)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, axis_name, None, None),) * 3,
        out_specs=P(None, axis_name, None, None),
    )
    def attn(q, k, v):
        return ring_attention(q, k, v, axis_name=axis_name)

    del spec
    return attn
