"""Frame-axis halo exchange for temporal convolutions under frame sharding.

SVD-style temporal resblocks convolve over the frame axis with a size-3
zero-padded kernel (reference capability: diffusers TemporalResnetBlock used
by UNetSpatioTemporalConditionModel; see SURVEY.md §2b "Rebuild as").  When
the frame axis is sharded over a mesh axis, each shard needs its neighbours'
edge frames: a single ``ppermute`` each way fetches them over ICI.  Edge
shards receive zeros (``ppermute`` zero-fills unpaired destinations), which
reproduces the zero 'SAME' padding of the unsharded conv exactly — so a
VALID conv over the halo-padded local block equals the global conv.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def frame_halo_pad(
    x: jnp.ndarray, axis_name: str, halo: int = 1, frame_axis: int = 1
) -> jnp.ndarray:
    """Pad the local frame shard with ``halo`` frames from each neighbour.

    x: [..., F_local, ...] with the frame axis at ``frame_axis``.
    Returns the same array with F_local + 2*halo frames: left-neighbour tail,
    local frames, right-neighbour head.  Global-edge shards get zeros, i.e.
    the zero-padding of a 'SAME' temporal conv.
    """
    n = jax.lax.axis_size(axis_name)
    if n == 1:
        pad = [(0, 0)] * x.ndim
        pad[frame_axis] = (halo, halo)
        return jnp.pad(x, pad)
    tail = jax.lax.slice_in_dim(
        x, x.shape[frame_axis] - halo, x.shape[frame_axis], axis=frame_axis
    )
    head = jax.lax.slice_in_dim(x, 0, halo, axis=frame_axis)
    # non-circular perms: shard 0 / shard n-1 receive zeros at the open edge
    from_left = jax.lax.ppermute(
        tail, axis_name, [(i, i + 1) for i in range(n - 1)]
    )
    from_right = jax.lax.ppermute(
        head, axis_name, [(i + 1, i) for i in range(n - 1)]
    )
    return jnp.concatenate([from_left, x, from_right], axis=frame_axis)
