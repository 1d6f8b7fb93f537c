"""Backward warping for warp-error measurement.

Replaces the reference's ``F.grid_sample(mode='bilinear',
padding_mode='border', align_corners=True)`` warp
(reference experiments/06_measure_grid_search.py:259-284) with
``jax.scipy.ndimage.map_coordinates(order=1, mode='nearest')`` — with
align_corners=True and unnormalised pixel coordinates the two are the same
operator: bilinear interpolation with edge-clamped sampling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def warp_frame(frame: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward-warp ``frame`` [H, W, C] by ``flow`` [H, W, 2] (dx, dy)."""
    H, W, C = frame.shape
    gy, gx = jnp.mgrid[0:H, 0:W]
    sx = gx.astype(jnp.float32) + flow[..., 0]
    sy = gy.astype(jnp.float32) + flow[..., 1]

    def sample_channel(ch):
        return jax.scipy.ndimage.map_coordinates(
            ch, [sy, sx], order=1, mode="nearest"
        )

    return jnp.stack(
        [sample_channel(frame[..., c].astype(jnp.float32)) for c in range(C)],
        axis=-1,
    )


@jax.jit
def warp_error_pairs(frames: jnp.ndarray, flows: jnp.ndarray) -> jnp.ndarray:
    """[F, H, W, C] frames + [F-1, H, W, 2] flows -> [F-1] warp MSE.

    warp_error[i] = MSE(warp(frame_i, flow_i), frame_{i+1})  (06:336-338)
    """

    def one(args):
        f1, f2, fl = args
        w = warp_frame(f1, fl)
        d = w - f2.astype(jnp.float32)
        return jnp.mean(d * d)

    return jax.lax.map(one, (frames[:-1], frames[1:], flows))
