"""Frame-sharded UNet execution — sequence parallelism for long clips.

Builds a shard_map-wrapped UNetMotion apply where the frame axis lives
sharded over the mesh's ``frames`` axis. Spatial/cross attention and convs
are frame-local (zero communication); the motion modules communicate via
ring attention + psum'd GroupNorm stats (nn/temporal.py ring mode). The
resulting function takes GLOBAL arrays and runs each device on its frame
shard — memory per chip scales as F/n_frames_shards, the long-clip
north star (SURVEY.md §5).

The ring model shares its parameter tree with the local model: the same
weights run sharded or not (verified by tests/test_frame_parallel.py).
"""

from __future__ import annotations

import functools

from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from vdx.models.unet_motion import UNetMotion, UNetMotionConfig


def make_frame_sharded_unet(
    config: UNetMotionConfig,
    mesh: Mesh,
    *,
    policy=None,
    axis: str = "frames",
    attn_impl: str = "auto",
):
    """Returns (ring_model, sharded_apply).

    sharded_apply(params, sample [B, F, H, W, C], t, context) -> eps, with
    F sharded over ``axis``; params and conditioning replicated.
    """
    kwargs = {"config": config, "attn_impl": attn_impl,
              "temporal_impl": f"ring:{axis}"}
    if policy is not None:
        kwargs["policy"] = policy
    model = UNetMotion(**kwargs)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(None, axis), P(), P()),
        out_specs=P(None, axis),
        check_vma=False,
    )
    def sharded_apply(params, sample, timestep, context):
        return model.apply(params, sample, timestep, context)

    return model, sharded_apply
