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

from vdx.models.svd_unet import SVDUNetConfig, UNetSpatioTemporal
from vdx.models.unet_motion import UNetMotion, UNetMotionConfig


def make_frame_sharded_denoiser(
    denoiser_cls,
    config,
    mesh: Mesh,
    *,
    policy=None,
    axis: str = "frames",
    attn_impl: str = "auto",
    n_conditioning: int = 1,
    pab: bool = False,
):
    """Generic frame-sharded denoiser (any model with a ``temporal_impl`` knob).

    Returns (ring_model, sharded_apply) where sharded_apply takes
    (params, sample [B, F, ...], timestep, *conditioning) with F sharded
    over ``axis`` and everything else replicated.  ``n_conditioning`` is the
    number of replicated conditioning args after timestep (1 for text
    context; 2 for SVD's image_embeds + added_time_ids). ``pab`` builds the
    model with the attention-broadcast cache enabled (the pipeline then
    drives it through its own shard_map wrapper that threads the cache).
    """
    kwargs = {"config": config, "attn_impl": attn_impl,
              "temporal_impl": f"ring:{axis}"}
    if policy is not None:
        kwargs["policy"] = policy
    if pab:
        kwargs["pab"] = True
    model = denoiser_cls(**kwargs)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(None, axis), P()) + (P(),) * n_conditioning,
        out_specs=P(None, axis),
        check_vma=False,
    )
    def sharded_apply(params, sample, timestep, *conditioning):
        return model.apply(params, sample, timestep, *conditioning)

    return model, sharded_apply


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
    return make_frame_sharded_denoiser(
        UNetMotion, config, mesh, policy=policy, axis=axis, attn_impl=attn_impl
    )


def make_frame_sharded_svd_unet(
    config: SVDUNetConfig,
    mesh: Mesh,
    *,
    policy=None,
    axis: str = "frames",
    attn_impl: str = "auto",
):
    """Frame-sharded UNetSpatioTemporal (the SVD north-star denoiser).

    Returns (ring_model, sharded_apply) where
    sharded_apply(params, sample [B, F, H, W, 8], t, image_embeds,
    added_time_ids) -> eps with F sharded over ``axis``.  Communication:
    ring attention in the temporal transformer blocks, 1-frame halo
    exchange in the 3x1x1 temporal resblock convs, pmean'd GroupNorm stats
    (exact vs local execution — tests/test_frame_parallel.py).
    """
    return make_frame_sharded_denoiser(
        UNetSpatioTemporal, config, mesh, policy=policy, axis=axis,
        attn_impl=attn_impl, n_conditioning=2,
    )
