"""Frame-sharded UNet execution — sequence parallelism for long clips.

Builds a shard_map-wrapped UNetMotion apply where the frame axis lives
sharded over the mesh's ``frames`` axis. Spatial/cross attention and convs
are frame-local (zero communication); ONLY the temporal blocks communicate —
via Ulysses all_to_all axis swaps (default) or ring attention, plus psum'd
GroupNorm stats and halo'd temporal convs in either mode (nn/temporal.py).
The resulting function takes GLOBAL arrays and runs each device on its
frame shard — memory per chip scales as F/n_frames_shards, the long-clip
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
    seq_impl: str = "ulysses",
    freeu=None,
):
    """Generic frame-sharded denoiser (any model with a ``temporal_impl`` knob).

    Returns (ring_model, sharded_apply) where sharded_apply takes
    (params, sample [B, F, ...], timestep, *conditioning) with F sharded
    over ``axis`` and everything else replicated.  ``n_conditioning`` is the
    number of replicated conditioning args after timestep (1 for text
    context; 2 for SVD's image_embeds + added_time_ids). ``pab`` builds the
    model with the attention-broadcast cache enabled (the pipeline then
    drives it through its own shard_map wrapper that threads the cache).

    ``seq_impl`` picks how the temporal transformers communicate:
      * ``"ulysses"`` (default) — two all_to_alls reshard positions<->frames
                        around each temporal block; sites whose positions
                        don't divide the mesh axis statically fall back to
                        the ring.
      * ``"ring"``    — per-attention KV rotation via ppermute.
    Both are exact vs local execution (tests/test_frame_parallel.py).
    Ulysses is the default because video temporal attention is short-seq /
    huge-batch, where the ring is badly comm-bound: at the SVD north-star
    shape (25f @576x1024, 8 chips) the ring moves 11.6 GB/device/forward
    (an 85% zero-overlap comm tax that alone would break the <10 s target)
    vs ulysses' 0.73 GB (10.6% tax) — scripts/comm_analysis.py, PERF.md
    round-3 "frame-sharded communication" section.
    """
    if seq_impl not in ("ring", "ulysses"):
        raise ValueError(f"unknown seq_impl {seq_impl!r}")
    kwargs = {"config": config, "attn_impl": attn_impl,
              "temporal_impl": f"{seq_impl}:{axis}"}
    if policy is not None:
        kwargs["policy"] = policy
    if pab:
        kwargs["pab"] = True
    if freeu is not None:
        # FreeU is frame-local (spatial FFT + channel scaling only), so it
        # composes with frame sharding with zero extra communication.
        kwargs["freeu"] = freeu
    model = denoiser_cls(**kwargs)

    specs = dict(
        in_specs=(P(), P(None, axis), P()) + (P(),) * n_conditioning,
        out_specs=P(None, axis),
    )
    variants = {}

    def _build(frames_valid):
        @functools.partial(
            shard_map, mesh=mesh, check_vma=False, **specs,
        )
        def _apply(params, sample, timestep, *conditioning):
            return model.apply(params, sample, timestep, *conditioning,
                               frames_valid=frames_valid)

        return _apply

    def sharded_apply(params, sample, timestep, *conditioning,
                      frames_valid=None):
        """``frames_valid`` (static int): ragged frame sharding — the GLOBAL
        sample's frame axis is zero-padded to divide the mesh axis and only
        the first ``frames_valid`` frames are real; the model masks padded
        slots out of every cross-frame op (nn/temporal.py). None = every
        frame is real (the divisible path, traced identically to before)."""
        fn = variants.get(frames_valid)
        if fn is None:
            fn = variants[frames_valid] = _build(frames_valid)
        return fn(params, sample, timestep, *conditioning)

    return model, sharded_apply


def make_frame_sharded_unet(
    config: UNetMotionConfig,
    mesh: Mesh,
    *,
    policy=None,
    axis: str = "frames",
    attn_impl: str = "auto",
    seq_impl: str = "ulysses",
):
    """Returns (ring_model, sharded_apply).

    sharded_apply(params, sample [B, F, H, W, C], t, context) -> eps, with
    F sharded over ``axis``; params and conditioning replicated.
    """
    return make_frame_sharded_denoiser(
        UNetMotion, config, mesh, policy=policy, axis=axis,
        attn_impl=attn_impl, seq_impl=seq_impl,
    )


def make_frame_sharded_svd_unet(
    config: SVDUNetConfig,
    mesh: Mesh,
    *,
    policy=None,
    axis: str = "frames",
    attn_impl: str = "auto",
    seq_impl: str = "ulysses",
):
    """Frame-sharded UNetSpatioTemporal (the SVD north-star denoiser).

    Returns (ring_model, sharded_apply) where
    sharded_apply(params, sample [B, F, H, W, 8], t, image_embeds,
    added_time_ids) -> eps with F sharded over ``axis``.  Communication:
    ring attention (or Ulysses all_to_alls, ``seq_impl``) in the temporal
    transformer blocks, 1-frame halo exchange in the 3x1x1 temporal
    resblock convs, pmean'd GroupNorm stats (exact vs local execution —
    tests/test_frame_parallel.py).
    """
    return make_frame_sharded_denoiser(
        UNetSpatioTemporal, config, mesh, policy=policy, axis=axis,
        attn_impl=attn_impl, n_conditioning=2, seq_impl=seq_impl,
    )
