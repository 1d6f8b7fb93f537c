"""Temporal context windows: long-clip generation beyond the trained span.

The reference's capability ceiling is a fixed 16-frame clip (reference
experiments/05_grid_search_ablation.py:48 — ``num_frames`` is a constant;
the motion module was trained on short contexts, docs/02:69-82). This
module removes the ceiling *without retraining*: each denoise step
evaluates the denoiser on overlapping fixed-length frame windows and
blends the per-window predictions — temporal MultiDiffusion — optionally
with FreeNoise-style correlated initial noise so far-apart windows share
content (Qiu et al., "FreeNoise: Tuning-Free Longer Video Diffusion via
Noise Rescheduling", 2023).

TPU-first shape of the design:

  * Window starts are STATIC (computed from ``num_frames`` at trace time),
    so the whole thing lives inside the one jitted generate program — the
    per-step window loop is a ``lax.scan`` over a static-length start
    vector with ``dynamic_slice`` windows of static length.
  * Each window evaluation has exactly the memory/compute footprint of a
    trained-length forward (the shape the rest of the framework is tuned
    for), so 64-frame generation fits wherever 16-frame generation fits.
  * Blending is linear and happens on the PREDICTION (before CFG combine
    and the sampler update); weights are frame-position triangles
    ("pyramid") by default so window seams hand off smoothly.
  * Exactness contract: when one window covers the whole clip
    (num_frames <= frames) the wrapper is the identity — the pipeline
    bit-matches a context-free pipeline (tested).

Composition: stacks with skip turbo mode and variable_steps (both wrap the
same evaluation point). PAB and frame sharding are rejected at
construction — PAB's attention caches are sized per model call (each
window would clobber the last), and the frame-sharded denoiser owns the
frame axis layout.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ContextConfig:
    """Sliding-window schedule for long clips.

    ``frames`` should be the denoiser's trained temporal span (16 for the
    reference's motion adapter); ``stride`` < ``frames`` gives overlap for
    the blend. Frozen + hashable so it keys compiled-program caches.
    """

    #: window length — the temporal span each denoiser call sees
    frames: int = 16
    #: hop between window starts; overlap = frames - stride
    stride: int = 8
    #: per-frame blend weights inside a window: "pyramid" (triangular,
    #: center-weighted — smooth seam handoff) or "uniform"
    weights: str = "pyramid"
    #: FreeNoise initial noise: frames beyond the first window reuse the
    #: base window's noise frames under per-block shuffles, so overlapping
    #: windows denoise correlated noise (long-range content consistency)
    freenoise: bool = True

    def __post_init__(self):
        if self.frames < 2:
            raise ValueError("context frames must be >= 2")
        if not (0 < self.stride < self.frames):
            raise ValueError(
                "context stride must be in (0, frames) — windows must "
                "overlap to blend"
            )
        if self.weights not in ("pyramid", "uniform"):
            raise ValueError(f"unknown context weights {self.weights!r}")


def window_starts(total: int, frames: int, stride: int) -> tuple:
    """Static window start offsets covering [0, total).

    Regular hops of ``stride``; if the final hop overshoots, the last
    window is pinned to ``total - frames`` so coverage is exact (its
    overlap with the previous window simply grows).
    """
    if total < frames:
        raise ValueError(f"num_frames={total} < context window {frames}")
    starts = list(range(0, total - frames + 1, stride))
    if starts[-1] != total - frames:
        starts.append(total - frames)
    return tuple(starts)


def window_weights(frames: int, mode: str) -> np.ndarray:
    """[frames] fp32 blend weights. Absolute scale cancels (the blend
    divides by per-frame coverage), only the within-window profile matters."""
    if mode == "uniform":
        return np.ones((frames,), np.float32)
    # triangular: 1 at the edges rising to the center — a frame near a
    # window's edge defers to the neighbouring window that centers it
    half = (frames + 1) // 2
    ramp = np.arange(1, half + 1, dtype=np.float32)
    return np.concatenate([ramp, ramp[: frames - half][::-1]])


def make_windowed_apply(unet_apply, *, total_frames: int, out_channels: int,
                        cfg: ContextConfig):
    """Wrap a denoiser apply (params, x[B, F, H, W, Cin], t, *cond) so each
    call runs ``unet_apply`` per overlapping window and returns the
    weight-blended [B, F, H, W, out_channels] prediction in fp32.

    Identity (returns ``unet_apply``) when one window covers the clip.
    Conditioning args after (x, t) are passed through untouched — they are
    frame-independent for every supported family; per-frame channel
    conditioning (SVD's image-latent concat) rides ``x`` and is windowed
    with it.
    """
    starts = window_starts(total_frames, cfg.frames, cfg.stride)
    if len(starts) == 1:
        return unet_apply
    ctx = cfg.frames
    w = jnp.asarray(window_weights(ctx, cfg.weights))[None, :, None, None, None]

    def apply(params, x, t, *cond):
        acc_shape = x.shape[:4] + (out_channels,)
        cnt_shape = (1, total_frames, 1, 1, 1)

        def body(carry, s):
            acc, cnt = carry
            win = jax.lax.dynamic_slice_in_dim(x, s, ctx, axis=1)
            eps = unet_apply(params, win, t, *cond).astype(jnp.float32)
            acc_win = jax.lax.dynamic_slice_in_dim(acc, s, ctx, axis=1)
            acc = jax.lax.dynamic_update_slice_in_dim(
                acc, acc_win + eps * w, s, axis=1
            )
            cnt_win = jax.lax.dynamic_slice_in_dim(cnt, s, ctx, axis=1)
            cnt = jax.lax.dynamic_update_slice_in_dim(
                cnt, cnt_win + w, s, axis=1
            )
            return (acc, cnt), None

        init = (jnp.zeros(acc_shape, jnp.float32),
                jnp.zeros(cnt_shape, jnp.float32))
        (acc, cnt), _ = jax.lax.scan(body, init, jnp.asarray(starts))
        return acc / cnt

    return apply


def make_windowed_apply_sharded(unet_apply, *, total_frames: int,
                                out_channels: int, cfg: ContextConfig,
                                mesh, axis: str = "frames"):
    """Window-PARALLEL variant of ``make_windowed_apply``: the per-step
    windows shard over the mesh axis instead of running sequentially.

    Windows are independent denoiser evaluations on replicated latents, so
    this is embarrassingly parallel: each device scans its subset of the
    (statically padded) window list and the blend is a weighted ``psum``.
    The window count pads to the mesh axis with zero-weight dummy windows
    (start 0) — their contribution is an exact ``+ 0.0``.

    Exactness vs the sequential blend: the psum reorders the fp32
    accumulation across devices, but with the standard schedules every
    frame is covered by at most TWO windows (stride >= frames/2), and
    two-term fp32 addition is commutative bitwise — so the blended
    prediction matches the single-device context pipeline exactly
    (tested on the 8-device CPU mesh at 64 frames). Schedules with
    triple-covered frames may differ in the last ulp.

    This is the multi-chip story for clips past the trained span: plain
    frame sharding would hand the motion module a GLOBAL sequence longer
    than its trained context (PE max 32 — reference
    docs/02_video_diffusion_architecture.md:69-82), while here every
    evaluation stays at the trained window length.
    """
    import functools

    import jax
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    starts = window_starts(total_frames, cfg.frames, cfg.stride)
    if len(starts) == 1:
        return unet_apply
    n = mesh.shape[axis]
    ctx = cfg.frames
    w = jnp.asarray(window_weights(ctx, cfg.weights))[None, :, None, None, None]
    npad = (-len(starts)) % n
    starts_p = np.asarray(list(starts) + [0] * npad, np.int32).reshape(
        n, -1, order="F"  # round-robin: balances real windows across devices
    )
    valid_p = np.asarray(
        [1.0] * len(starts) + [0.0] * npad, np.float32
    ).reshape(n, -1, order="F")

    def apply(params, x, t, *cond):
        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(),) * (3 + len(cond)),
            out_specs=P(), check_vma=False,
        )
        def run(params, x, t, *cond):
            idx = jax.lax.axis_index(axis)
            my_starts = jnp.asarray(starts_p)[idx]
            my_valid = jnp.asarray(valid_p)[idx]
            acc_shape = x.shape[:4] + (out_channels,)
            cnt_shape = (1, total_frames, 1, 1, 1)

            def body(carry, sv):
                s, valid = sv
                acc, cnt = carry
                win = jax.lax.dynamic_slice_in_dim(x, s, ctx, axis=1)
                eps = unet_apply(params, win, t, *cond).astype(jnp.float32)
                wv = w * valid
                acc_win = jax.lax.dynamic_slice_in_dim(acc, s, ctx, axis=1)
                acc = jax.lax.dynamic_update_slice_in_dim(
                    acc, acc_win + eps * wv, s, axis=1
                )
                cnt_win = jax.lax.dynamic_slice_in_dim(cnt, s, ctx, axis=1)
                cnt = jax.lax.dynamic_update_slice_in_dim(
                    cnt, cnt_win + wv, s, axis=1
                )
                return (acc, cnt), None

            init = (jnp.zeros(acc_shape, jnp.float32),
                    jnp.zeros(cnt_shape, jnp.float32))
            (acc, cnt), _ = jax.lax.scan(body, init, (my_starts, my_valid))
            acc = jax.lax.psum(acc, axis)
            cnt = jax.lax.psum(cnt, axis)
            return acc / cnt

        return run(params, x, t, *cond)

    return apply


def make_freenoise_maker(latent_shape, ctx: int):
    """FreeNoise initial-noise builder matching ``_noise_maker``'s contract
    (single key for B=1, stacked [B, 2] keys vmapped for B>1; fp32 output).

    Frames [0, ctx) draw fresh noise; each subsequent ctx-length block is a
    frame-shuffled copy of the base block (truncated at num_frames). Every
    frame's marginal stays N(0, I) while far-apart windows share noise
    content — the "noise rescheduling" that keeps long clips coherent.
    """
    total = latent_shape[1]
    reps = math.ceil(total / ctx)

    def per_video(key):
        k_base, k_perm = jax.random.split(key)
        base = jax.random.normal(
            k_base, (ctx,) + tuple(latent_shape[2:]), jnp.float32
        )
        blocks = [base]
        for r in range(1, reps):
            k_perm, k = jax.random.split(k_perm)
            blocks.append(base[jax.random.permutation(k, ctx)])
        return jnp.concatenate(blocks, axis=0)[:total]

    if latent_shape[0] == 1:
        return lambda key: per_video(key)[None]
    return lambda keys: jax.vmap(per_video)(keys)
