"""FreeU — training-free re-weighting of UNet backbone/skip features.

Si et al. 2023, "FreeU: Free Lunch in Diffusion U-Net": in the first two
(lowest-resolution) up stages, amplify the backbone half of the channel
split (the denoising "content" path) and damp the low-frequency band of
the skip connection (the high-frequency "detail" path) — measurably
better frame quality with ZERO extra parameters or model evaluations.

Capability analogue of diffusers' ``pipe.enable_freeu(s1, s2, b1, b2)``
on the pipelines the reference drives (reference
experiments/01_baseline_generation.py:69-73 loads the diffusers
AnimateDiff pipeline whose UNet carries this surface). TPU-native form:
a frozen config on the Flax module, applied inside the jitted forward —
the FFT filter runs in fp32 over the (H, W) axes of the NHWC skip tensor
and XLA fuses the surrounding scaling into the up-block concat.

Weight-independent mechanics (pure feature-space transform), so the
identity cases (b=1, s=1) are exactly testable without real checkpoints.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class FreeUConfig:
    """Stage-0 / stage-1 backbone gains (b1, b2) and skip low-frequency
    scales (s1, s2). Defaults are the published SD-1.5 recommendation."""

    b1: float = 1.5
    b2: float = 1.6
    s1: float = 0.9
    s2: float = 0.2


def fourier_filter(x: jnp.ndarray, threshold: int, scale: float) -> jnp.ndarray:
    """Scale the centered low-frequency box of a [N, H, W, C] feature map.

    FFT over the spatial axes in fp32 (the filter is numerically delicate
    and cheap — it runs on the two smallest feature maps only), scale the
    (2*threshold)^2 box around the zero-frequency bin after fftshift, and
    invert. Returns x's dtype. A static scale of exactly 1.0 is the
    identity and short-circuits before the FFT, so identity configs
    reproduce the plain program bit-for-bit.
    """
    if float(scale) == 1.0:
        return x
    x32 = x.astype(jnp.float32)
    xf = jnp.fft.fftshift(jnp.fft.fft2(x32, axes=(1, 2)), axes=(1, 2))
    _, H, W, _ = x.shape
    crow, ccol = H // 2, W // 2
    rows = jnp.arange(H)
    cols = jnp.arange(W)
    in_row = (rows >= crow - threshold) & (rows < crow + threshold)
    in_col = (cols >= ccol - threshold) & (cols < ccol + threshold)
    mask = jnp.where(in_row[:, None] & in_col[None, :], scale, 1.0)
    xf = xf * mask[None, :, :, None]
    out = jnp.fft.ifft2(jnp.fft.ifftshift(xf, axes=(1, 2)), axes=(1, 2)).real
    return out.astype(x.dtype)


def apply_freeu(
    stage_idx: int,
    x: jnp.ndarray,
    skip: jnp.ndarray,
    cfg: FreeUConfig,
) -> tuple:
    """FreeU transform for one up-block (backbone x, skip) pair.

    Only the first two up stages are touched (the published method);
    later stages pass through untouched. Static Python branch — stage_idx
    is a trace-time constant, so disabled stages add nothing to the HLO.
    """
    if stage_idx == 0:
        b, s = cfg.b1, cfg.s1
    elif stage_idx == 1:
        b, s = cfg.b2, cfg.s2
    else:
        return x, skip
    half = x.shape[-1] // 2
    if float(b) != 1.0:
        x = jnp.concatenate([x[..., :half] * jnp.asarray(b, x.dtype),
                             x[..., half:]], axis=-1)
    return x, fourier_filter(skip, threshold=1, scale=s)
