"""vdx — a TPU-native (JAX / XLA / Pallas / pjit) video-diffusion framework.

Rebuilds, from scratch and TPU-first, the full capability surface of the
reference experiments repo (tanm-ast/video-diffusion-experiments): the
AnimateDiff-style text-to-video generation pipeline (CLIP text encoder,
SD-1.5 UNet + temporal motion modules, KL VAE, DDIM/Euler samplers,
classifier-free guidance), the grid-search experiment harness, the
temporal-consistency metrics engine, the pandas analysis layer, and the
forward-pass tracing utility.

Layer map (mirrors reference SURVEY.md §1, reimagined for TPU):
  L5 analysis/     — pandas sweeps, win counts, recommendations
  L4 metrics/      — MSE/PSNR/LPIPS/flow/warp/flicker, jit-batched on device
  L3 harness/      — grid-search runner, config.json commit-marker resume
  L2 pipelines/    — jitted lax.scan denoise loop, CFG batched into one forward
  L1 models/       — Flax CLIP text tower, UNetMotion, AutoencoderKL
  L0 tracing/      — intermediate-capture tracer + jax.profiler hooks
  kernels/         — Pallas TPU kernels (flash attention, fused GroupNorm-SiLU)
  parallel/        — jax.sharding Mesh (data, frames, tensor) over ICI/DCN
"""

__version__ = "0.1.0"

from vdx import core  # noqa: F401
