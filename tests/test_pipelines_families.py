"""End-to-end smoke for the other model-family pipelines (tiny, CPU)."""

import numpy as np
import pytest

from vdx.core.dtypes import FP32_POLICY
from vdx.models.clip_text import CLIPTextConfig
from vdx.models.dit import LatteConfig
from vdx.models.unet3d import UNet3DConfig
from vdx.models.vae import VAEConfig
from vdx.pipelines import LattePipeline, TextToVideoMSPipeline

GEN = dict(num_frames=4, height=64, width=64, num_inference_steps=2, seed=42,
           output_type="np")


class TestTextToVideoMS:
    def test_generates(self):
        pipe = TextToVideoMSPipeline.with_random_params(
            seed=0,
            unet_config=UNet3DConfig.tiny(),
            vae_config=VAEConfig.tiny(),
            text_config=CLIPTextConfig.tiny(),
            policy=FP32_POLICY,
        )
        out = pipe("a corgi on the beach", **GEN)
        frames = out.frames[0]
        assert frames.shape == (4, 64, 64, 3)
        out2 = pipe("a corgi on the beach", **GEN)
        np.testing.assert_array_equal(frames, out2.frames[0])


class TestLatte:
    def test_generates(self):
        pipe = LattePipeline.with_random_params(
            seed=0,
            unet_config=LatteConfig.tiny(),
            vae_config=VAEConfig.tiny(),
            text_config=CLIPTextConfig.tiny(),
            policy=FP32_POLICY,
        )
        out = pipe("birds flying", **GEN)
        assert out.frames[0].shape == (4, 64, 64, 3)
