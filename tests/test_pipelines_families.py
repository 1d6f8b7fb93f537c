"""End-to-end smoke for the other model-family pipelines (tiny, CPU).

Every family inheriting the base ``__call__`` must expose the full surface:
text-to-video, video2video (SDEdit), and LoRA load/unload.
"""

import numpy as np
import pytest

from vdx.core.dtypes import FP32_POLICY
from vdx.core.lora import init_lora
from vdx.models.clip_text import CLIPTextConfig
from vdx.models.dit import LatteConfig
from vdx.models.unet3d import UNet3DConfig
from vdx.models.vae import VAEConfig
from vdx.pipelines import LattePipeline, TextToVideoMSPipeline

GEN = dict(num_frames=4, height=64, width=64, num_inference_steps=2, seed=42,
           output_type="np")


@pytest.fixture(scope="module")
def ms_pipe():
    return TextToVideoMSPipeline.with_random_params(
        seed=0,
        unet_config=UNet3DConfig.tiny(),
        vae_config=VAEConfig.tiny(),
        text_config=CLIPTextConfig.tiny(),
        policy=FP32_POLICY,
    )


@pytest.fixture(scope="module")
def latte_pipe():
    return LattePipeline.with_random_params(
        seed=0,
        unet_config=LatteConfig.tiny(),
        vae_config=VAEConfig.tiny(),
        text_config=CLIPTextConfig.tiny(),
        policy=FP32_POLICY,
    )


def _clip(seed=0):
    return np.random.default_rng(seed).integers(
        0, 256, (4, 64, 64, 3), dtype=np.uint8
    )


def _randomize_b(lora, seed=5):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    return {
        p: {"a": s["a"],
            "b": jnp.asarray(
                rng.standard_normal(s["b"].shape, np.float32) * 0.1)}
        for p, s in lora.items()
    }


class TestTextToVideoMS:
    def test_generates(self, ms_pipe):
        out = ms_pipe("a corgi on the beach", **GEN)
        frames = out.frames[0]
        assert frames.shape == (4, 64, 64, 3)
        out2 = ms_pipe("a corgi on the beach", **GEN)
        np.testing.assert_array_equal(frames, out2.frames[0])

    def test_video2video(self, ms_pipe):
        vid = _clip()
        a = ms_pipe("a corgi", video=vid, strength=0.5, **GEN).frames[0]
        assert a.shape == (4, 64, 64, 3) and a.dtype == np.uint8
        b = ms_pipe("a corgi", video=vid, strength=1.0, **GEN).frames[0]
        assert not np.array_equal(a, b)

    def test_lora_surface(self, ms_pipe):
        base = ms_pipe("a corgi on the beach", **GEN).frames[0]
        ms_pipe.load_lora(_randomize_b(init_lora(ms_pipe.params["unet"],
                                                 rank=2)))
        assert not np.array_equal(
            base, ms_pipe("a corgi on the beach", **GEN).frames[0]
        )
        ms_pipe.unload_lora()
        np.testing.assert_array_equal(
            base, ms_pipe("a corgi on the beach", **GEN).frames[0]
        )


class TestLatte:
    def test_generates(self, latte_pipe):
        out = latte_pipe("birds flying", **GEN)
        assert out.frames[0].shape == (4, 64, 64, 3)

    def test_video2video(self, latte_pipe):
        vid = _clip(seed=3)
        a = latte_pipe("birds flying", video=vid, strength=0.5,
                       **GEN).frames[0]
        assert a.shape == (4, 64, 64, 3) and a.dtype == np.uint8
        b = latte_pipe("birds flying", video=_clip(seed=4), strength=0.5,
                       **GEN).frames[0]
        assert not np.array_equal(a, b)

    def test_lora_surface(self, latte_pipe):
        base = latte_pipe("birds flying", **GEN).frames[0]
        latte_pipe.load_lora(_randomize_b(init_lora(
            latte_pipe.params["unet"], rank=2)))
        assert not np.array_equal(
            base, latte_pipe("birds flying", **GEN).frames[0]
        )
        latte_pipe.unload_lora()
        np.testing.assert_array_equal(
            base, latte_pipe("birds flying", **GEN).frames[0]
        )
