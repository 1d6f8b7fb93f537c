"""End-to-end pipeline tests on tiny configs (CPU, fp32)."""

import numpy as np
import pytest

from vdx.core.dtypes import FP32_POLICY
from vdx.models.clip_text import CLIPTextConfig
from vdx.models.unet_motion import UNetMotionConfig
from vdx.models.vae import VAEConfig
from vdx.pipelines import AnimateDiffPipeline


@pytest.fixture(scope="module")
def tiny_pipe():
    return AnimateDiffPipeline.with_random_params(
        seed=0,
        unet_config=UNetMotionConfig.tiny(),
        vae_config=VAEConfig.tiny(),
        text_config=CLIPTextConfig.tiny(),
        policy=FP32_POLICY,
    )


GEN_KWARGS = dict(
    num_frames=4, height=64, width=64, num_inference_steps=3, seed=42
)


class TestPipeline:
    def test_generates_frames(self, tiny_pipe):
        out = tiny_pipe("a corgi walking on the beach", output_type="np", **GEN_KWARGS)
        frames = out.frames[0]
        assert frames.shape == (4, 64, 64, 3)
        assert frames.dtype == np.uint8

    def test_determinism_same_seed(self, tiny_pipe):
        a = tiny_pipe("portrait", output_type="np", **GEN_KWARGS).frames[0]
        b = tiny_pipe("portrait", output_type="np", **GEN_KWARGS).frames[0]
        np.testing.assert_array_equal(a, b)

    def test_seed_changes_output(self, tiny_pipe):
        kw = dict(GEN_KWARGS)
        kw["seed"] = 7
        a = tiny_pipe("portrait", output_type="np", **GEN_KWARGS).frames[0]
        b = tiny_pipe("portrait", output_type="np", **kw).frames[0]
        assert not np.array_equal(a, b)

    def test_guidance_scale_changes_output(self, tiny_pipe):
        a = tiny_pipe("portrait", guidance_scale=7.5, output_type="np", **GEN_KWARGS).frames[0]
        b = tiny_pipe("portrait", guidance_scale=2.0, output_type="np", **GEN_KWARGS).frames[0]
        assert not np.array_equal(a, b)

    def test_prompt_changes_output(self, tiny_pipe):
        a = tiny_pipe("portrait of a man", output_type="np", **GEN_KWARGS).frames[0]
        b = tiny_pipe("birds flying across a blue sky", output_type="np", **GEN_KWARGS).frames[0]
        assert not np.array_equal(a, b)

    def test_all_schedulers_run(self, tiny_pipe):
        for sched in ["euler", "ddim", "dpm"]:
            out = tiny_pipe("portrait", scheduler=sched, output_type="np", **GEN_KWARGS)
            assert out.frames[0].shape == (4, 64, 64, 3)

    def test_device_output_matches_np(self, tiny_pipe):
        """output_type="device" leaves frames on device ([B,F,H,W,3] u8);
        materialising them matches the synchronous np path exactly."""
        dev = tiny_pipe("portrait", output_type="device", **GEN_KWARGS)
        ref = tiny_pipe("portrait", output_type="np", **GEN_KWARGS)
        got = np.asarray(dev.frames)
        assert got.shape == (1, 4, 64, 64, 3) and got.dtype == np.uint8
        np.testing.assert_array_equal(got[0], ref.frames[0])

    def test_pil_output(self, tiny_pipe):
        out = tiny_pipe("portrait", **GEN_KWARGS)
        frames = out.frames[0]
        assert len(frames) == 4
        assert frames[0].size == (64, 64)


class TestVariableSteps:
    def test_one_program_serves_multiple_step_counts(self):
        """variable_steps pipeline == per-step-count programs, numerically.

        The padded-tables + cond-skip program must reproduce the static
        program's output for every step count (and compile ONCE: the
        compiled-cache must hold a single var_generate entry afterwards)."""
        from vdx.core.dtypes import FP32_POLICY
        from vdx.models.clip_text import CLIPTextConfig
        from vdx.models.unet_motion import UNetMotionConfig
        from vdx.models.vae import VAEConfig
        from vdx.pipelines import AnimateDiffPipeline

        kw = dict(
            unet_config=UNetMotionConfig.tiny(),
            vae_config=VAEConfig.tiny(),
            text_config=CLIPTextConfig.tiny(),
            policy=FP32_POLICY,
        )
        static = AnimateDiffPipeline.with_random_params(seed=0, **kw)
        var = AnimateDiffPipeline.with_random_params(
            seed=0, variable_steps=4, **kw
        )
        gen = dict(num_frames=2, height=64, width=64, output_type="np")
        for scheduler in ("ddim", "euler"):
            for steps in (2, 3):
                a = static(
                    "portrait", num_inference_steps=steps, seed=9,
                    scheduler=scheduler, **gen,
                ).frames[0]
                b = var(
                    "portrait", num_inference_steps=steps, seed=9,
                    scheduler=scheduler, **gen,
                ).frames[0]
                diff = np.abs(a.astype(np.int16) - b.astype(np.int16))
                assert diff.max() <= 1, (scheduler, steps, diff.max())
        var_keys = [
            k for k in var._compiled
            if k[0] == "prog" and ("var", 4) in k
        ]
        assert len(var_keys) == 2  # one per scheduler, NOT per step count
