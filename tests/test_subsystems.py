"""Checkpoint, logging, distributed-health subsystem tests."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        from vdx.core.checkpoint import load_params, save_params

        params = {
            "layer": {"kernel": jnp.arange(12.0).reshape(3, 4), "bias": jnp.ones(4)},
            "scale": jnp.asarray(2.5),
        }
        p = save_params(params, tmp_path / "ckpt")
        restored = load_params(p, template=params)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            params,
            restored,
        )


class TestPipelineCheckpoint:
    def test_save_load_roundtrip_generation(self, tmp_path):
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
            scheduler="ddim",
        )
        pipe = AnimateDiffPipeline.with_random_params(seed=3, **kw)
        gen = dict(num_frames=2, height=64, width=64, num_inference_steps=2,
                   seed=9, output_type="np")
        ref = pipe("portrait", **gen).frames[0]

        pipe.save_checkpoint(tmp_path / "ckpt")

        pipe2 = AnimateDiffPipeline(**kw)
        pipe2.params = pipe2.init_params(seed=999)  # different weights
        pipe2.load_checkpoint(tmp_path / "ckpt")
        got = pipe2("portrait", **gen).frames[0]
        np.testing.assert_array_equal(ref, got)


class TestEventLog:
    def test_json_lines(self, tmp_path):
        from vdx.utils.logging import EventLog

        log = EventLog(tmp_path / "events.jsonl", echo=False)
        log.log("step", step=1, loss=0.5)
        with log.span("phase", stage="denoise"):
            pass
        lines = [json.loads(l) for l in (tmp_path / "events.jsonl").read_text().splitlines()]
        assert lines[0]["event"] == "step" and lines[0]["loss"] == 0.5
        assert lines[1]["event"] == "phase" and "seconds" in lines[1]


class TestDistributed:
    def test_single_host_noop_and_health(self):
        from vdx.parallel.distributed import health_check, initialize

        initialize()  # single-process no-op
        assert health_check() == jax.device_count()
