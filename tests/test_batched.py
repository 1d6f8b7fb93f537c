"""Batched experiment runner tests (tiny pipeline, CPU)."""

import numpy as np
import pytest

from vdx.core.dtypes import FP32_POLICY
from vdx.harness.batched import group_configs, run_batched_experiments
from vdx.harness.config import ExperimentConfig
from vdx.harness.grid import generate_video, save_experiment
from vdx.models.clip_text import CLIPTextConfig
from vdx.models.unet_motion import UNetMotionConfig
from vdx.models.vae import VAEConfig
from vdx.pipelines import AnimateDiffPipeline


def _cfg(i, cfg_scale=7.5, steps=2, seed=42):
    return ExperimentConfig(
        experiment_id=f"exp_{i}_cfg{cfg_scale}_steps{steps}",
        video_name=f"v{i}",
        prompt=f"prompt number {i}",
        negative_prompt="bad",
        guidance_scale=cfg_scale,
        num_inference_steps=steps,
        phase="cfg_ablation",
        seed=seed,
        num_frames=2,
        height=64,
        width=64,
    )


@pytest.fixture(scope="module")
def tiny_pipe():
    return AnimateDiffPipeline.with_random_params(
        seed=0,
        unet_config=UNetMotionConfig.tiny(),
        vae_config=VAEConfig.tiny(),
        text_config=CLIPTextConfig.tiny(),
        policy=FP32_POLICY,
        scheduler="ddim",
    )


class TestGrouping:
    def test_groups_by_steps_and_shape(self):
        cfgs = [_cfg(0, steps=2), _cfg(1, steps=3), _cfg(2, steps=2)]
        groups = group_configs(cfgs)
        assert len(groups) == 2
        sizes = {k[0]: len(g) for k, g in groups}
        assert sizes == {2: 2, 3: 1}


class TestBatchedRunner:
    def test_artifacts_and_resume(self, tiny_pipe, tmp_path):
        cfgs = [_cfg(0), _cfg(1, cfg_scale=9.0)]
        run_batched_experiments(
            tiny_pipe, cfgs, tmp_path, scheduler="ddim", log=lambda *a: None
        )
        for c in cfgs:
            assert (tmp_path / c.experiment_id / "config.json").exists()
            assert (tmp_path / c.experiment_id / "frames" / "frame_0000.png").exists()
        # resume: no-op
        run_batched_experiments(
            tiny_pipe, cfgs, tmp_path, scheduler="ddim", log=lambda *a: None
        )

    def test_matches_serial_runner(self, tiny_pipe, tmp_path):
        """Batched path must produce the same pixels as the serial path."""
        cfg = _cfg(7, cfg_scale=7.5, seed=11)

        serial_dir = tmp_path / "serial"
        frames = generate_video(tiny_pipe, cfg)
        save_experiment(frames, cfg, serial_dir)

        batched_dir = tmp_path / "batched"
        run_batched_experiments(
            tiny_pipe, [cfg], batched_dir, scheduler="ddim", log=lambda *a: None
        )

        from PIL import Image

        a = np.asarray(Image.open(serial_dir / cfg.experiment_id / "frames" / "frame_0000.png"))
        b = np.asarray(Image.open(batched_dir / cfg.experiment_id / "frames" / "frame_0000.png"))
        # vmap changes fp32 fusion order -> at most ±1 uint8 level on a
        # handful of pixels
        diff = np.abs(a.astype(int) - b.astype(int))
        assert diff.max() <= 1 and (diff > 0).mean() < 1e-3

    def test_honors_pipeline_sampler_config(self, tiny_pipe, tmp_path):
        """A pipeline with checkpoint-faithful sampler constants (e.g.
        v-prediction) must sample identically through the batched runner
        and the serial pipeline — the runner compiles its own program and
        previously used module defaults unconditionally."""
        from vdx.schedulers.common import ScheduleConfig
        from vdx.schedulers.ddim import DDIMConfig

        vpred = AnimateDiffPipeline(
            unet_config=UNetMotionConfig.tiny(),
            vae_config=VAEConfig.tiny(),
            text_config=CLIPTextConfig.tiny(),
            policy=FP32_POLICY,
            scheduler="ddim",
            sampler_configs={"ddim": DDIMConfig(
                schedule=ScheduleConfig(prediction_type="v_prediction")
            )},
        )
        vpred.params = tiny_pipe.params  # share weights, skip re-init
        cfg = _cfg(8, seed=13)

        serial_dir = tmp_path / "serial_vpred"
        save_experiment(generate_video(vpred, cfg), cfg, serial_dir)
        batched_dir = tmp_path / "batched_vpred"
        run_batched_experiments(
            vpred, [cfg], batched_dir, scheduler="ddim", log=lambda *a: None
        )

        from PIL import Image

        a = np.asarray(Image.open(
            serial_dir / cfg.experiment_id / "frames" / "frame_0000.png"))
        b = np.asarray(Image.open(
            batched_dir / cfg.experiment_id / "frames" / "frame_0000.png"))
        diff = np.abs(a.astype(int) - b.astype(int))
        # a WRONG schedule diverges by whole gray levels; vmap fusion
        # reordering under the v-pred math moves ~2% of pixels by 1 ULP
        assert diff.max() <= 1 and (diff > 0).mean() < 0.05
