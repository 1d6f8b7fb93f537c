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


class TestPreemptionSafety:
    """SURVEY §5's abort-and-rejoin contract for the BATCHED runner: a
    kill -9 mid-study must lose no committed experiment and re-run no
    committed one on restart (VERDICT r3 #6). The commit marker
    (config.json, written LAST via atomic tmp+rename) is the entire
    protocol; this test kills a real study subprocess with SIGKILL the
    moment the first markers land, then restarts and finishes."""

    SCRIPT = r"""
import os, signal, sys, threading, time
from pathlib import Path
sys.path.insert(0, sys.argv[3])
import jax
jax.config.update("jax_platforms", "cpu")
from vdx.core.dtypes import FP32_POLICY
from vdx.harness.batched import run_batched_experiments
from vdx.harness.config import ExperimentConfig
from vdx.models.clip_text import CLIPTextConfig
from vdx.models.unet_motion import UNetMotionConfig
from vdx.models.vae import VAEConfig
from vdx.pipelines import AnimateDiffPipeline

out = Path(sys.argv[1])
die_after = int(sys.argv[2])  # SIGKILL self once N markers exist (0 = run to completion)

cfgs = [
    ExperimentConfig(
        experiment_id=f"exp_{i}", video_name=f"v{i}", prompt=f"p {i}",
        negative_prompt="bad", guidance_scale=7.5, num_inference_steps=2,
        phase="cfg_ablation", seed=42 + i, num_frames=2, height=64, width=64,
    )
    for i in range(6)
]
pipe = AnimateDiffPipeline.with_random_params(
    seed=0, unet_config=UNetMotionConfig.tiny(), vae_config=VAEConfig.tiny(),
    text_config=CLIPTextConfig.tiny(), policy=FP32_POLICY, scheduler="ddim",
)
if die_after:
    def watcher():
        while True:
            n = len(list(out.glob("*/config.json")))
            if n >= die_after:
                os.kill(os.getpid(), signal.SIGKILL)
            time.sleep(0.05)
    threading.Thread(target=watcher, daemon=True).start()
run_batched_experiments(pipe, cfgs, out, scheduler="ddim", max_batch=2,
                        log=lambda *a: None)
print("STUDY_COMPLETE")
"""

    def test_kill9_restart_finishes_without_rework(self, tmp_path):
        import json
        import subprocess
        import sys

        repo = str(__import__("pathlib").Path(__file__).resolve().parents[1])
        script = tmp_path / "study.py"
        script.write_text(self.SCRIPT)
        out = tmp_path / "study_out"
        env = dict(
            __import__("os").environ,
            JAX_PLATFORMS="cpu",
        )
        env.pop("PALLAS_AXON_POOL_IPS", None)

        p1 = subprocess.run(
            [sys.executable, str(script), str(out), "2", repo],
            env=env, capture_output=True, text=True, timeout=900,
        )
        # SIGKILL'd mid-study: negative signal return code, partial output
        assert p1.returncode != 0
        assert "STUDY_COMPLETE" not in p1.stdout
        done1 = sorted(d.parent.name for d in out.glob("*/config.json"))
        assert 0 < len(done1) < 6, done1
        # every committed marker parses (atomic rename: no torn JSON)
        mtimes = {}
        for d in done1:
            with open(out / d / "config.json") as f:
                json.load(f)
            mtimes[d] = (out / d / "config.json").stat().st_mtime_ns
        # no leftover .tmp can shadow a marker
        assert not list(out.glob("*/config.json.tmp"))

        p2 = subprocess.run(
            [sys.executable, str(script), str(out), "0", repo],
            env=env, capture_output=True, text=True, timeout=900,
        )
        assert p2.returncode == 0, p2.stderr[-2000:]
        assert "STUDY_COMPLETE" in p2.stdout
        done2 = sorted(d.parent.name for d in out.glob("*/config.json"))
        assert done2 == [f"exp_{i}" for i in range(6)]
        # committed experiments were NOT regenerated (markers untouched)
        for d, m in mtimes.items():
            assert (out / d / "config.json").stat().st_mtime_ns == m, d
