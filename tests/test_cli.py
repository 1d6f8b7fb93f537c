"""Experiment CLI smoke tests — run the real scripts end to end (tiny)."""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


def run_cli(script, *args, timeout=600):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # the sitecustomize overrides JAX_PLATFORMS via jax.config; neutralise by
    # running through a stub that forces cpu before anything imports jax
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        f"import sys; sys.argv = [{script.name!r}] + {list(args)!r};"
        f"p = {str(script)!r};"
        "exec(compile(open(p).read(), p, 'exec'),"
        " {'__file__': p, '__name__': '__main__'})"
    )
    return subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=timeout,
    )


class TestExperimentCLIs:
    def test_02_inspection(self):
        r = run_cli(REPO / "experiments" / "02_architecture_inspection.py", "--tiny")
        assert r.returncode == 0, r.stderr[-2000:]
        assert "Total parameters" in r.stdout

    def test_03_trace(self, tmp_path):
        r = run_cli(
            REPO / "experiments" / "03_trace_forward_pass.py", "--tiny",
            "--output", str(tmp_path),
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert "ATTENTION MODULE ANALYSIS" in r.stdout
        assert (tmp_path / "unet_trace.txt").exists()

    def test_07_08_analysis_on_oracle(self, tmp_path, reference_root):
        src = reference_root / "outputs/06_grid_search_metrics/grid_search_results.json"
        r = run_cli(
            REPO / "experiments" / "07_analyze_grid_search.py",
            "--input", str(src), "--output", str(tmp_path / "a7"),
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert (tmp_path / "a7" / "optimal_values_summary.csv").exists()

        r = run_cli(
            REPO / "experiments" / "08_analyze_comprehensive.py",
            "--input", str(src), "--output", str(tmp_path / "a8"),
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert (tmp_path / "a8" / "recommendations.csv").exists()

    def test_05_06_grid_and_measure_tiny(self, tmp_path):
        """Tiny end-to-end: generate 2 experiments, measure them, check JSON."""
        r = run_cli(
            REPO / "experiments" / "05_grid_search_ablation.py",
            "--tiny", "--yes", "--video", "portrait", "--phase", "prompt",
            "--output", str(tmp_path / "grid"),
            timeout=900,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert (tmp_path / "grid" / "manifest.json").exists()

        r = run_cli(
            REPO / "experiments" / "06_measure_grid_search.py",
            "--input", str(tmp_path / "grid"),
            "--output", str(tmp_path / "metrics"),
            timeout=900,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        results = json.loads(
            (tmp_path / "metrics" / "grid_search_results.json").read_text()
        )
        assert len(results) == 2
        assert all("temporal_consistency_score" in rec for rec in results)

    def test_01_baseline_with_checkpoint(self, tmp_path):
        """--checkpoint: an Orbax dir (as scripts/convert_checkpoint.py
        writes) drives the baseline CLI instead of random init."""
        import jax

        jax.config.update("jax_platforms", "cpu")
        from vdx.core.dtypes import FP32_POLICY
        from vdx.models.clip_text import CLIPTextConfig
        from vdx.models.unet_motion import UNetMotionConfig
        from vdx.models.vae import VAEConfig
        from vdx.pipelines import AnimateDiffPipeline

        pipe = AnimateDiffPipeline.with_random_params(
            seed=7,
            unet_config=UNetMotionConfig.tiny(),
            vae_config=VAEConfig.tiny(),
            text_config=CLIPTextConfig.tiny(),
            policy=FP32_POLICY,
        )
        ckpt = tmp_path / "ckpt"
        pipe.save_checkpoint(ckpt)

        r = run_cli(
            REPO / "experiments" / "01_baseline_generation.py",
            "--tiny", "--checkpoint", str(ckpt),
            "--output", str(tmp_path / "out"),
            timeout=900,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        gifs = list((tmp_path / "out").glob("*.gif"))
        assert len(gifs) == 6  # the six reference prompts


class TestPackageCLI:
    """The installed-package `vdx` console command (vdx/cli.py,
    pyproject [project.scripts]) — package-native counterparts of the
    reference's `python experiments/NN_*.py` invocations."""

    def test_help_lists_commands(self):
        from vdx import cli

        assert cli.main([]) == 0
        assert cli.main(["nope"]) == 2

    def test_generate_tiny_long_clip(self, tmp_path):
        """`vdx generate --tiny --context 4` — the long-clip surface from
        the console (6 frames through a 4-frame window)."""
        from vdx import cli

        rc = cli.main([
            "generate", "a corgi", "--tiny", "--num-frames", "6",
            "--steps", "2", "--height", "64", "--width", "64",
            "--context", "4", "--output", str(tmp_path),
        ])
        assert rc == 0
        assert (tmp_path / "video.gif").exists()
        assert len(list((tmp_path / "frames").glob("*.png"))) == 6

    def test_analyze_routes_to_basic(self, tmp_path, reference_root):
        from vdx import cli

        src = (reference_root /
               "outputs/06_grid_search_metrics/grid_search_results.json")
        rc = cli.main(["analyze", "--input", str(src),
                       "--output", str(tmp_path)])
        assert rc == 0
        assert list(tmp_path.glob("*.csv"))

    def test_train_full_then_lora(self, tmp_path):
        """`vdx train --tiny` — the fine-tuning loop from the console:
        clips -> VAE latents -> train steps -> Orbax checkpoint (full UNet
        with EMA; then a rank-4 LoRA adapter)."""
        import numpy as np
        from PIL import Image

        from vdx import cli

        data = tmp_path / "clips"
        rng = np.random.default_rng(0)
        for name, n in [("vid_a", 6), ("vid_b", 8)]:
            d = data / name
            d.mkdir(parents=True)
            for i in range(n):
                arr = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
                Image.fromarray(arr).save(d / f"frame_{i:03d}.png")

        common = ["--data", str(data), "--tiny", "--batch", "2",
                  "--clip-frames", "4", "--size", "64", "--warmup", "1",
                  "--log-every", "1"]
        rc = cli.main(["train", *common, "--steps", "3", "--ema", "0.99",
                       "--accum", "2", "--remat",
                       "--out", str(tmp_path / "full")])
        assert rc == 0
        assert (tmp_path / "full" / "checkpoint").is_dir()
        assert (tmp_path / "full" / "ema").is_dir()

        rc = cli.main(["train", *common, "--steps", "2", "--lora", "4",
                       "--out", str(tmp_path / "lora_run")])
        assert rc == 0
        assert (tmp_path / "lora_run" / "lora").is_dir()
