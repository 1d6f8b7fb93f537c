"""Harness tests: plan, artifact contract, resume, manifest, tracing."""

import json

import numpy as np
import pytest

from vdx.core.init import fast_init

from vdx.harness.config import TEST_VIDEOS, ExperimentConfig
from vdx.harness.grid import (
    generate_manifest,
    plan_grid_search,
    run_grid_search,
    save_experiment,
)


class FakePipe:
    """Counts calls; returns deterministic tiny frames."""

    def __init__(self):
        self.calls = 0

    def __call__(self, **kwargs):
        self.calls += 1
        from PIL import Image

        class Out:
            frames = [
                [
                    Image.fromarray(
                        np.full((8, 8, 3), (i * 37) % 255, dtype=np.uint8)
                    )
                    for i in range(kwargs["num_frames"])
                ]
            ]

        return Out()


class TestPlan:
    def test_full_grid_is_78_unique(self):
        """84 planned configs; cfg7.5_steps25 overlaps both sweeps -> 78
        unique experiments, the reference's published count."""
        cfgs = plan_grid_search("all")
        assert len(cfgs) == 84
        assert len({c.experiment_id for c in cfgs}) == 78

    def test_phases(self):
        assert len(plan_grid_search("cfg")) == 36
        assert len(plan_grid_search("steps")) == 36
        assert len(plan_grid_search("prompt")) == 12

    def test_video_filter(self):
        cfgs = plan_grid_search("all", video_filter="portrait")
        assert len(cfgs) == 14 and len({c.experiment_id for c in cfgs}) == 13
        assert all(c.video_name == "portrait" for c in cfgs)

    def test_experiment_ids_match_reference_format(self):
        ids = {c.experiment_id for c in plan_grid_search("all")}
        # spot-check against committed reference experiment dirs
        assert "portrait_cfg7.5_steps25" in ids
        assert "birds_flying_cfg9.0_steps25" in ids
        assert "woman_waving_cfg7.5_steps25_prompt_enhanced" in ids
        assert "landscape_cfg7.5_steps15" in ids


class TestRunner:
    def test_artifacts_and_resume(self, tmp_path):
        pipe = FakePipe()
        run_grid_search(
            pipe, phase="prompt", video_filter="portrait", output_dir=tmp_path,
            log=lambda *a: None,
        )
        exp_dir = tmp_path / "portrait_cfg7.5_steps25_prompt_baseline"
        assert (exp_dir / "config.json").exists()
        assert (exp_dir / "frames" / "frame_0000.png").exists()
        assert (exp_dir / "portrait_cfg7.5_steps25_prompt_baseline.gif").exists()
        n_first = pipe.calls
        # resume: second run generates nothing
        run_grid_search(
            pipe, phase="prompt", video_filter="portrait", output_dir=tmp_path,
            log=lambda *a: None,
        )
        assert pipe.calls == n_first

        cfg = ExperimentConfig.load(exp_dir / "config.json")
        assert cfg.guidance_scale == 7.5
        assert cfg.seed == 42

    def test_manifest(self, tmp_path):
        pipe = FakePipe()
        run_grid_search(
            pipe, phase="prompt", video_filter="landscape", output_dir=tmp_path,
            log=lambda *a: None,
        )
        manifest = generate_manifest(tmp_path)
        assert len(manifest["experiments"]) == 2
        assert manifest["grid_params"]["default_cfg"] == 7.5
        on_disk = json.loads((tmp_path / "manifest.json").read_text())
        assert on_disk == manifest


class TestConfigJSON:
    def test_round_trip_matches_reference_schema(self, tmp_path, reference_root):
        """Our config.json fields must equal the committed reference ones."""
        ref_cfg = json.loads(
            (
                reference_root
                / "outputs/05_grid_search/portrait_cfg7.5_steps25/config.json"
            ).read_text()
        )
        ours = ExperimentConfig(
            experiment_id="x", video_name="v", prompt="p", negative_prompt="n",
            guidance_scale=7.5, num_inference_steps=25, phase="cfg_ablation",
        )
        import dataclasses

        assert set(dataclasses.asdict(ours).keys()) == set(ref_cfg.keys())


class TestTracer:
    def test_traces_tiny_unet(self):
        import jax
        import jax.numpy as jnp

        from vdx.core.dtypes import FP32_POLICY
        from vdx.models.unet_motion import UNetMotion, UNetMotionConfig
        from vdx.tracing.tracer import AttentionTracer, ForwardTracer

        cfg = UNetMotionConfig.tiny()
        model = UNetMotion(cfg, policy=FP32_POLICY)
        sample = jnp.zeros((1, 2, 16, 16, 4))
        t = jnp.asarray([500])
        ctx = jnp.zeros((1, 7, cfg.cross_attention_dim))
        params = fast_init(model, sample, t, ctx, seed=0)

        tracer = ForwardTracer(model, trace_depth=2)
        out = tracer.trace(params, sample, t, ctx)
        assert out.shape == sample.shape
        assert len(tracer.traces) > 10
        assert tracer.execution_order == sorted(
            tracer.execution_order, key=lambda n: tracer.traces[n].execution_order
        )
        # The motion-module interleave is visible in execution order
        names = " ".join(tracer.execution_order)
        assert "motion" in names and "resnet" in names

        at = AttentionTracer(model)
        at.trace(params, sample, t, ctx)
        assert all(
            "attn" in n.lower() or "attention" in at.traces[n].class_name.lower()
            for n in at.traces
        )
        assert len(at.traces) > 0

    def test_report_files(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from vdx.core.dtypes import FP32_POLICY
        from vdx.nn.temporal import TemporalTransformer3D
        from vdx.tracing.tracer import ForwardTracer

        model = TemporalTransformer3D(heads=2, policy=FP32_POLICY)
        x = jnp.zeros((2, 4, 4, 16))
        params = fast_init(model, x, 2, seed=0)
        tracer = ForwardTracer(model)
        tracer.trace(params, x, 2)
        p1 = tracer.save_report(tmp_path / "trace.txt")
        p2 = tracer.save_json(tmp_path / "trace.json")
        assert p1.read_text().startswith("Forward trace")
        d = json.loads(p2.read_text())
        assert d["num_modules"] == len(tracer.traces)


class TestFrameIO:
    def test_gif_preserves_frames_and_colors(self, tmp_path):
        """Shared-palette GIF export: every frame written (no PIL
        duplicate-merge), and colours appearing only in LATER frames
        survive quantisation (palette sampled from the whole clip)."""
        from PIL import Image

        from vdx.io.frames import export_to_gif

        # solid-colour frames incl. a colour absent from frame 0
        fills = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
        frames = [np.full((16, 16, 3), f, dtype=np.uint8) for f in fills]
        p = export_to_gif(frames, tmp_path / "v.gif")
        im = Image.open(p)
        assert im.n_frames == len(fills)
        for i, fill in enumerate(fills):
            im.seek(i)
            got = np.asarray(im.convert("RGB"))[0, 0]
            assert np.abs(got.astype(int) - np.array(fill)).max() <= 8

    def test_gif_accepts_pil_and_numpy(self, tmp_path):
        from PIL import Image

        from vdx.io.frames import export_to_gif

        arr = np.zeros((8, 8, 3), np.uint8)
        export_to_gif([arr, arr + 100], tmp_path / "a.gif")
        export_to_gif([Image.fromarray(arr), Image.fromarray(arr + 100)],
                      tmp_path / "b.gif")
        assert (tmp_path / "a.gif").exists() and (tmp_path / "b.gif").exists()
