"""Metrics engine tests — golden values from the reference's committed data.

The strongest oracle in the reference tree (SURVEY.md §4): the committed
frame PNGs under outputs/05_grid_search/ and the metric JSONs under
outputs/06_grid_search_metrics/ produced by the reference's own engine. Our
engine must reproduce those numbers from the same pixels.
"""

import json

import numpy as np
import pytest

from vdx.metrics.engine import load_frames, measure_video
from vdx.metrics.farneback import calc_flow, flow_stats
from vdx.metrics.lpips import LPIPSMetric
from vdx.metrics.temporal import (
    basic_metrics,
    flicker_index,
    mse_pairs,
    psnr_from_mse,
    temporal_consistency_score,
)
from vdx.metrics.warp import warp_error_pairs, warp_frame

import jax.numpy as jnp

# Span the content/config space: low-motion portrait (mean flow 0.31 px),
# two high-motion birds configs (6+ px — large-motion flow numerics behave
# differently through the pyramid), and a steps-phase experiment so the
# sample isn't all cfg-phase. The FULL 78-record dataset is covered by
# tests/test_oracle_parity.py; this is the fast-tier sample.
EXPERIMENTS = [
    "portrait_cfg7.5_steps25",
    "birds_flying_cfg9.0_steps25",
    "birds_flying_cfg5.0_steps25",
    "portrait_cfg7.5_steps15",
]
# experiment whose flow/warp goldens run over ALL pairs, not just the
# first 3 (a regression on large-motion content would pass a 3-pair
# sample of the low-motion experiments)
FULL_FLOW_EXPERIMENT = "birds_flying_cfg5.0_steps25"


@pytest.fixture(scope="module")
def ref_data(reference_root):
    out = {}
    for exp in EXPERIMENTS:
        frames_dir = reference_root / "outputs/05_grid_search" / exp / "frames"
        metrics_path = (
            reference_root / "outputs/06_grid_search_metrics" / f"{exp}_metrics.json"
        )
        if not frames_dir.exists() or not metrics_path.exists():
            from tests.conftest import golden_skip

            golden_skip(f"committed artifacts missing for {exp}")
        out[exp] = (load_frames(frames_dir), json.loads(metrics_path.read_text()))
    return out


class TestGoldenBasicMetrics:
    def test_mse_psnr_match_reference(self, ref_data):
        for exp, (frames, ref) in ref_data.items():
            mse = np.asarray(mse_pairs(jnp.asarray(frames)))
            psnr = np.asarray(psnr_from_mse(jnp.asarray(mse)))
            ref_mse = [fm["mse"] for fm in ref["frame_metrics"]]
            ref_psnr = [fm["psnr"] for fm in ref["frame_metrics"]]
            np.testing.assert_allclose(mse, ref_mse, rtol=1e-4)
            np.testing.assert_allclose(psnr, ref_psnr, rtol=1e-4)

    def test_flicker_matches_reference(self, ref_data):
        for exp, (frames, ref) in ref_data.items():
            fl = float(flicker_index(jnp.asarray(frames)))
            np.testing.assert_allclose(fl, ref["flicker_index"], rtol=1e-4)

    def test_aggregates_match_reference(self, ref_data):
        for exp, (frames, ref) in ref_data.items():
            mse = np.asarray(mse_pairs(jnp.asarray(frames)), dtype=np.float64)
            np.testing.assert_allclose(float(np.mean(mse)), ref["mean_mse"], rtol=1e-4)
            np.testing.assert_allclose(float(np.std(mse)), ref["std_mse"], rtol=1e-3)


class TestGoldenFlowMetrics:
    def test_flow_magnitude_matches_reference(self, ref_data):
        """Our from-scratch Farnebäck vs the committed OpenCV-computed values.

        The FULL_FLOW_EXPERIMENT (high-motion) checks every pair; the rest
        check the first 3 pairs to keep CI fast."""
        for exp, (frames, ref) in ref_data.items():
            gray = (frames.mean(axis=-1) * 255).astype(np.uint8)
            n = len(ref["frame_metrics"]) if exp == FULL_FLOW_EXPERIMENT else 3
            for i in range(n):
                flow = calc_flow(gray[i], gray[i + 1])
                stats = flow_stats(flow)
                ref_fm = ref["frame_metrics"][i]
                np.testing.assert_allclose(
                    stats["magnitude_mean"], ref_fm["flow_magnitude_mean"], rtol=2e-3
                )
                np.testing.assert_allclose(
                    stats["magnitude_std"], ref_fm["flow_magnitude_std"], rtol=2e-3
                )

    def test_warp_error_matches_reference(self, ref_data):
        for exp, (frames, ref) in ref_data.items():
            gray = (frames.mean(axis=-1) * 255).astype(np.uint8)
            n = len(ref["frame_metrics"]) if exp == FULL_FLOW_EXPERIMENT else 3
            flows = np.stack(
                [calc_flow(gray[i], gray[i + 1]) for i in range(n)]
            )
            we = np.asarray(
                warp_error_pairs(jnp.asarray(frames[: n + 1]), jnp.asarray(flows))
            )
            ref_we = [fm["warp_error"] for fm in ref["frame_metrics"][:n]]
            np.testing.assert_allclose(we, ref_we, rtol=5e-3)


class TestWarp:
    def test_zero_flow_is_identity(self):
        rng = np.random.default_rng(0)
        f = rng.random((16, 16, 3)).astype(np.float32)
        w = np.asarray(warp_frame(jnp.asarray(f), jnp.zeros((16, 16, 2))))
        np.testing.assert_allclose(w, f, atol=1e-6)

    def test_integer_shift(self):
        f = np.zeros((8, 8, 1), np.float32)
        f[2, 3, 0] = 1.0
        flow = np.zeros((8, 8, 2), np.float32)
        flow[..., 0] = 1.0  # sample from x+1
        w = np.asarray(warp_frame(jnp.asarray(f), jnp.asarray(flow)))
        assert w[2, 2, 0] == pytest.approx(1.0)

    def test_matches_torch_grid_sample(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as TF

        rng = np.random.default_rng(1)
        f = rng.random((12, 10, 3)).astype(np.float32)
        flow = (rng.random((12, 10, 2)).astype(np.float32) - 0.5) * 4

        ours = np.asarray(warp_frame(jnp.asarray(f), jnp.asarray(flow)))

        # Reference formulation (06:259-284)
        H, W, C = f.shape
        gy, gx = np.mgrid[0:H, 0:W].astype(np.float32)
        sx = 2 * (gx + flow[..., 0]) / (W - 1) - 1
        sy = 2 * (gy + flow[..., 1]) / (H - 1) - 1
        grid = torch.from_numpy(np.stack([sx, sy], -1))[None]
        ft = torch.from_numpy(f).permute(2, 0, 1)[None]
        expected = (
            TF.grid_sample(
                ft, grid, mode="bilinear", padding_mode="border", align_corners=True
            )[0]
            .permute(1, 2, 0)
            .numpy()
        )
        np.testing.assert_allclose(ours, expected, atol=1e-5)


class TestTCS:
    def test_formula(self):
        mse = jnp.asarray([0.01, 0.02, 0.03])
        lp = jnp.asarray([0.1, 0.2, 0.3])
        expected = (
            np.var([0.01, 0.02, 0.03]) * 1000
            + np.mean([0.01, 0.02, 0.03]) * 100
            + np.mean([0.1, 0.2, 0.3]) * 50
            + np.var([0.1, 0.2, 0.3]) * 500
        )
        np.testing.assert_allclose(
            float(temporal_consistency_score(mse, lp)), expected, rtol=1e-5
        )


class TestLPIPS:
    def test_contract(self):
        m = LPIPSMetric()
        rng = np.random.default_rng(0)
        a = rng.random((32, 32, 3)).astype(np.float32)
        b = rng.random((32, 32, 3)).astype(np.float32)
        assert m.compute(a, a) == pytest.approx(0.0, abs=1e-5)
        dab = m.compute(a, b)
        assert dab > 0
        assert m.compute(b, a) == pytest.approx(dab, rel=1e-4)

    def test_batched_pairs(self):
        m = LPIPSMetric()
        rng = np.random.default_rng(0)
        frames = rng.random((4, 32, 32, 3)).astype(np.float32)
        batched = m.compute_pairs(frames)
        singles = [m.compute(frames[i], frames[i + 1]) for i in range(3)]
        np.testing.assert_allclose(batched, singles, rtol=1e-4)


class TestEngine:
    def test_measure_video_schema(self, ref_data):
        exp = EXPERIMENTS[0]
        frames, ref = ref_data[exp]
        vm = measure_video(
            frames[:5],
            video_name="portrait",
            experiment_id=exp,
            config={"guidance_scale": 7.5, "num_inference_steps": 25, "phase": "x"},
        )
        assert vm.num_frames == 5
        assert len(vm.frame_metrics) == 4
        # per-pair values line up with the committed reference values
        np.testing.assert_allclose(
            [fm.mse for fm in vm.frame_metrics],
            [fm["mse"] for fm in ref["frame_metrics"][:4]],
            rtol=1e-4,
        )
        np.testing.assert_allclose(
            [fm.flow_magnitude_mean for fm in vm.frame_metrics],
            [fm["flow_magnitude_mean"] for fm in ref["frame_metrics"][:4]],
            rtol=2e-3,
        )
