"""Video measurement engine — the L4 subsystem.

Produces VideoMetrics with the EXACT JSON schema of the reference
(experiments/06_measure_grid_search.py:40-91 dataclasses, 06:396-458
serialisation) so the analysis layer (vdx.analysis) and the committed
78-record ``grid_search_results.json`` oracle interoperate byte-for-byte at
the field level.

TPU-first restructure of 06:291-389: instead of a per-pair python loop with
host<->device transfers for every metric, MSE/PSNR/flicker run as ONE jitted
call over the frame stack, LPIPS as one batched call over all pairs, and
flow/warp per pair through the native backend.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import List

import jax.numpy as jnp
import numpy as np

from vdx.metrics.temporal import basic_metrics, temporal_consistency_score
from vdx.metrics.warp import warp_error_pairs


@dataclasses.dataclass
class FramePairMetrics:
    """Per-consecutive-pair metrics (reference 06:40-49)."""

    frame_idx: int
    mse: float
    psnr: float
    lpips: float
    flow_magnitude_mean: float
    flow_magnitude_std: float
    warp_error: float


@dataclasses.dataclass
class VideoMetrics:
    """Aggregate metrics (reference 06:52-91); field names are the contract."""

    video_name: str
    experiment_id: str
    num_frames: int
    guidance_scale: float
    num_inference_steps: int
    phase: str
    frame_metrics: List[FramePairMetrics]
    mean_mse: float
    std_mse: float
    mean_psnr: float
    mean_lpips: float
    std_lpips: float
    mean_flow_magnitude: float
    flow_magnitude_variance: float
    mean_warp_error: float
    warp_error_variance: float
    temporal_consistency_score: float
    flicker_index: float


def load_frames(frame_dir: Path) -> np.ndarray:
    """PNG/JPG frames -> [F, H, W, C] float32 in [0,1] (reference 06:97-112;
    channels-last here — the TPU-native layout)."""
    from PIL import Image

    frame_dir = Path(frame_dir)
    files = sorted(frame_dir.glob("*.png")) or sorted(frame_dir.glob("*.jpg"))
    if not files:
        raise ValueError(f"No frames found in {frame_dir}")
    frames = [np.asarray(Image.open(f).convert("RGB"), np.float32) / 255.0 for f in files]
    return np.stack(frames, axis=0)


def measure_video(
    frames: np.ndarray,
    video_name: str,
    experiment_id: str,
    config: dict,
    lpips_metric=None,
    flow_estimator=None,
) -> VideoMetrics:
    """Measure temporal consistency for [F, H, W, C] frames in [0,1]."""
    if flow_estimator is None:
        from vdx.metrics.flow import OpticalFlowEstimator

        flow_estimator = OpticalFlowEstimator()

    F = frames.shape[0]
    fj = jnp.asarray(frames)

    basics = basic_metrics(fj)
    mse = np.asarray(basics["mse"], dtype=np.float64)
    psnr = np.asarray(basics["psnr"], dtype=np.float64)
    flicker = float(basics["flicker_index"])

    if lpips_metric is not None:
        lpips_vals = np.asarray(lpips_metric.compute_pairs(frames), dtype=np.float64)
    else:
        lpips_vals = np.zeros(F - 1, dtype=np.float64)

    # Flow per pair (host/native backend; pairs fan out over a thread pool —
    # the ctypes call releases the GIL), then all warps in one jitted call.
    gray = (frames.mean(axis=-1) * 255).astype(np.uint8)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=4) as pool:
        flows = np.stack(
            list(
                pool.map(
                    lambda i: flow_estimator.compute_flow_gray(gray[i], gray[i + 1]),
                    range(F - 1),
                )
            )
        )
    flow_means = flows.reshape(F - 1, -1, 2)
    mags = np.sqrt((flows**2).sum(-1)).reshape(F - 1, -1)
    flow_mag_mean = mags.mean(axis=1).astype(np.float64)
    flow_mag_std = mags.std(axis=1).astype(np.float64)
    warp_errors = np.asarray(warp_error_pairs(fj, jnp.asarray(flows)), dtype=np.float64)

    frame_metrics = [
        FramePairMetrics(
            frame_idx=i,
            mse=float(mse[i]),
            psnr=float(psnr[i]),
            lpips=float(lpips_vals[i]),
            flow_magnitude_mean=float(flow_mag_mean[i]),
            flow_magnitude_std=float(flow_mag_std[i]),
            warp_error=float(warp_errors[i]),
        )
        for i in range(F - 1)
    ]

    score = float(
        temporal_consistency_score(jnp.asarray(mse), jnp.asarray(lpips_vals))
    )

    return VideoMetrics(
        video_name=video_name,
        experiment_id=experiment_id,
        num_frames=F,
        guidance_scale=config.get("guidance_scale", 0),
        num_inference_steps=config.get("num_inference_steps", 0),
        phase=config.get("phase", "unknown"),
        frame_metrics=frame_metrics,
        mean_mse=float(np.mean(mse)),
        std_mse=float(np.std(mse)),
        mean_psnr=float(np.mean(psnr)),
        mean_lpips=float(np.mean(lpips_vals)),
        std_lpips=float(np.std(lpips_vals)),
        mean_flow_magnitude=float(np.mean(flow_mag_mean)),
        flow_magnitude_variance=float(np.var(flow_mag_mean)),
        mean_warp_error=float(np.mean(warp_errors)),
        warp_error_variance=float(np.var(warp_errors)),
        temporal_consistency_score=score,
        flicker_index=flicker,
    )


def save_metrics(metrics: VideoMetrics, output_path: Path) -> None:
    """Per-experiment JSON with the reference's exact key order (06:396-427)."""
    data = {
        "video_name": metrics.video_name,
        "experiment_id": metrics.experiment_id,
        "num_frames": metrics.num_frames,
        "guidance_scale": metrics.guidance_scale,
        "num_inference_steps": metrics.num_inference_steps,
        "phase": metrics.phase,
        "mean_mse": metrics.mean_mse,
        "std_mse": metrics.std_mse,
        "mean_psnr": metrics.mean_psnr,
        "mean_lpips": metrics.mean_lpips,
        "std_lpips": metrics.std_lpips,
        "mean_flow_magnitude": metrics.mean_flow_magnitude,
        "flow_magnitude_variance": metrics.flow_magnitude_variance,
        "mean_warp_error": metrics.mean_warp_error,
        "warp_error_variance": metrics.warp_error_variance,
        "temporal_consistency_score": metrics.temporal_consistency_score,
        "flicker_index": metrics.flicker_index,
        "frame_metrics": [dataclasses.asdict(fm) for fm in metrics.frame_metrics],
    }
    with open(output_path, "w", encoding="utf-8") as f:
        json.dump(data, f, indent=2)


def save_summary(all_metrics: List[VideoMetrics], output_path: Path) -> None:
    """Roll-up JSON == reference's grid_search_results.json (06:430-458)."""
    summary = [
        {
            "experiment_id": m.experiment_id,
            "video_name": m.video_name,
            "guidance_scale": m.guidance_scale,
            "num_inference_steps": m.num_inference_steps,
            "phase": m.phase,
            "mean_mse": m.mean_mse,
            "std_mse": m.std_mse,
            "mean_lpips": m.mean_lpips,
            "std_lpips": m.std_lpips,
            "mean_flow_magnitude": m.mean_flow_magnitude,
            "flow_magnitude_variance": m.flow_magnitude_variance,
            "mean_warp_error": m.mean_warp_error,
            "warp_error_variance": m.warp_error_variance,
            "temporal_consistency_score": m.temporal_consistency_score,
            "flicker_index": m.flicker_index,
        }
        for m in all_metrics
    ]
    with open(output_path, "w", encoding="utf-8") as f:
        json.dump(summary, f, indent=2)
