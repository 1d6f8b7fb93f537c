from vdx.metrics.engine import (
    FramePairMetrics,
    VideoMetrics,
    load_frames,
    measure_video,
    save_metrics,
    save_summary,
)
from vdx.metrics.flow import OpticalFlowEstimator
from vdx.metrics.lpips import LPIPS, LPIPSMetric
from vdx.metrics.temporal import (
    basic_metrics,
    flicker_index,
    mse_pairs,
    psnr_from_mse,
    temporal_consistency_score,
)
from vdx.metrics.warp import warp_error_pairs, warp_frame

__all__ = [
    "FramePairMetrics",
    "VideoMetrics",
    "load_frames",
    "measure_video",
    "save_metrics",
    "save_summary",
    "OpticalFlowEstimator",
    "LPIPS",
    "LPIPSMetric",
    "basic_metrics",
    "flicker_index",
    "mse_pairs",
    "psnr_from_mse",
    "temporal_consistency_score",
    "warp_error_pairs",
    "warp_frame",
]
