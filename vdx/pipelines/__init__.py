from vdx.pipelines.base import (
    AnimateDiffPipeline,
    PipelineOutput,
    VideoDiffusionPipeline,
)
from vdx.pipelines.latte import LattePipeline
from vdx.pipelines.text_to_video_ms import TextToVideoMSPipeline

__all__ = [
    "AnimateDiffPipeline",
    "PipelineOutput",
    "VideoDiffusionPipeline",
    "LattePipeline",
    "TextToVideoMSPipeline",
]
