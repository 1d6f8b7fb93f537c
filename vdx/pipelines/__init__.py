from vdx.pipelines.base import (
    AnimateDiffPipeline,
    PABConfig,
    PipelineOutput,
    SkipConfig,
    VideoDiffusionPipeline,
)
from vdx.nn.freeu import FreeUConfig
from vdx.pipelines.cogvideox import CogVideoXPipeline
from vdx.pipelines.context import ContextConfig
from vdx.pipelines.latte import LattePipeline
from vdx.pipelines.svd import SVDImg2VidPipeline
from vdx.pipelines.text_to_video_ms import TextToVideoMSPipeline

__all__ = [
    "AnimateDiffPipeline",
    "PABConfig",
    "PipelineOutput",
    "SkipConfig",
    "ContextConfig",
    "FreeUConfig",
    "VideoDiffusionPipeline",
    "CogVideoXPipeline",
    "LattePipeline",
    "SVDImg2VidPipeline",
    "TextToVideoMSPipeline",
]
