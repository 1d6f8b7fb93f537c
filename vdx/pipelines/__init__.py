from vdx.pipelines.animatediff import AnimateDiffPipeline, PipelineOutput

__all__ = ["AnimateDiffPipeline", "PipelineOutput"]
