from vdx.serving.server import (
    BatchingGenerationService,
    GenerationServer,
    GenerationService,
    Img2VidService,
)

__all__ = ["BatchingGenerationService", "GenerationServer",
           "GenerationService", "Img2VidService"]
