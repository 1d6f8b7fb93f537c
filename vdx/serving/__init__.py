from vdx.serving.server import GenerationServer, GenerationService

__all__ = ["GenerationServer", "GenerationService"]
