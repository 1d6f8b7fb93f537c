from vdx.nn.embeddings import (
    TimestepEmbedding,
    get_timestep_embedding,
    sinusoidal_positional_encoding,
)
from vdx.nn.attention import Attention, FeedForward
from vdx.nn.resnet import Downsample2D, ResnetBlock2D, Upsample2D
from vdx.nn.transformer import BasicTransformerBlock, SpatialTransformer
from vdx.nn.temporal import TemporalTransformer3D

__all__ = [
    "TimestepEmbedding",
    "get_timestep_embedding",
    "sinusoidal_positional_encoding",
    "Attention",
    "FeedForward",
    "ResnetBlock2D",
    "Downsample2D",
    "Upsample2D",
    "BasicTransformerBlock",
    "SpatialTransformer",
    "TemporalTransformer3D",
]
