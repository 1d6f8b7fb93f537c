from vdx.data.loader import (
    FrameFolderDataset,
    VideoClipLoader,
    encode_clips_to_latents,
    prefetch_to_device,
)

__all__ = [
    "FrameFolderDataset",
    "VideoClipLoader",
    "encode_clips_to_latents",
    "prefetch_to_device",
]
