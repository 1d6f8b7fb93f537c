from vdx.models.clip_text import CLIPTextConfig, CLIPTextModel
from vdx.models.tokenizer import CLIPTokenizer, FallbackBPETokenizer, load_tokenizer
from vdx.models.unet_motion import UNetMotion, UNetMotionConfig
from vdx.models.vae import AutoencoderKL, VAEConfig, decode_frames_tiled

__all__ = [
    "CLIPTextConfig",
    "CLIPTextModel",
    "CLIPTokenizer",
    "FallbackBPETokenizer",
    "load_tokenizer",
    "UNetMotion",
    "UNetMotionConfig",
    "AutoencoderKL",
    "VAEConfig",
    "decode_frames_tiled",
]
