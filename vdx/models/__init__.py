from vdx.models.clip_text import CLIPTextConfig, CLIPTextModel
from vdx.models.clip_vision import CLIPVisionConfig, CLIPVisionModel
from vdx.models.cogvideox import (
    CausalVAEConfig,
    CausalVAEDecoder,
    CausalVAEEncoder,
    CogVideoXConfig,
    CogVideoXDiT,
)
from vdx.models.dit import LatteConfig, LatteDiT
from vdx.models.svd_unet import SVDUNetConfig, UNetSpatioTemporal
from vdx.models.t5 import T5Config, T5Encoder
from vdx.models.tokenizer import CLIPTokenizer, FallbackBPETokenizer, load_tokenizer
from vdx.models.unet3d import UNet3D, UNet3DConfig
from vdx.models.unet_motion import UNetMotion, UNetMotionConfig
from vdx.models.vae import (
    AutoencoderKL,
    TemporalDecoder,
    VAEConfig,
    decode_frames_tiled,
)

__all__ = [
    "CLIPTextConfig",
    "CLIPTextModel",
    "CLIPVisionConfig",
    "CLIPVisionModel",
    "CausalVAEConfig",
    "CausalVAEDecoder",
    "CausalVAEEncoder",
    "CogVideoXConfig",
    "CogVideoXDiT",
    "LatteConfig",
    "LatteDiT",
    "SVDUNetConfig",
    "UNetSpatioTemporal",
    "T5Config",
    "T5Encoder",
    "CLIPTokenizer",
    "FallbackBPETokenizer",
    "load_tokenizer",
    "UNet3D",
    "UNet3DConfig",
    "UNetMotion",
    "UNetMotionConfig",
    "AutoencoderKL",
    "TemporalDecoder",
    "VAEConfig",
    "decode_frames_tiled",
]
