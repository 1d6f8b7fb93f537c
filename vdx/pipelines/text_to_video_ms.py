"""ModelScope-class text-to-video pipeline (UNet3D denoiser).

Target config BASELINE.json configs[0]: 16 frames @ 256x256, 8 DDIM steps.
Same compiled machinery as the base; swaps in the UNet3D denoiser and the
ViT-H-width text tower (cross-attention dim 1024).
"""

from __future__ import annotations

from vdx.models.clip_text import CLIPTextConfig
from vdx.models.unet3d import UNet3D, UNet3DConfig
from vdx.pipelines.base import VideoDiffusionPipeline


def vit_h_text_config() -> CLIPTextConfig:
    """OpenCLIP ViT-H/14 text tower dims (ModelScope's conditioning)."""
    return CLIPTextConfig(
        hidden_size=1024, num_layers=24, num_heads=16, intermediate_size=4096
    )


class TextToVideoMSPipeline(VideoDiffusionPipeline):
    denoiser_cls = UNet3D
    denoiser_config_cls = UNet3DConfig

    def __init__(self, **kwargs):
        kwargs.setdefault("text_config", vit_h_text_config())
        kwargs.setdefault("scheduler", "ddim")
        super().__init__(**kwargs)

    def _denoiser_rules(self):
        from vdx.core.convert import unet3d_rules

        return unet3d_rules(self.unet.config)
