"""Latte-style DiT text-to-video pipeline.

Target config BASELINE.json configs[4]: spatiotemporal DiT with CFG batching
and frame-parallel sharding over ICI. Same compiled machinery as the base;
denoiser is the factorised space/time transformer.
"""

from __future__ import annotations

from vdx.models.dit import LatteConfig, LatteDiT
from vdx.pipelines.base import VideoDiffusionPipeline


class LattePipeline(VideoDiffusionPipeline):
    denoiser_cls = LatteDiT
    denoiser_config_cls = LatteConfig

    def __init__(self, **kwargs):
        kwargs.setdefault("scheduler", "ddim")
        super().__init__(**kwargs)

    def _denoiser_rules(self):
        from vdx.core.convert import latte_dit_rules

        return latte_dit_rules(self.unet.config)

    def _conversion_rules(self) -> dict:
        from vdx.core.convert import LATTE_UNCOVERED

        specs = super()._conversion_rules()
        # leaves with no Latte checkpoint counterpart stay at init
        # (latte_dit_rules docstring)
        specs["unet"] = (specs["unet"][0], LATTE_UNCOVERED)
        return specs
