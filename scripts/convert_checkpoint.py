#!/usr/bin/env python
"""Convert torch ``.safetensors`` checkpoints into a vdx Orbax checkpoint.

One command per model family. The torch->flax mapping rules are coverage-
and torch-numerics-tested offline (tests/test_convert.py,
tests/test_torch_parity.py), so the day checkpoints are reachable (the
build environment is zero-egress — no model hub) conversion is:

  python scripts/convert_checkpoint.py --family animatediff \
      --src unet=unet.safetensors --src unet=motion_adapter.safetensors \
      --src vae=vae.safetensors --src text=text_encoder.safetensors \
      --out ckpts/animatediff

(reference experiments/01_baseline_generation.py:55-73 downloads exactly
those: runwayml/stable-diffusion-v1-5 + guoyww/animatediff-motion-adapter;
repeating --src for one component merges the files into one state dict.)

Families and their components (--list-components prints this):
  animatediff : unet, vae, text
  modelscope  : unet, vae, text
  latte       : unet, vae, text
  svd         : unet, vae, tdec, vision
  cogvideox   : dit, t5, vae_enc, vae_dec

The output directory loads back with ``pipe.load_checkpoint(out)`` or the
experiment CLIs' checkpoint flag.

LoRA adapters convert separately (peft / old-diffusers / kohya formats):

  python scripts/convert_checkpoint.py --family animatediff \
      --lora unet=motion_lora.safetensors --lora-out ckpts/zoom_in

and load at runtime with ``pipe.load_lora(load_params(out), scale=s)``.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

FAMILIES = ("animatediff", "modelscope", "latte", "svd", "cogvideox")


def _pipeline_cls(family: str):
    from vdx import pipelines as P

    return {
        "animatediff": P.AnimateDiffPipeline,
        "modelscope": P.TextToVideoMSPipeline,
        "latte": P.LattePipeline,
        "svd": P.SVDImg2VidPipeline,
        "cogvideox": P.CogVideoXPipeline,
    }[family]


def _tiny_kwargs(family: str) -> dict:
    """Tiny model configs (CI smoke — full-size conversion is identical
    plumbing over bigger trees)."""
    from vdx.models.clip_text import CLIPTextConfig
    from vdx.models.vae import VAEConfig

    if family == "animatediff":
        from vdx.models.unet_motion import UNetMotionConfig

        return dict(unet_config=UNetMotionConfig.tiny(),
                    vae_config=VAEConfig.tiny(),
                    text_config=CLIPTextConfig.tiny())
    if family == "modelscope":
        from vdx.models.unet3d import UNet3DConfig

        return dict(unet_config=UNet3DConfig.tiny(),
                    vae_config=VAEConfig.tiny(),
                    text_config=CLIPTextConfig.tiny())
    if family == "latte":
        from vdx.models.dit import LatteConfig

        return dict(unet_config=LatteConfig.tiny(),
                    vae_config=VAEConfig.tiny(),
                    text_config=CLIPTextConfig.tiny())
    if family == "svd":
        from vdx.models.clip_vision import CLIPVisionConfig
        from vdx.models.svd_unet import SVDUNetConfig

        return dict(unet_config=SVDUNetConfig.tiny(),
                    vae_config=VAEConfig.tiny(),
                    vision_config=CLIPVisionConfig.tiny())
    from vdx.models.cogvideox import CausalVAEConfig, CogVideoXConfig, T5Config

    return dict(dit_config=CogVideoXConfig.tiny(),
                vae_config=CausalVAEConfig.tiny(),
                t5_config=T5Config.tiny())


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="torch safetensors -> vdx Orbax checkpoint")
    p.add_argument("--family", required=True, choices=FAMILIES)
    p.add_argument("--src", action="append", default=[],
                   metavar="COMPONENT=PATH",
                   help="repeatable; repeat a component to merge files")
    p.add_argument("--out", help="output checkpoint directory")
    p.add_argument("--tiny", action="store_true",
                   help="tiny model configs (smoke test)")
    p.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"],
                   help="parameter dtype of the converted tree")
    p.add_argument("--no-strict", action="store_true",
                   help="allow missing components/keys (kept at init)")
    p.add_argument("--list-components", action="store_true")
    p.add_argument("--lora", metavar="[COMPONENT=]PATH",
                   help="convert a torch LoRA safetensors (peft/diffusers/"
                        "kohya formats) to a vdx adapter instead of a full "
                        "checkpoint; component defaults to the denoiser")
    p.add_argument("--lora-out", help="output directory for --lora")
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from vdx.core.dtypes import FP32_POLICY, Policy

    policy = (FP32_POLICY if args.dtype == "fp32" else
              Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16))
    kwargs = _tiny_kwargs(args.family) if args.tiny else {}
    pipe = _pipeline_cls(args.family)(policy=policy, **kwargs)

    if args.list_components:
        for comp, (rules, allowed) in sorted(pipe._conversion_rules().items()):
            note = f" ({len(allowed)} documented-uncovered leaves)" if allowed else ""
            print(f"{comp}: {len(rules)} mapped leaves{note}")
        return 0

    if args.lora:
        if not args.lora_out:
            p.error("--lora requires --lora-out")
        import jax

        from vdx.core.checkpoint import save_params
        from vdx.core.convert import load_safetensors
        from vdx.core.lora import convert_lora_checkpoint

        comp, _, path = args.lora.partition("=")
        if not path:
            comp, path = pipe.denoiser_param_key, comp
        calls = pipe._init_calls(0)
        if comp not in calls:
            p.error(f"unknown component {comp!r}; takes {sorted(calls)}")
        fn, fn_args = calls[comp]
        template = jax.eval_shape(fn, *fn_args)  # shapes only, no init
        rules, _ = pipe._conversion_rules()[comp]
        lora, report = convert_lora_checkpoint(
            load_safetensors(path), template, rules,
            strict=not args.no_strict,
        )
        print(f"lora[{comp}]: {len(report['converted'])} sites converted, "
              f"{len(report['skipped'])} targets without lora keys, "
              f"{len(report['unused_lora_keys'])} unused lora keys")
        save_params(lora, Path(args.lora_out).resolve())
        print(f"saved adapter: {args.lora_out} "
              f"(load with pipe.load_lora(core.checkpoint.load_params(...)))")
        return 0

    if not args.src or not args.out:
        p.error("--src and --out are required (or --list-components)")
    sources: dict = {}
    for item in args.src:
        comp, _, path = item.partition("=")
        if not path:
            p.error(f"--src needs COMPONENT=PATH, got {item!r}")
        sources.setdefault(comp, []).append(path)

    reports = pipe.load_pretrained(sources, strict=not args.no_strict)
    for comp, rep in sorted(reports.items()):
        print(f"{comp}: {len(rep['missing'])} missing, "
              f"{len(rep['shape_errors'])} shape errors, "
              f"{len(rep['unused_checkpoint_keys'])} unused checkpoint keys")
    pipe.save_checkpoint(Path(args.out).resolve())
    print(f"saved: {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
