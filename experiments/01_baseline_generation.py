"""Experiment 01: baseline video generation.

Parity rebuild of reference experiments/01_baseline_generation.py: generate
the six test videos at the default config (16 frames @ 512^2, 25 steps,
CFG 7.5, seed 42, Euler scheduler with linspace spacing / linear betas —
reference 01:24-30, 76-80) and save GIF + per-frame PNGs.

TPU differences: fp16+CUDA becomes bf16+XLA; ``enable_vae_slicing`` becomes
frame-tiled decode inside the jitted pipeline; the denoise loop is one
lax.scan.

Usage:
    python experiments/01_baseline_generation.py [--output DIR] [--tiny]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TEST_PROMPTS = [
    ("corgi_beach", "a corgi walking on the beach, sunset lighting, high quality"),
    ("woman_waving", "a pretty woman waving her hand, portrait, studio lighting"),
    ("landscape", "a beautiful mountain landscape, lake reflection, golden hour"),
    ("portrait", "portrait of a man with glasses, professional photo"),
    ("birds_flying", "birds flying across a blue sky, nature documentary"),
    ("mig21_missile", "A Mig-21 firing a missile, cloudy pink sky in the background, high quality"),
]
NEGATIVE_PROMPT = "bad quality, blurry, distorted, ugly, deformed"

DEFAULT_CONFIG = {
    "num_frames": 16,
    "num_inference_steps": 25,
    "guidance_scale": 7.5,
    "width": 512,
    "height": 512,
}


def load_pipeline(tiny: bool = False, checkpoint=None):
    import jax.numpy as jnp

    from vdx.core.dtypes import Policy
    from vdx.pipelines import AnimateDiffPipeline

    if tiny:
        from vdx.core.dtypes import FP32_POLICY
        from vdx.models.clip_text import CLIPTextConfig
        from vdx.models.unet_motion import UNetMotionConfig
        from vdx.models.vae import VAEConfig

        kwargs = dict(
            unet_config=UNetMotionConfig.tiny(),
            vae_config=VAEConfig.tiny(),
            text_config=CLIPTextConfig.tiny(),
            policy=FP32_POLICY,
            scheduler="euler",
        )
    else:
        kwargs = dict(
            policy=Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16),
            scheduler="euler",
        )
    if checkpoint:
        # converted weights (scripts/convert_checkpoint.py); the euler
        # scheduler config matches the reference baseline (01:76-80)
        pipe = AnimateDiffPipeline(**kwargs)
        pipe.load_checkpoint(checkpoint)
        return pipe
    return AnimateDiffPipeline.with_random_params(seed=0, **kwargs)


def generate_video(pipe, prompt, name, output_dir: Path, seed=42, **kwargs):
    from vdx.io.frames import export_to_gif, save_frames

    config = {**DEFAULT_CONFIG, **kwargs}
    print(f"\nGenerating: {name}")
    print(f"  Prompt: {prompt[:50]}...")
    out = pipe(prompt=prompt, negative_prompt=NEGATIVE_PROMPT, seed=seed, **config)
    frames = out.frames[0]
    export_to_gif(frames, output_dir / f"{name}.gif")
    save_frames(frames, output_dir / f"{name}_frames", digits=3)
    print(f"  Saved {len(frames)} frames + GIF")
    return frames


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--output", default="outputs/01_baseline")
    p.add_argument("--tiny", action="store_true",
                   help="tiny configs at reduced resolution (CI smoke)")
    p.add_argument("--checkpoint", default=None,
                   help="Orbax dir of converted weights "
                        "(scripts/convert_checkpoint.py)")
    args = p.parse_args()

    output_dir = Path(args.output)
    output_dir.mkdir(parents=True, exist_ok=True)

    pipe = load_pipeline(tiny=args.tiny, checkpoint=args.checkpoint)
    gen_kwargs = {}
    if args.tiny:
        gen_kwargs = dict(height=64, width=64, num_frames=4, num_inference_steps=3)

    print("=" * 60)
    print("Generating baseline videos")
    print("=" * 60)
    for name, prompt in TEST_PROMPTS:
        generate_video(pipe, prompt, name, output_dir, **gen_kwargs)
    print(f"\nOutputs saved to: {output_dir}")


if __name__ == "__main__":
    main()
