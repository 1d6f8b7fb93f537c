"""Shared pipeline loader for the experiment CLIs."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def load_pipeline(tiny: bool = False, scheduler: str = "ddim",
                  variable_steps: int = 50, checkpoint=None):
    """Full (bf16 SD-1.5) or tiny (fp32 CI) AnimateDiff pipeline.

    Weights: ``checkpoint`` (an Orbax dir from
    scripts/convert_checkpoint.py or pipe.save_checkpoint) when given,
    otherwise seeded random init — the zero-egress build environment has
    no model hub.
    variable_steps (default 50 >= the grid's max step count, reference
    05:47): ONE step-count-agnostic compiled program serves all six step
    counts of the grid search instead of six multi-minute compiles.
    """
    import jax.numpy as jnp

    from vdx.core.cache import enable_compilation_cache
    from vdx.core.dtypes import FP32_POLICY, Policy
    from vdx.pipelines import AnimateDiffPipeline

    enable_compilation_cache()  # amortise denoise-scan compiles across processes

    if tiny:
        from vdx.models.clip_text import CLIPTextConfig
        from vdx.models.unet_motion import UNetMotionConfig
        from vdx.models.vae import VAEConfig

        kwargs = dict(
            unet_config=UNetMotionConfig.tiny(),
            vae_config=VAEConfig.tiny(),
            text_config=CLIPTextConfig.tiny(),
            policy=FP32_POLICY,
            scheduler=scheduler,
            variable_steps=variable_steps,
        )
    else:
        kwargs = dict(
            policy=Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16),
            scheduler=scheduler, variable_steps=variable_steps,
        )
    if checkpoint:
        pipe = AnimateDiffPipeline(**kwargs)
        pipe.load_checkpoint(checkpoint)
        return pipe
    return AnimateDiffPipeline.with_random_params(seed=0, **kwargs)
