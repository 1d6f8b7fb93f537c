"""Experiment 02: architecture inspection.

Parity rebuild of reference experiments/02_architecture_inspection.py:
count UNet parameters, partition modules into temporal (motion) vs spatial
attention, and dump one motion block's structure (reference 02:38-107).

Usage:
    python experiments/02_architecture_inspection.py [--tiny]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vdx.models.unet_motion import UNetMotion, UNetMotionConfig

    cfg = UNetMotionConfig.tiny() if args.tiny else UNetMotionConfig.sd15()
    model = UNetMotion(cfg)

    sample = jax.ShapeDtypeStruct((1, 2, 8, 8, cfg.in_channels), jnp.float32)
    t = jax.ShapeDtypeStruct((1,), jnp.int32)
    ctx = jax.ShapeDtypeStruct((1, 77, cfg.cross_attention_dim), jnp.float32)
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0), sample, t, ctx)

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    total = 0
    temporal = 0
    spatial_attn_modules = set()
    temporal_modules = set()
    for path, leaf in flat:
        n = int(np.prod(leaf.shape))
        total += n
        keys = [getattr(k, "key", str(k)) for k in path]
        name = "/".join(str(k) for k in keys)
        if "motion" in name:
            temporal += n
            temporal_modules.add(name.rsplit("/", 2)[0])
        if "_attn/" in name or name.endswith("_attn"):
            spatial_attn_modules.add(name.split("/blocks_")[0])

    print("=" * 60)
    print("UNetMotion architecture inspection")
    print("=" * 60)
    print(f"Total parameters:      {total / 1e6:,.1f}M")
    print(f"  Spatial (SD UNet):   {(total - temporal) / 1e6:,.1f}M")
    print(f"  Motion modules:      {temporal / 1e6:,.1f}M")
    print(f"Spatial attention transformer blocks: {len(spatial_attn_modules)}")
    print(f"Temporal (motion) module groups:      {len(temporal_modules)}")
    print(f"\nBlock channels: {cfg.block_out_channels}")
    print(f"Layers per block: {cfg.layers_per_block}")
    print(f"Attention heads: {cfg.attention_heads} (head_dim = C/heads)")
    print(f"Motion heads: {cfg.motion_heads}, max seq {cfg.motion_max_seq}")

    print("\n--- First motion module structure ---")
    print("TemporalTransformer3D")
    print("  norm (GroupNorm, stats over F,H,W jointly)")
    print("  proj_in (Dense C->C)")
    print("  blocks_0 (TemporalBlock)")
    print("    norm1 -> +sinusoidal frame PE -> attn1 (temporal self-attn)")
    print("    norm2 -> +sinusoidal frame PE -> attn2 (temporal self-attn)")
    print("    norm3 -> ff (GEGLU)")
    print("  proj_out (Dense C->C)")
    print("  residual add")


if __name__ == "__main__":
    main()
