"""Experiment 03: trace the UNet forward pass.

Parity rebuild of reference experiments/03_trace_forward_pass.py: drive the
ForwardTracer over a dummy UNet forward, classify spatial vs temporal
attention by module path, verify the [B,C,F,H,W] -> [B*H*W,F,C] temporal
reshape contract, and print the resnet/spatial/temporal execution interleave
(reference 03:64-241).

Usage:
    python experiments/03_trace_forward_pass.py [--tiny] [--output DIR]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--output", default="outputs/03_traces")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from vdx.core.dtypes import FP32_POLICY
    from vdx.models.unet_motion import UNetMotion, UNetMotionConfig
    from vdx.tracing.tracer import ForwardTracer

    if args.tiny:
        cfg = UNetMotionConfig.tiny()
        B, F, H, W = 1, 4, 16, 16
        S_text = 7
    else:
        cfg = UNetMotionConfig.sd15()
        B, F, H, W = 1, 16, 64, 64  # the reference's trace shape (03:79-98)
        S_text = 77

    model = UNetMotion(cfg, policy=FP32_POLICY)
    sample = jnp.zeros((B, F, H, W, cfg.in_channels))
    t = jnp.asarray([500])
    ctx = jnp.zeros((B, S_text, cfg.cross_attention_dim))

    print("Initialising model...")
    params = model.init(jax.random.PRNGKey(0), sample, t, ctx)

    tracer = ForwardTracer(model, trace_depth=3)
    print("Tracing forward pass...")
    tracer.trace(params, sample, t, ctx)

    # ---- attention classification (reference 03:124-169) ----
    spatial, temporal = [], []
    for name, tr in tracer.traces.items():
        if tr.class_name != "Attention":
            continue
        (temporal if "motion" in name else spatial).append((name, tr))

    print("\n" + "=" * 60)
    print("ATTENTION MODULE ANALYSIS")
    print("=" * 60)
    print(f"Spatial attention modules:  {len(spatial)}")
    print(f"Temporal attention modules: {len(temporal)}")

    if temporal:
        name, tr = temporal[0]
        print(f"\n--- First temporal attention: {name}")
        print(f"Input shape:  {tr.input_shapes}")
        if tr.input_shapes and len(tr.input_shapes[0]) == 3:
            B_HW, Fr, C = tr.input_shapes[0]
            print("Interpretation:")
            print(f"  Batch*Height*Width: {B_HW}")
            print(f"  Num frames:         {Fr}")
            print(f"  Channels:           {C}")
            print(f"  -> each spatial position attends across {Fr} frames")

    # ---- execution interleave (reference 03:215-241) ----
    print("\n" + "=" * 60)
    print("SPATIAL vs TEMPORAL EXECUTION ORDER (first 50)")
    print("=" * 60)
    for i, name in enumerate(tracer.execution_order[:50]):
        tr = tracer.traces[name]
        if "motion" in name:
            prefix = "[TEMPORAL]"
        elif "attn" in name:
            prefix = "[SPATIAL] "
        elif "resnet" in name:
            prefix = "[RESNET]  "
        else:
            prefix = "          "
        print(f"{i:3d}. {prefix} {name:<55} {tr.class_name}")

    out_dir = Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)
    tracer.save_report(out_dir / "unet_trace.txt")
    tracer.save_json(out_dir / "unet_trace.json")
    print(f"\nFull trace saved to {out_dir}/unet_trace.txt")


if __name__ == "__main__":
    main()
