#!/usr/bin/env python
"""Long-clip generation measured: temporal context windows on one chip.

The reference's hard ceiling is 16 frames (experiments/05:48 — a constant);
the context-window pipeline (pipelines/context.py) lifts it. This sweep
measures the flagship AnimateDiff family at the bench shape (512^2, bf16,
CFG 7.5) as the clip grows past the trained context: generation stays ONE
jitted program, each denoise step evaluating W overlapping 16-frame windows.

Expected shape of the result: wall-clock ~ windows x steps x per-eval time
(the per-window forward is exactly the tuned 16f forward), so frames/s is
roughly flat with clip length once overheads amortise — the capability
scales linearly, which is the claim to verify.

Tunnel guardrail (PERF.md methodology #0): single dispatches beyond ~60 s
crash the axon worker; configs predicted over 50 s are auto-chunked OUT of
the sweep here (use frame sharding on real multi-chip for those).

    python -u scripts/bench_longclip.py 16:dpm:16,24:dpm:16,32:dpm:16,48:dpm:12,64:dpm:12
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

PROMPT = "a portrait of a woman, highly detailed, studio lighting"
NEGATIVE = "bad quality, blurry, distorted"
PER_EVAL_S = 0.45  # measured 16f fwd (PERF.md round-3) — dispatch estimate
DISPATCH_CEILING_S = 50.0


def main(specs: str):
    import jax.numpy as jnp

    from vdx.core.cache import enable_compilation_cache
    from vdx.core.dtypes import Policy
    from vdx.pipelines import AnimateDiffPipeline, ContextConfig
    from vdx.pipelines.context import window_starts

    enable_compilation_cache()
    policy = Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    ctx = ContextConfig(frames=16, stride=8)
    t0 = time.time()
    pipe = AnimateDiffPipeline.with_random_params(
        seed=0, policy=policy, scheduler="ddim", context=ctx
    )
    print(f"init: {time.time() - t0:.1f} s (context {ctx.frames}/{ctx.stride})",
          flush=True)

    rows = []
    for spec in specs.split(","):
        frames, scheduler, steps = spec.split(":")
        frames, steps = int(frames), int(steps)
        n_win = (len(window_starts(frames, ctx.frames, ctx.stride))
                 if frames > ctx.frames else 1)
        est = n_win * steps * PER_EVAL_S
        if est > DISPATCH_CEILING_S:
            print(f"{spec}: SKIPPED — predicted {est:.0f} s dispatch "
                  f"(> {DISPATCH_CEILING_S:.0f} s tunnel ceiling)", flush=True)
            continue
        kw = dict(negative_prompt=NEGATIVE, num_frames=frames, height=512,
                  width=512, guidance_scale=7.5, num_inference_steps=steps,
                  scheduler=scheduler, seed=42, output_type="np",
                  decode_chunk=8)
        t0 = time.time()
        pipe(PROMPT, **kw)
        print(f"{spec}: compile+first {time.time() - t0:.1f} s "
              f"({n_win} windows/step)", flush=True)
        t0 = time.time()
        out = pipe(PROMPT, **kw)
        dt = time.time() - t0
        per_eval = dt / (n_win * steps)
        rows.append((frames, scheduler, steps, n_win, dt, frames / dt,
                     per_eval))
        print(f"{spec}: {dt:.2f} s/video  {frames / dt:.3f} f/s  "
              f"{per_eval * 1e3:.0f} ms/window-eval", flush=True)
        del out

    print("\nframes scheduler steps windows s/video f/s ms/window-eval")
    for r in rows:
        print(f"{r[0]:>6} {r[1]:>9} {r[2]:>5} {r[3]:>7} {r[4]:>7.2f} "
              f"{r[5]:>5.3f} {r[6] * 1e3:>7.0f}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         "16:dpm:16,24:dpm:16,32:dpm:16,48:dpm:12")
