#!/usr/bin/env python
"""128-frame clips on ONE chip: chunked dispatch beats the tunnel ceiling.

The axon tunnel's TPU worker crashes on single dispatches past ~55-60 s
(PERF.md methodology #0), which capped single-chip long clips at 64f@12
steps (38 s). ``dispatch_steps=K`` splits the denoise into chained K-step
programs with DEVICE-RESIDENT latents + sampler carry between dispatches
(pipelines/base._run_generate_segmented) — bit-identical to the monolithic
program (tests/test_pipeline.py::TestSegmentedDispatch), with only the
~40 ms steady-state per-dispatch overhead added per segment.

Measures the monolithic 64f program against its segmented equivalent
(overhead check) and then the 128f clip no monolithic program can run.

    python -u scripts/bench_longclip_chunked.py
    python -u scripts/bench_longclip_chunked.py 64:12:4,128:12:3
    # spec = frames:steps:dispatch_steps (dispatch_steps 0 = monolithic)
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

PROMPT = "a portrait of a woman, highly detailed, studio lighting"
NEGATIVE = "bad quality, blurry, distorted"
DEFAULT = "64:12:0,64:12:4,128:12:3"


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
        frames, steps, k = (int(v) for v in spec.split(":"))
        n_win = (len(window_starts(frames, ctx.frames, ctx.stride))
                 if frames > ctx.frames else 1)
        seg = f"K={k} ({-(-steps // k)} dispatches)" if k else "monolithic"
        kw = dict(negative_prompt=NEGATIVE, num_frames=frames, height=512,
                  width=512, guidance_scale=7.5, num_inference_steps=steps,
                  scheduler="dpm", seed=42, output_type="np",
                  decode_chunk=8, dispatch_steps=k)
        t0 = time.time()
        pipe(PROMPT, **kw)
        print(f"{spec}: compile+first {time.time() - t0:.1f} s "
              f"({n_win} windows/step, {seg})", flush=True)
        t0 = time.time()
        out = pipe(PROMPT, **{**kw, "seed": 43})
        dt = time.time() - t0
        per_eval = dt / (n_win * steps)
        rows.append((frames, steps, k, n_win, dt, frames / dt, per_eval))
        print(f"{spec}: {dt:.2f} s/video  {frames / dt:.3f} f/s  "
              f"{per_eval * 1e3:.0f} ms/window-eval  [{seg}]", flush=True)
        del out

    print("\n| frames | steps | K | windows/step | s/video | f/s | ms/window-eval |")
    print("|---:|---:|---:|---:|---:|---:|---:|")
    for f, st, k, w, dt, fps, pe in rows:
        print(f"| {f} | {st} | {k or '-'} | {w} | {dt:.2f} | {fps:.2f} | "
              f"{pe * 1e3:.0f} |")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else DEFAULT)
