#!/usr/bin/env python
"""AnimateDiff sampler sweep at the bench workload: DDIM vs DPM-Solver++(2M).

Same question bench_svd_sampler.py answered for SVD, asked of the flagship
family (16f @512^2, CFG 7.5, SD-1.5-size UNetMotion, bf16): how many `dpm`
multistep steps match the 25-step DDIM trajectory, and what does that do to
wall-clock? Drift is decoded-frame PSNR against the 25-step dpm trajectory
(second order: its own error sits well under both candidates'; the CPU
tests pin the unbiased ordering for the EDM twin of this sampler).

    python -u scripts/bench_ad_sampler.py run dpm:25,ddim:25,dpm:16,dpm:13
    python -u scripts/bench_ad_sampler.py compare
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
RUNS = ROOT / "artifacts" / "ad_sampler_sweep"

PROMPT = "a portrait of a woman, highly detailed, studio lighting"
NEGATIVE = "bad quality, blurry, distorted"


def run(specs: str):
    import jax.numpy as jnp

    from vdx.core.cache import enable_compilation_cache
    from vdx.core.dtypes import Policy
    from vdx.pipelines import AnimateDiffPipeline

    enable_compilation_cache()
    RUNS.mkdir(parents=True, exist_ok=True)
    variable = 0
    if specs.startswith("var,"):
        # variable_steps=50 matches the grid study's warmed program shape
        # (ONE compile serves every step count <= 50 per sampler)
        specs = specs[4:]
        variable = 50
    policy = Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    t0 = time.time()
    pipe = AnimateDiffPipeline.with_random_params(
        seed=0, policy=policy, scheduler="ddim", variable_steps=variable
    )
    print(f"init: {time.time() - t0:.1f} s (variable_steps={variable})",
          flush=True)
    for spec in specs.split(","):
        scheduler, steps = spec.split(":")
        steps = int(steps)
        kw = dict(negative_prompt=NEGATIVE, num_frames=16, height=512,
                  width=512, guidance_scale=7.5, num_inference_steps=steps,
                  scheduler=scheduler, seed=42, output_type="np")
        t0 = time.time()
        out = pipe(PROMPT, **kw)
        print(f"{spec}: compile+first {time.time() - t0:.1f} s", flush=True)
        t0 = time.time()
        out = pipe(PROMPT, **kw)
        dt = time.time() - t0
        print(f"{spec}: {dt:.2f} s/video ({16 / dt:.2f} frames/s)", flush=True)
        np.save(RUNS / f"{scheduler}_{steps:03d}.npy", out.frames[0])


def compare():
    ref_path = RUNS / "dpm_025.npy"
    ref = np.load(ref_path).astype(np.float64) / 255.0

    def flicker(x):
        return np.abs(x[:-2] - 2 * x[1:-1] + x[2:]).mean()

    print(f"reference: {ref_path.stem} (flicker {flicker(ref):.4f})")
    for f in sorted(RUNS.glob("*.npy")):
        if f == ref_path:
            continue
        x = np.load(f).astype(np.float64) / 255.0
        mse = ((ref - x) ** 2).mean()
        psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
        print(f"{f.stem}: {psnr:.1f} dB vs converged; "
              f"flicker {flicker(x):.4f}", flush=True)


if __name__ == "__main__":
    arg = sys.argv[1] if len(sys.argv) > 1 else "compare"
    if arg == "compare":
        compare()
    else:
        run(sys.argv[2] if len(sys.argv) > 2 else "dpm:25,ddim:25,dpm:13")
