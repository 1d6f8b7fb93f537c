#!/usr/bin/env python
"""skip x dpm composition at the bench workload: the stacked frontier point.

dpm:16 already matches ddim:25's trajectory accuracy at 2.08 f/s
(bench_ad_sampler.py); this measures SkipConfig on top. Drift is scored
against the converged reference saved by the sampler sweep
(artifacts/ad_sampler_sweep/dpm_025.npy — run that first).

    python -u scripts/bench_skip_dpm.py 0.2 16
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


def main():
    thr = float(sys.argv[1]) if len(sys.argv) > 1 else 0.2
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    import jax.numpy as jnp

    from vdx.core.cache import enable_compilation_cache
    from vdx.core.dtypes import Policy
    from vdx.pipelines import AnimateDiffPipeline
    from vdx.pipelines.base import SkipConfig

    enable_compilation_cache()
    policy = Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    t0 = time.time()
    pipe = AnimateDiffPipeline.with_random_params(
        seed=0, policy=policy, scheduler="dpm",
        skip=SkipConfig(threshold=thr, warmup_steps=3, cooldown_steps=3),
    )
    print(f"init: {time.time() - t0:.1f} s", flush=True)
    kw = dict(negative_prompt=NEGATIVE, num_frames=16, height=512,
              width=512, guidance_scale=7.5, num_inference_steps=steps,
              scheduler="dpm", seed=42, output_type="np")
    t0 = time.time()
    out = pipe(PROMPT, **kw)
    print(f"compile+first {time.time() - t0:.1f} s", flush=True)
    t0 = time.time()
    out = pipe(PROMPT, **kw)
    dt = time.time() - t0
    evals = int(out.n_evals)
    print(f"skip:{thr} x dpm:{steps}: {dt:.2f} s/video "
          f"({16 / dt:.2f} frames/s), {evals}/{steps} evals", flush=True)
    np.save(RUNS / f"dpm_skip{thr}_{steps:03d}.npy", out.frames[0])

    ref_path = RUNS / "dpm_025.npy"
    if ref_path.exists():
        ref = np.load(ref_path).astype(np.float64) / 255.0
        x = out.frames[0].astype(np.float64) / 255.0
        mse = ((ref - x) ** 2).mean()
        print(f"drift vs converged (dpm:25): "
              f"{10 * np.log10(1.0 / max(mse, 1e-12)):.1f} dB", flush=True)


if __name__ == "__main__":
    main()
