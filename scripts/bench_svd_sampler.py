#!/usr/bin/env python
"""SVD sampler sweep at the north-star shape: Euler-EDM vs DPM-Solver++(2M).

Same seeded 25f @576x1024 img2vid workload as bench_svd_northstar.py; this
probe answers "how many dpm_edm steps match the 25-step Euler trajectory?"
and what that does to wall-clock. Drift is scored the way the turbo modes
are (scripts/svd_skip_drift.py): decoded-frame PSNR vs a FINE-grid Euler
reference of the same seed (the ODE ground truth), plus the flicker index.

    python -u scripts/bench_svd_sampler.py run edm:100,edm:25,dpm_edm:12
    python -u scripts/bench_svd_sampler.py compare          # PSNR table

(comma-separated specs share one process: params init and the tunnel
warm-up are paid once).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
RUNS = ROOT / "artifacts" / "svd_sampler_sweep"


def run(specs: str):
    import jax.numpy as jnp

    from vdx.core.cache import enable_compilation_cache
    from vdx.core.dtypes import Policy
    from vdx.models.clip_vision import CLIPVisionConfig
    from vdx.models.svd_unet import SVDUNetConfig
    from vdx.models.vae import VAEConfig
    from vdx.pipelines.svd import SVDImg2VidPipeline

    enable_compilation_cache()
    RUNS.mkdir(parents=True, exist_ok=True)
    policy = Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    variable = 0
    if specs.startswith("var,"):
        # one variable-steps program serves every step count in the sweep
        specs = specs[4:]
        variable = max(int(s.split(":")[1]) for s in specs.split(","))
    t0 = time.time()
    pipe = SVDImg2VidPipeline.with_random_params(
        seed=0,
        unet_config=SVDUNetConfig.svd(),
        vae_config=VAEConfig.sd15(),
        vision_config=CLIPVisionConfig.vit_h(),
        policy=policy,
        variable_steps=variable,
    )
    print(f"init: {time.time() - t0:.1f} s (variable_steps={variable})",
          flush=True)
    img = np.random.default_rng(42).random((576, 1024, 3)).astype(np.float32)
    for spec in specs.split(","):
        scheduler, steps = spec.split(":")
        steps = int(steps)
        kw = dict(num_frames=25, height=576, width=1024, decode_chunk=5,
                  seed=3, output_type="np", scheduler=scheduler,
                  num_inference_steps=steps)
        t0 = time.time()
        out = pipe(img, **kw)
        print(f"{spec}: compile+first {time.time() - t0:.1f} s", flush=True)
        t0 = time.time()
        out = pipe(img, **kw)
        print(f"{spec}: {time.time() - t0:.1f} s/video", flush=True)
        np.save(RUNS / f"{scheduler}_{steps:03d}.npy", out.frames[0])


def compare():
    ref_path = RUNS / "edm_100.npy"
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
        print(f"{f.stem}: {psnr:.1f} dB vs fine-grid reference; "
              f"flicker {flicker(x):.4f}", flush=True)


if __name__ == "__main__":
    arg = sys.argv[1] if len(sys.argv) > 1 else "compare"
    if arg == "compare":
        compare()
    else:
        run(sys.argv[2] if len(sys.argv) > 2 else "edm:25,dpm_edm:12")
