#!/usr/bin/env python
"""Skip-mode drift at the REAL north-star shape (25f @576x1024, 25 EDM
steps, seeded random weights): generate the SAME seeded video exact and
with SkipConfig, dump frames, compare.

    python -u scripts/svd_skip_drift.py exact
    python -u scripts/svd_skip_drift.py skip:0.12
    python -u scripts/svd_skip_drift.py compare
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
RUNS = ROOT / "artifacts" / "svd_skip_drift"


def run(mode):
    import jax.numpy as jnp

    from vdx.core.cache import enable_compilation_cache
    from vdx.core.dtypes import Policy
    from vdx.models.clip_vision import CLIPVisionConfig
    from vdx.models.svd_unet import SVDUNetConfig
    from vdx.models.vae import VAEConfig
    from vdx.pipelines.svd import SVDImg2VidPipeline

    enable_compilation_cache()
    RUNS.mkdir(parents=True, exist_ok=True)
    skip = None
    if mode.startswith("skip"):
        from vdx.pipelines.base import SkipConfig

        thr = float(mode.split(":")[1]) if ":" in mode else 0.12
        skip = SkipConfig(threshold=thr, warmup_steps=3, cooldown_steps=3)
    policy = Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    pipe = SVDImg2VidPipeline.with_random_params(
        seed=0,
        unet_config=SVDUNetConfig.svd(),
        vae_config=VAEConfig.sd15(),
        vision_config=CLIPVisionConfig.vit_h(),
        policy=policy,
        skip=skip,
    )
    img = np.random.default_rng(42).random((576, 1024, 3)).astype(np.float32)
    t0 = time.time()
    out = pipe(img, num_frames=25, height=576, width=1024,
               num_inference_steps=25, decode_chunk=5, seed=3,
               output_type="np")
    evals = int(out.n_evals) if out.n_evals is not None else 25
    print(f"{mode}: {time.time() - t0:.1f} s ({evals}/25 evals)", flush=True)
    np.save(RUNS / f"{mode.replace(':', '_')}.npy", out.frames[0])


def compare():
    exact = np.load(RUNS / "exact.npy").astype(np.float64) / 255.0
    for f in sorted(RUNS.glob("skip_*.npy")):
        turbo = np.load(f).astype(np.float64) / 255.0
        mse = ((exact - turbo) ** 2).mean()
        psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
        def flicker(x):
            return np.abs(x[:-2] - 2 * x[1:-1] + x[2:]).mean()
        print(f"{f.stem}: {psnr:.1f} dB PSNR vs exact; "
              f"flicker {flicker(exact):.4f} -> {flicker(turbo):.4f}",
              flush=True)


if __name__ == "__main__":
    arg = sys.argv[1] if len(sys.argv) > 1 else "compare"
    if arg == "compare":
        compare()
    else:
        run(arg)
