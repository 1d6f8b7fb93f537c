#!/usr/bin/env python
"""SVD north-star probe: 25f img2vid @576x1024, 25 EDM steps, single chip.

BASELINE.md north star: <10 s wall-clock on v5e-8 (8 chips). This measures
the single-chip datapoint (round 1: 63.4 s) with the current kernel stack.
Methodology per PERF.md: fresh image per timed run, host materialisation,
compile excluded (first call), bf16 production config.

Usage: python -u scripts/bench_svd_northstar.py [runs] [pab|skip[:thr]|dpm[:N]]
  optional 2nd arg "pab" measures the PAB turbo schedule (temporal-only —
  the all-sites cache OOMs at this resolution) instead of exact mode;
  "skip" / "skip:0.12" measures the adaptive step-skip turbo mode (whole
  model evaluations reused under the drift threshold — carry is 2 extra
  fp32 latent buffers, no attention cache, so it FITS at 576x1024 where
  all-sites PAB cannot);
  "dpm" / "dpm:12" measures the EXACT-CLASS fast sampler — DPM-Solver++
  (2M) on the EDM grid at N steps (12 steps >= 25-step Euler trajectory
  accuracy, measured: PERF.md / scripts/bench_svd_sampler.py).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    import jax.numpy as jnp

    from vdx.core.cache import enable_compilation_cache
    from vdx.core.dtypes import Policy
    from vdx.models.clip_vision import CLIPVisionConfig
    from vdx.models.svd_unet import SVDUNetConfig
    from vdx.models.vae import VAEConfig
    from vdx.pipelines.svd import SVDImg2VidPipeline

    enable_compilation_cache()
    mode = sys.argv[2] if len(sys.argv) > 2 else "exact"
    pab = skip = None
    if mode == "pab":
        from vdx.pipelines.base import PABConfig

        # Temporal-only broadcast: at 576x1024 the all-sites cache is
        # ~10 GB and OOMs the single chip (measured 18.3 G > 15.75 G HBM);
        # interval-1 types now allocate NO cache, leaving ~5 GB of
        # temporal caches against the ~680 ms/fwd temporal-transformer
        # share (PERF.md round-3 attribution).
        pab = PABConfig(spatial_interval=1, temporal_interval=4,
                        cross_interval=1)
    elif mode.startswith("skip"):
        from vdx.pipelines.base import SkipConfig

        thr = float(mode.split(":")[1]) if ":" in mode else 0.12
        skip = SkipConfig(threshold=thr, warmup_steps=3, cooldown_steps=3)
    scheduler, steps = "edm", 25
    if mode.startswith("dpm"):
        scheduler = "dpm_edm"
        steps = int(mode.split(":")[1]) if ":" in mode else 12
    print("backend:", jax.default_backend(), "mode:", mode, flush=True)
    policy = Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    t0 = time.time()
    pipe = SVDImg2VidPipeline.with_random_params(
        seed=0,
        unet_config=SVDUNetConfig.svd(),
        vae_config=VAEConfig.sd15(),
        vision_config=CLIPVisionConfig.vit_h(),
        policy=policy,
        pab=pab,
        skip=skip,
    )
    print(f"init: {time.time() - t0:.1f} s", flush=True)

    def fresh(i):
        rng = np.random.default_rng(i)
        return rng.random((576, 1024, 3)).astype(np.float32)

    kw = dict(num_frames=25, height=576, width=1024,
              num_inference_steps=steps, scheduler=scheduler,
              decode_chunk=5, seed=3, output_type="np")
    t0 = time.time()
    out = pipe(fresh(0), **kw)
    print(f"compile+first: {time.time() - t0:.1f} s "
          f"(frames {out.frames[0].shape})", flush=True)
    times = []
    for i in range(1, runs + 1):
        img = fresh(i)
        t0 = time.time()
        out = pipe(img, **kw)
        assert out.frames[0].dtype == np.uint8
        times.append(time.time() - t0)
        extra = f" ({int(out.n_evals)}/25 evals)" if skip else ""
        print(f"run {i}: {times[-1]:.1f} s{extra}", flush=True)
    best = min(times)
    print(f"BEST: {best:.1f} s/video single-chip "
          f"({25 / best:.2f} frames/s; 8-chip linear projection "
          f"{best / 8:.1f} s vs <10 s target)", flush=True)


if __name__ == "__main__":
    main()
