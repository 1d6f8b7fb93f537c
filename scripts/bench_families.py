#!/usr/bin/env python
"""Per-family headline benchmarks — every BASELINE.json config, one chip.

BASELINE.json names five configs; AnimateDiff (bench.py, 11.4 s/video) and
SVD (bench_svd_northstar.py, 52.9 s) are benched elsewhere. This script
measures the remaining three at their headline shapes:

  * ModelScope UNet3D (1.7B-class), 16f @256^2, 8 DDIM steps   (configs[0])
  * CogVideoX-2B DiT + T5-XXL + causal VAE, 49f @480x720, 50 steps (configs[3])
  * Latte-XL DiT, 16f @512^2, 50 DDIM steps                    (configs[4])

Methodology per PERF.md: tunnel warm-up first, on-device random params,
fresh seeds per timed dispatch, host materialisation closes the timing,
best-of-2. Families run in separate subprocesses so one OOM cannot take
down the rest (pass family names as argv to run a subset).
"""

import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

FAMILIES = ("modelscope", "latte", "cogvideox", "cogvideox_pab")


def _bench(pipe, call_kwargs, n_frames, name):
    import jax  # noqa: F401

    t0 = time.time()
    out = pipe(**call_kwargs, seed=1234)
    out.frames[0][0, 0, 0, 0]
    compile_s = time.time() - t0
    print(f"compile+first {compile_s:.1f} s", flush=True)
    assert out.frames[0].shape[0] == n_frames, out.frames[0].shape
    shape = out.frames[0].shape
    del out  # big-shape families (CogVideoX 49f@480x720) OOM if two
    times = []  # requests' buffers overlap
    for i in range(max(1, int(os.environ.get("VDX_BENCH_RUNS", "2")))):
        t0 = time.time()
        out = pipe(**call_kwargs, seed=100 + i)
        out.frames[0][0, 0, 0, 0]
        del out
        times.append(time.time() - t0)
        print(f"run {i}: {times[-1]:.2f} s", flush=True)
    sec = min(times)
    print(
        f"RESULT {name}: {sec:.2f} s/video "
        f"({n_frames / sec:.3f} frames/s, compile {compile_s:.1f} s, "
        f"frames {shape})",
        flush=True,
    )


def run_modelscope():
    import jax.numpy as jnp

    from vdx.core.dtypes import Policy
    from vdx.models.unet3d import UNet3DConfig
    from vdx.pipelines import TextToVideoMSPipeline

    policy = Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    t0 = time.time()
    pipe = TextToVideoMSPipeline.with_random_params(
        seed=0, unet_config=UNet3DConfig.modelscope(), policy=policy
    )
    print(f"init {time.time() - t0:.1f} s", flush=True)
    _bench(
        pipe,
        dict(prompt="a panda eating bamboo on a rock",
             negative_prompt="low quality", num_frames=16, height=256,
             width=256, num_inference_steps=8, guidance_scale=9.0,
             output_type="np", decode_chunk=8),
        16, "modelscope 16f@256^2 8 steps",
    )


def run_latte():
    import jax.numpy as jnp

    from vdx.core.dtypes import Policy
    from vdx.models.dit import LatteConfig
    from vdx.pipelines import LattePipeline

    policy = Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    t0 = time.time()
    pipe = LattePipeline.with_random_params(
        seed=0, unet_config=LatteConfig.xl(), policy=policy
    )
    print(f"init {time.time() - t0:.1f} s", flush=True)
    _bench(
        pipe,
        dict(prompt="a dog running through a meadow",
             negative_prompt="low quality", num_frames=16, height=512,
             width=512, num_inference_steps=50, guidance_scale=7.5,
             output_type="np", decode_chunk=8),
        16, "latte-xl 16f@512^2 50 steps",
    )


def run_cogvideox(pab: bool = False):
    import jax.numpy as jnp

    from vdx.core.dtypes import Policy
    from vdx.models.cogvideox import CogVideoXConfig
    from vdx.pipelines import CogVideoXPipeline

    policy = Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    t0 = time.time()
    # T5-XXL (9.4 GB) host-offloads after encode — it doesn't co-fit with
    # the generate program's working set on one chip (PERF.md)
    kwargs = dict(
        seed=0, dit_config=CogVideoXConfig.b2(), policy=policy,
        offload_text_encoder=True,
    )
    if pab:
        # turbo: joint-attention broadcast (the family's one PAB site);
        # build the PAB pipeline in ONE shot — a second pipeline object
        # while the first holds device params OOMs at the T5 encode put
        from vdx.pipelines.base import PABConfig

        kwargs["pab"] = PABConfig(
            joint_interval=2, warmup_steps=2, cooldown_steps=2
        )
    pipe = CogVideoXPipeline.with_random_params(**kwargs)
    print(f"init {time.time() - t0:.1f} s", flush=True)
    call = dict(prompt="a sailboat gliding across a calm lake at dawn",
                num_frames=49, height=480, width=720,
                num_inference_steps=50, guidance_scale=6.0,
                # untiled causal decode peaks at 18.4 GB > HBM at this shape
                # (PERF.md); 40-latent tiles keep it ~2.7 GB
                decode_spatial_tile=40, output_type="np",
                # 50-step monolithic dispatch may exceed the tunnel's ~55 s
                # worker ceiling; the parent retries with chunked dispatch
                dispatch_steps=int(os.environ.get("VDX_DISPATCH_STEPS", "0")))
    if pab:
        # PAB cannot segment (the attention cache is internal to the one
        # program), so this is a MONOLITHIC 50-step dispatch
        call["dispatch_steps"] = 0
        _bench(pipe, call, 49, "cogvideox-2b 49f@480x720 50 steps PAB(joint/2)")
        return
    _bench(pipe, call, 49, "cogvideox-2b 49f@480x720 50 steps")


def main() -> None:
    which = sys.argv[1:] or list(FAMILIES)
    if len(which) == 1:
        # child mode: run one family in-process
        import jax
        import numpy as np

        t0 = time.time()
        np.asarray(jax.jit(lambda a: a * 2)(
            jax.device_put(np.ones((8, 8), np.float32))))
        print(f"tunnel warmup {time.time() - t0:.1f} s", flush=True)
        {"modelscope": run_modelscope, "latte": run_latte,
         "cogvideox": run_cogvideox,
         "cogvideox_pab": lambda: run_cogvideox(pab=True)}[which[0]]()
        return
    for fam in which:
        print(f"=== {fam} ===", flush=True)
        proc = subprocess.run([sys.executable, __file__, fam], timeout=5400)
        if proc.returncode != 0 and fam.startswith("cogvideox"):
            # likely the ~55 s dispatch ceiling — retry chunked (10-step
            # segments, device-resident carry; PERF.md methodology #0)
            print(f"{fam}: rc={proc.returncode}; retrying with "
                  "dispatch_steps=10", flush=True)
            env = dict(os.environ, VDX_DISPATCH_STEPS="10")
            proc = subprocess.run([sys.executable, __file__, fam],
                                  timeout=5400, env=env)
        if proc.returncode != 0:
            print(f"RESULT {fam}: FAILED rc={proc.returncode}", flush=True)


if __name__ == "__main__":
    main()
