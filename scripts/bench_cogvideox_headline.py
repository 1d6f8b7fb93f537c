"""CogVideoX-2B headline bench: 49f @480x720, 50 steps, CFG
(BASELINE.json configs[3]) — chunked dispatch (dispatch_steps) keeps every
program under the tunnel's ~55 s worker ceiling (PERF.md methodology #0).

Round-4 failure mode this script works around: the SECOND request
ResourceExhausted'd while the first ran fine — the steady-state peak sits
near the HBM limit, and the first request leaves the text-embed cache +
allocator fragmentation behind. Mitigations here: explicit gc between
requests and a smaller decode tile (peak scales with tile area).

Usage: python scripts/bench_cogvideox_headline.py [runs] [decode_tile] [K] [pab]
  4th arg "pab" = PABConfig(joint_interval=2) — the family's single
  broadcast site — composed WITH chunked dispatch (the cache rides the
  inter-segment carry; pipelines/base._denoise_raw_pab).
"""

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    tile = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    pab = len(sys.argv) > 4 and sys.argv[4] == "pab"

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vdx.core.dtypes import Policy
    from vdx.models.cogvideox import CogVideoXConfig
    from vdx.pipelines import CogVideoXPipeline

    t0 = time.time()
    np.asarray(jax.jit(lambda a: a * 2)(
        jax.device_put(np.ones((8, 8), np.float32))))
    print(f"tunnel warmup {time.time() - t0:.1f} s", flush=True)

    policy = Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    t0 = time.time()
    kwargs = dict(
        seed=0, dit_config=CogVideoXConfig.b2(), policy=policy,
        offload_text_encoder=True,
    )
    if pab:
        from vdx.pipelines.base import PABConfig

        kwargs["pab"] = PABConfig(joint_interval=2, warmup_steps=2,
                                  cooldown_steps=2)
    pipe = CogVideoXPipeline.with_random_params(**kwargs)
    print(f"init {time.time() - t0:.1f} s (pab={pab})", flush=True)

    call = dict(prompt="a sailboat gliding across a calm lake at dawn",
                num_frames=49, height=480, width=720,
                num_inference_steps=50, guidance_scale=6.0,
                decode_spatial_tile=tile, output_type="np",
                dispatch_steps=K)

    t0 = time.time()
    out = pipe(**call, seed=1234)
    out.frames[0][0, 0, 0, 0]
    print(f"compile+first {time.time() - t0:.1f} s "
          f"(frames {out.frames[0].shape})", flush=True)
    del out
    gc.collect()

    times = []
    for i in range(runs):
        t0 = time.time()
        out = pipe(**call, seed=100 + i)
        out.frames[0][0, 0, 0, 0]
        del out
        times.append(time.time() - t0)
        gc.collect()
        print(f"run {i}: {times[-1]:.2f} s", flush=True)
    sec = min(times)
    tag = " PAB(joint/2)" if pab else ""
    print(f"RESULT cogvideox-2b 49f@480x720 50 steps{tag} (K={K}, "
          f"tile={tile}): {sec:.2f} s/video ({49 / sec:.3f} frames/s)",
          flush=True)


if __name__ == "__main__":
    main()
