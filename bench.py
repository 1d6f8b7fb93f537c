#!/usr/bin/env python
"""Benchmark: end-to-end text-to-video generation throughput on one chip.

Workload = the reference's headline configuration (16 frames @ 512x512,
25 DDIM steps, CFG 7.5 — reference experiments/05_grid_search_ablation.py:40-51)
through the full jitted pipeline: CLIP encode -> 25-step lax.scan denoise with
CFG batched into one UNetMotion forward (SD-1.5 + motion, 1.3B params, bf16,
Pallas flash attention) -> frame-tiled VAE decode -> uint8 frames.

Baseline: the reference generates ~2 min/video on an RTX 3060 (~0.133
frames/s end-to-end, BASELINE.md). vs_baseline = ours / 0.1333.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

value = steady-state throughput (K videos pipelined one request deep: the
12 MB uint8 frame readback of video i overlaps video i+1's denoise — on
the tunneled backend that transfer is ~0.4-1.0 s of otherwise dead time).
"latency_s" reports the sequential request->frames-on-host wall-clock.

Note: weights are seeded-random (the zero-egress build env has no model hub);
throughput is weight-value-independent. Each timed run uses a fresh seed so
no dispatch-level caching can short-circuit execution.
"""

import json
import sys
import time


def main() -> None:
    try:
        _run()
    except Exception as e:  # noqa: BLE001 — driver needs the JSON line regardless
        print(
            json.dumps(
                {
                    "metric": "frames/sec/chip end-to-end (16f @512^2, 25 steps, CFG)",
                    "value": 0.0,
                    "unit": "frames/s",
                    "vs_baseline": 0.0,
                    "error": f"{type(e).__name__}: {e}"[:300],
                }
            )
        )
        raise


def _run() -> None:
    import jax
    import jax.numpy as jnp

    from vdx.core.cache import enable_compilation_cache
    from vdx.core.dtypes import Policy
    from vdx.pipelines import AnimateDiffPipeline

    enable_compilation_cache()  # second-process runs skip the 200+ s scan compile

    # Tunnel warm-up, measured separately: the remote-dispatch backend pays
    # a large one-time cost on the FIRST device->host transfer of a process
    # (~70 s measured, scripts/bench_startup_floor.py) — a property of the
    # tunnel, not of the framework's init or compile.
    import numpy as np

    t0 = time.time()
    warm = jax.device_put(np.ones((8, 8), np.float32))
    np.asarray(jax.jit(lambda a: a * 2)(warm))
    tunnel_warmup_s = time.time() - t0

    policy = Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    t0 = time.time()
    pipe = AnimateDiffPipeline.with_random_params(
        seed=0, policy=policy, scheduler="ddim"
    )
    init_s = time.time() - t0

    kwargs = dict(
        negative_prompt="bad quality, blurry, distorted",
        num_frames=16,
        guidance_scale=7.5,
        num_inference_steps=25,
        height=512,
        width=512,
        decode_chunk=8,
    )
    prompt = "a corgi walking on the beach, sunset lighting, high quality"

    # Warmup (compile)
    t0 = time.time()
    out = pipe(prompt, seed=1234, output_type="np", **kwargs)
    assert out.frames[0].shape == (16, 512, 512, 3)
    compile_s = time.time() - t0

    # Per-video latency: request -> frames on host, fresh seed each so no
    # dispatch-level caching can short-circuit execution.
    lat = []
    for i in range(2):
        t0 = time.time()
        out = pipe(prompt, seed=100 + i, output_type="np", **kwargs)
        out.frames[0][0, 0, 0, 0]  # force host materialisation
        lat.append(time.time() - t0)
    latency_s = min(lat)

    # Steady-state throughput: K requests pipelined one deep — video i's
    # 12 MB device->host frame transfer rides under video i+1's denoise
    # (output_type="device" + JAX async dispatch; the transfer is dead
    # time in the sequential mode, PERF.md round-3 cont.). Every video is
    # still fully materialised on the host inside the timed window.
    K = 4
    t0 = time.time()
    prev = None
    for i in range(K):
        out = pipe(prompt, seed=200 + i, output_type="device", **kwargs)
        if prev is not None:
            f = np.asarray(prev.frames)
            assert f.shape == (1, 16, 512, 512, 3) and f.dtype == np.uint8
        prev = out
    f = np.asarray(prev.frames)
    assert f.shape == (1, 16, 512, 512, 3) and f.dtype == np.uint8
    sec_per_video = (time.time() - t0) / K

    frames_per_sec = 16.0 / sec_per_video
    baseline_fps = 16.0 / 120.0  # reference: ~2 min/video (README.md:194-197)

    result = {
        "metric": "frames/sec/chip end-to-end (16f @512^2, 25 steps, CFG)",
        "value": round(frames_per_sec, 4),
        "unit": "frames/s",
        "vs_baseline": round(frames_per_sec / baseline_fps, 2),
        "sec_per_video": round(sec_per_video, 3),
        "latency_s": round(latency_s, 3),
        "compile_s": round(compile_s, 1),
        "init_s": round(init_s, 1),
        "tunnel_warmup_s": round(tunnel_warmup_s, 1),
        "backend": jax.default_backend(),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
