#!/usr/bin/env python
"""Does device->host frame readback overlap the next video's denoise?

The bench workload's end-to-end time includes ~0.7-1.0 s of D2H for the
12 MB of uint8 frames through the tunnel (PERF.md round-1 table). With
JAX async dispatch the NEXT request's program can be enqueued before the
previous request's frames are pulled, so a throughput measurement should
hide that transfer entirely — IF the tunnel actually overlaps transfers
with compute. This probe measures both modes on the bench workload:

  sequential : out = pipe(...); np.asarray(out.frames)  per video
  pipelined  : pipe(..., output_type="device") x K, then materialise
               in order (transfer of video i rides under compute of i+1)

Usage: python scripts/bench_overlap.py [K]
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from vdx.core.cache import enable_compilation_cache
    from vdx.core.dtypes import Policy
    from vdx.pipelines import AnimateDiffPipeline

    enable_compilation_cache()
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    # tunnel warm-up (first D2H pays a one-time cost; PERF.md methodology)
    np.asarray(jax.jit(lambda a: a * 2)(jax.device_put(np.ones((8, 8), np.float32))))

    policy = Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    t0 = time.time()
    pipe = AnimateDiffPipeline.with_random_params(seed=0, policy=policy,
                                                  scheduler="ddim")
    print(f"init {time.time() - t0:.1f} s", flush=True)

    kwargs = dict(
        negative_prompt="bad quality, blurry, distorted",
        num_frames=16, guidance_scale=7.5, num_inference_steps=25,
        height=512, width=512, decode_chunk=8,
    )
    prompt = "a corgi walking on the beach, sunset lighting, high quality"

    t0 = time.time()
    out = pipe(prompt, seed=999, output_type="np", **kwargs)
    assert out.frames[0].shape == (16, 512, 512, 3)
    print(f"compile+first {time.time() - t0:.1f} s", flush=True)

    # -- sequential (the current bench methodology) --------------------
    seq = []
    for i in range(K):
        t0 = time.time()
        out = pipe(prompt, seed=100 + i, output_type="np", **kwargs)
        out.frames[0][0, 0, 0, 0]
        seq.append(time.time() - t0)
    print(f"sequential: {seq} -> min {min(seq):.3f} s/video", flush=True)

    # -- pipelined: materialise video i under video i+1's compute ------
    t0 = time.time()
    prev = None
    for i in range(K):
        out = pipe(prompt, seed=200 + i, output_type="device", **kwargs)
        if prev is not None:
            f = np.asarray(prev.frames)
            assert f.shape == (1, 16, 512, 512, 3) and f.dtype == np.uint8
        prev = out
    f = np.asarray(prev.frames)
    total = time.time() - t0
    print(f"pipelined : {total:.3f} s / {K} = {total / K:.3f} s/video", flush=True)

    # -- enqueue-all-then-drain (upper bound on queueing wins) ----------
    t0 = time.time()
    outs = [pipe(prompt, seed=300 + i, output_type="device", **kwargs)
            for i in range(K)]
    for o in outs:
        np.asarray(o.frames)
    total = time.time() - t0
    print(f"drain-all : {total:.3f} s / {K} = {total / K:.3f} s/video", flush=True)


if __name__ == "__main__":
    main()
