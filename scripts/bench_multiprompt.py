#!/usr/bin/env python
"""Multi-prompt batched generation throughput (NOTES_r4 #8 rerun).

``pipe([p1, p2], seed=[s1, s2])`` runs N videos in ONE compiled program
(tests pin per-video bit-equality to single calls); this measures what the
batching is worth at the full bench workload (16f @512^2, 25 DDIM steps,
CFG) on one chip: the CFG-batched UNet forward goes B=2 -> B=4, feeding
the MXU wider at the same step count.

Methodology per PERF.md: warm persistent cache, fresh seeds per timed
dispatch, host materialisation closes each timing, best-of over repeats.

Usage: python scripts/bench_multiprompt.py [batch_sizes...]  (default 1 2)
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from vdx.core.cache import enable_compilation_cache
from vdx.core.dtypes import Policy
from vdx.pipelines import AnimateDiffPipeline


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [1, 2]
    enable_compilation_cache()
    import numpy as np

    t0 = time.time()
    np.asarray(jax.jit(lambda a: a * 2)(jax.device_put(np.ones((8, 8), np.float32))))
    print(f"tunnel warmup {time.time() - t0:.1f} s", flush=True)

    policy = Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    t0 = time.time()
    pipe = AnimateDiffPipeline.with_random_params(
        seed=0, policy=policy, scheduler="ddim"
    )
    print(f"init {time.time() - t0:.1f} s", flush=True)

    kwargs = dict(
        negative_prompt="bad quality, blurry, distorted",
        num_frames=16, guidance_scale=7.5, num_inference_steps=25,
        height=512, width=512, output_type="np", decode_chunk=8,
    )
    prompts = [
        "a corgi walking on the beach, sunset lighting, high quality",
        "a red sports car driving down a mountain road",
        "waves crashing on rocks, slow motion, golden hour",
        "a hot air balloon drifting over snowy peaks",
    ]

    results = {}
    for b in sizes:
        ps = prompts[:b] if b > 1 else prompts[0]
        seeds = list(range(1000, 1000 + b)) if b > 1 else 1000
        t0 = time.time()
        out = pipe(ps, seed=seeds, **kwargs)
        compile_s = time.time() - t0
        assert len(out.frames) == b and out.frames[0].shape == (16, 512, 512, 3)
        times = []
        for i in range(3):
            ss = [100 + b * 10 + i + j for j in range(b)] if b > 1 else 100 + i
            t0 = time.time()
            out = pipe(ps, seed=ss, **kwargs)
            for f in out.frames:
                f[0, 0, 0, 0]  # host materialisation
            times.append(time.time() - t0)
        sec = min(times)
        fps = 16.0 * b / sec
        results[b] = (sec, fps)
        print(
            f"batch={b}: {sec:.2f} s/dispatch = {sec / b:.2f} s/video, "
            f"{fps:.3f} frames/s aggregate (compile {compile_s:.1f} s)",
            flush=True,
        )

    if 1 in results and 2 in results:
        s1, f1 = results[1]
        s2, f2 = results[2]
        print(
            f"batch-2 speedup: {f2 / f1:.2f}x aggregate throughput, "
            f"{s2 / s1:.2f}x dispatch latency"
        )


if __name__ == "__main__":
    main()
