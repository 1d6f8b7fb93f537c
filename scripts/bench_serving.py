#!/usr/bin/env python
"""Serving throughput: sequential vs concurrent requests on one chip.

GenerationService holds the device lock only until the generate program
is ENQUEUED (output_type="device"); the 12 MB frame readback + PNG/base64
encode of request i then run while request i+1's denoise executes. This
probe measures what that buys at the bench workload.

Usage: python scripts/bench_serving.py [K]
"""

import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from vdx.core.cache import enable_compilation_cache
    from vdx.core.dtypes import Policy
    from vdx.pipelines import AnimateDiffPipeline
    from vdx.serving.server import GenerationService

    enable_compilation_cache()
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    np.asarray(jax.jit(lambda a: a * 2)(jax.device_put(np.ones((8, 8), np.float32))))
    policy = Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    pipe = AnimateDiffPipeline.with_random_params(seed=0, policy=policy,
                                                  scheduler="ddim")
    svc = GenerationService(pipe, defaults=dict(
        negative_prompt="bad quality", num_frames=16, guidance_scale=7.5,
        num_inference_steps=25, height=512, width=512, decode_chunk=8,
    ))

    def req(seed):
        r = svc.generate({"prompt": "a corgi on the beach", "seed": seed})
        assert len(r["frames"]) == 16
        return r

    t0 = time.time()
    req(999)
    print(f"compile+first {time.time() - t0:.1f} s", flush=True)

    t0 = time.time()
    for i in range(K):
        req(100 + i)
    seq = (time.time() - t0) / K
    print(f"sequential: {seq:.3f} s/request", flush=True)

    threads = [threading.Thread(target=req, args=(200 + i,)) for i in range(K)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    conc = (time.time() - t0) / K
    print(f"concurrent x{K}: {conc:.3f} s/request aggregate "
          f"({seq / conc:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
