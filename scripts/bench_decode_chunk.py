#!/usr/bin/env python
"""Sweep the VAE decode chunk at the bench workload (16f @512^2).

Round-1 swept {2, 8, 16} (chunk=8 won at 395 ms); this adds 4 and
re-measures on the current stack (fused GN default-on since round 2).
K-chained per PERF.md methodology: decode K fresh latent sets inside one
jitted scan so the tunnel dispatch amortises.

Usage: python scripts/bench_decode_chunk.py [chunks...]
"""

import sys
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

    enable_compilation_cache()
    chunks = [int(c) for c in sys.argv[1:]] or [4, 8]
    K = 6

    np.asarray(jax.jit(lambda a: a * 2)(jax.device_put(np.ones((8, 8), np.float32))))
    policy = Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    t0 = time.time()
    pipe = AnimateDiffPipeline.with_random_params(seed=0, policy=policy)
    print(f"init {time.time() - t0:.1f} s", flush=True)

    lat = jax.device_put(
        np.random.default_rng(0).standard_normal((1, 16, 64, 64, 4))
        .astype(np.float32)
    )

    for chunk in chunks:
        decode = pipe._decode_raw(chunk)

        @jax.jit
        def loop(params, lat, decode=decode):
            def body(c, _):
                out = decode(params, c)
                # perturb latents from the OUTPUT so every iteration is a
                # fresh computation the tunnel cannot memoize
                c = c + 1e-3 * out[..., :4].astype(c.dtype).mean()
                return c, out[0, 0, 0, 0]
            _, last = jax.lax.scan(body, lat, None, length=K)
            return last

        t0 = time.time()
        np.asarray(loop(pipe.params, lat))
        compile_s = time.time() - t0
        times = []
        for i in range(3):
            fresh = lat + i * 1e-3
            t0 = time.time()
            np.asarray(loop(pipe.params, fresh))
            times.append((time.time() - t0) / K)
        print(f"chunk={chunk}: {min(times) * 1000:.1f} ms/decode "
              f"(compile {compile_s:.1f} s)", flush=True)


if __name__ == "__main__":
    main()
