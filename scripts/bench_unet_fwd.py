#!/usr/bin/env python
"""Time the SD-1.5 UNetMotion forward at the bench workload shape.

K forwards are chained inside ONE jitted scan so the tunnel's per-dispatch
latency (~0.8 s) amortizes away; fresh on-device inputs per timed call
defeat the tunnel's memoization (PERF.md methodology).

Usage: python -u scripts/bench_unet_fwd.py [K]
Env:   VDX_GN_IMPL=xla  to disable the fused GroupNorm kernel (A/B).
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    from vdx.core.cache import enable_compilation_cache
    from vdx.core.dtypes import Policy
    from vdx.models.unet_motion import UNetMotion, UNetMotionConfig

    enable_compilation_cache()
    print("backend:", jax.default_backend(),
          "gn:", os.environ.get("VDX_GN_IMPL", "pallas"), "K:", K, flush=True)

    policy = Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    cfg = UNetMotionConfig.sd15()
    model = UNetMotion(cfg, policy=policy)
    B, F, H, W = 2, 16, 64, 64

    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 2, 8, 8, cfg.in_channels)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, cfg.cross_attention_dim)),
    )
    rng = np.random.default_rng(0)
    leaves, tdef = jax.tree.flatten(shapes)
    params = jax.tree.unflatten(tdef, [
        jnp.asarray((rng.standard_normal(l.shape) * 0.02).astype(np.float32),
                    dtype=l.dtype) for l in leaves
    ])
    ctx = jnp.asarray(rng.standard_normal((B, 77, cfg.cross_attention_dim)),
                      jnp.bfloat16)
    t = jnp.full((B,), 500, jnp.int32)

    @jax.jit
    def fwd_loop(params, x0, t, ctx):
        def body(c, _):
            eps = model.apply(params, c, t, ctx)
            return (c + 0.001 * eps.astype(jnp.float32)).astype(c.dtype), ()
        out, _ = jax.lax.scan(body, x0, None, length=K)
        return out

    def fresh(i):
        x = jax.random.normal(jax.random.PRNGKey(i), (B, F, H, W, 4),
                              jnp.float32).astype(jnp.bfloat16)
        float(jnp.sum(x))  # materialize before timing
        return x

    t0 = time.time()
    out = fwd_loop(params, fresh(0), t, ctx)
    float(jnp.sum(out))
    print(f"compile+first: {time.time() - t0:.1f} s", flush=True)

    times = []
    for i in range(1, 4):
        x = fresh(i)
        t0 = time.time()
        out = fwd_loop(params, x, t, ctx)
        float(jnp.sum(out))
        times.append(time.time() - t0)
        print(f"iter {i}: {times[-1]:.3f} s ({times[-1]/K*1e3:.1f} ms/fwd)",
              flush=True)
    best = min(times)
    print(f"BEST: {best/K*1e3:.1f} ms per UNet forward (K={K})", flush=True)


if __name__ == "__main__":
    main()
