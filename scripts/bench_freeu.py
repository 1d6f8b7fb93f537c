#!/usr/bin/env python
"""A/B the FreeU overhead on the SD-1.5 UNetMotion forward (bench shape).

FreeU (nn/freeu.py) claims zero-cost: six extra ops per forward (two
half-channel scalings + four skip FFTs at the two smallest feature maps).
This pins the claim with the standard K-chained-scan methodology
(PERF.md): same params, same inputs, freeu=None vs FreeUConfig().

Usage: python -u scripts/bench_freeu.py [K]
"""

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
    from vdx.nn.freeu import FreeUConfig

    enable_compilation_cache()
    print("backend:", jax.default_backend(), "K:", K, flush=True)

    policy = Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    cfg = UNetMotionConfig.sd15()
    B, F, H, W = 2, 16, 64, 64

    base = UNetMotion(cfg, policy=policy)
    shapes = jax.eval_shape(
        base.init, jax.random.PRNGKey(0),
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

    def make_loop(model):
        @jax.jit
        def fwd_loop(params, x0, t, ctx):
            def body(c, _):
                eps = model.apply(params, c, t, ctx)
                return (c + 0.001 * eps.astype(jnp.float32)).astype(c.dtype), ()
            out, _ = jax.lax.scan(body, x0, None, length=K)
            return out
        return fwd_loop

    def fresh(i):
        x = jax.random.normal(jax.random.PRNGKey(i), (B, F, H, W, 4),
                              jnp.float32).astype(jnp.bfloat16)
        float(jnp.sum(x))
        return x

    for name, model in [
        ("baseline", base),
        ("freeu", UNetMotion(cfg, policy=policy, freeu=FreeUConfig())),
    ]:
        loop = make_loop(model)
        t0 = time.time()
        float(jnp.sum(loop(params, fresh(0), t, ctx)))
        print(f"{name}: compile+first {time.time() - t0:.1f} s", flush=True)
        times = []
        for i in range(1, 4):
            x = fresh(i)
            t0 = time.time()
            float(jnp.sum(loop(params, x, t, ctx)))
            times.append((time.time() - t0) / K * 1000)
        print(f"{name}: {min(times):.1f} ms/fwd (best of 3, K={K})", flush=True)


if __name__ == "__main__":
    main()
