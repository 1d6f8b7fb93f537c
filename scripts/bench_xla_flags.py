#!/usr/bin/env python
"""Sweep XLA/TPU compiler options on the UNetMotion forward (measure-first).

The single-chip forward sits at a measured ~421 ms floor across eight
attention implementations and two conv reformulations (PERF.md round-3);
the one stack layer never probed is the COMPILER's own knobs. Each option
set is passed per-compile via ``lowered.compile(compiler_options=...)`` —
these serialize with the executable request, so they reach the tunnel's
remote compiler (unlike client-side XLA_FLAGS env).

Methodology per PERF.md: K-chained forwards in one scan, fresh device
inputs per timed call, jitted-sum materialisation. Unknown/rejected
options are reported and skipped, not fatal.

Usage: python -u scripts/bench_xla_flags.py [K]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

OPTION_SETS = {
    "base": {},
    # default scoped VMEM is ~16 MB; v5e has 128 MB — more room lets the
    # fusion cost model keep bigger producers resident
    "vmem32m": {"xla_tpu_scoped_vmem_limit_kib": "32768"},
    "vmem64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    # scheduler that overlaps async copies with compute (mostly a
    # collective-era knob, but it also reorders HBM prefetches)
    "lhs_off": {"xla_tpu_enable_latency_hiding_scheduler": "false"},
    # let the memory-space assigner spend longer looking for prefetch slots
    "msa_retry": {"xla_tpu_memory_space_assignment_max_retries": "4"},
}


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    from vdx.core.cache import enable_compilation_cache
    from vdx.core.dtypes import Policy
    from vdx.models.unet_motion import UNetMotion, UNetMotionConfig

    enable_compilation_cache()
    print("backend:", jax.default_backend(), "K:", K, flush=True)

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

    def fwd_loop(params, x0, t, ctx):
        def body(c, _):
            eps = model.apply(params, c, t, ctx)
            return (c + 0.001 * eps.astype(jnp.float32)).astype(c.dtype), ()
        out, _ = jax.lax.scan(body, x0, None, length=K)
        return out

    def fresh(i):
        x = jax.random.normal(jax.random.PRNGKey(i), (B, F, H, W, 4),
                              jnp.float32).astype(jnp.bfloat16)
        float(jnp.sum(x))
        return x

    lowered = jax.jit(fwd_loop).lower(params, fresh(0), t, ctx)
    results = {}
    for name, opts in OPTION_SETS.items():
        try:
            t0 = time.time()
            compiled = lowered.compile(compiler_options=opts or None)
            print(f"[{name}] compile: {time.time() - t0:.1f} s", flush=True)
            out = compiled(params, fresh(100), t, ctx)
            float(jnp.sum(out))
            times = []
            for i in range(1, 4):
                x = fresh(1000 + i)
                t0 = time.time()
                out = compiled(params, x, t, ctx)
                float(jnp.sum(out))
                times.append(time.time() - t0)
            best = min(times)
            results[name] = best / K * 1e3
            print(f"[{name}] {best / K * 1e3:.1f} ms/fwd  "
                  f"(iters {['%.3f' % x for x in times]})", flush=True)
        except Exception as e:  # noqa: BLE001 — option rejected by compiler
            print(f"[{name}] REJECTED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
    if "base" in results:
        base = results["base"]
        for name, ms in sorted(results.items(), key=lambda kv: kv[1]):
            print(f"{name:12s} {ms:7.1f} ms/fwd   {base / ms:5.3f}x vs base",
                  flush=True)


if __name__ == "__main__":
    main()
