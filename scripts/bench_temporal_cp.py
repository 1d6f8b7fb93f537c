#!/usr/bin/env python
"""Stage-1 megakernel gate: C-major temporal attention vs the XLA path.

Measures temporal_attention_cp (positions-on-lanes VPU formulation,
including its two relayout passes) against the dispatched XLA+bf16probs
path at the UNet level-0 motion-module shape [8192, 16, 8, 40].

Gate (VERDICT r2 #4): if the kernel can't beat ~5 ms/site here, the fused
temporal-block megakernel built on this layout can't either -> commit the
negative result and stop. If it wins, the relayouts amortise further in a
full-module kernel (GN+proj+attn+FF sharing one [F, C, P] residency).

Usage: timeout 1800 python -u scripts/bench_temporal_cp.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def bench(label, fn, args_maker, K=4, runs=3):
    """K-chained scan, fresh inputs per run, host-sum to time (PERF.md)."""

    def chained(*args):
        def body(x, _):
            out = fn(x, *args[1:])
            return out * 1.0001, None

        y, _ = jax.lax.scan(body, args[0], None, length=K)
        return jnp.sum(y.astype(jnp.float32))

    jitted = jax.jit(chained)
    print(f"  {label}: compiling...", flush=True)
    t0 = time.time()
    float(jitted(*args_maker(99)))
    print(f"  {label}: compile {time.time() - t0:.1f} s", flush=True)
    best = None
    for i in range(runs):
        a = args_maker(i)
        t0 = time.time()
        float(jitted(*a))
        dt = (time.time() - t0) / K * 1000
        best = dt if best is None else min(best, dt)
    print(f"{label}: {best:.2f} ms/site", flush=True)
    return best


def main():
    from vdx.core.cache import enable_compilation_cache
    from vdx.kernels.temporal_attention_cp import temporal_attention_cp
    from vdx.ops.attention import dot_product_attention

    enable_compilation_cache()
    print("backend:", jax.default_backend(), flush=True)

    P, F, H, D = 8192, 16, 8, 40
    scale = D ** -0.5

    def fresh(i, dtype):
        rng = np.random.default_rng(i)
        mk = lambda: jnp.asarray(  # noqa: E731
            rng.standard_normal((P, F, H, D)), dtype
        )
        return mk(), mk(), mk()

    import os

    blocks = [int(b) for b in os.environ.get("CP_BLOCKS", "128,512").split(",")]
    for blk in blocks:
        f = lambda q, k, v, b=blk: temporal_attention_cp(  # noqa: E731
            q, k, v, scale=scale, block_p=b
        )
        bench(f"cp-layout VPU kernel block_p={blk}", f,
              lambda i: fresh(i, jnp.bfloat16))

    if os.environ.get("CP_BASELINE"):
        # reference path: what auto-dispatch runs today (bf16 probs);
        # round-2 measured ~5.0 ms/site (PERF.md) — rerun only on demand.
        xla = lambda q, k, v: dot_product_attention(  # noqa: E731
            q, k, v, scale=scale, impl="xla_bf16p"
        )
        bench("xla bf16probs (dispatched today)", xla,
              lambda i: fresh(i, jnp.bfloat16))


if __name__ == "__main__":
    main()
