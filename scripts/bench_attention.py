#!/usr/bin/env python
"""Flash-attention block-size sweep at the UNet hot shape.

K applications chained in one jitted scan (tunnel methodology — amortises
the ~0.8 s dispatch latency). Usage:

    python -u scripts/bench_attention.py xla
    python -u scripts/bench_attention.py dt:1024:1024
    python -u scripts/bench_attention.py dt:1024:1024:fastexp2 ...
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

B, S, H, D = 32, 4096, 8, 40
K = 16


def main():
    spec = sys.argv[1] if len(sys.argv) > 1 else "dt:1024:1024"
    scale = D ** -0.5

    if spec == "xla":
        from vdx.ops.attention import _xla_attention

        fn = lambda q, k, v: _xla_attention(q, k, v, scale, None)  # noqa: E731
    else:
        parts = spec.split(":")
        bq, bk = parts[1], parts[2]
        exp_impl = parts[3] if len(parts) > 3 else "exp"
        from vdx.kernels.flash_attention import flash_attention_dt

        fn = lambda q, k, v: flash_attention_dt(  # noqa: E731
            q, k, v, scale=scale, block_q=int(bq), block_k=int(bk),
            exp_impl=exp_impl)

    @jax.jit
    def loop(q, k, v):
        def body(c, _):
            o = fn(c, k, v)
            return (c + 0.01 * o).astype(c.dtype), ()
        out, _ = jax.lax.scan(body, q, None, length=K)
        return out

    def fresh(i):
        ks = jax.random.split(jax.random.PRNGKey(i), 3)
        mk = lambda kk: jax.random.normal(  # noqa: E731
            kk, (B, S, H, D), jnp.float32).astype(jnp.bfloat16)
        arrs = tuple(mk(kk) for kk in ks)
        jax.block_until_ready(arrs)
        float(jnp.sum(arrs[0]))
        return arrs

    q, k, v = fresh(0)
    t0 = time.time()
    float(jnp.sum(loop(q, k, v)))
    print(f"{spec}: compile+first {time.time()-t0:.1f} s", flush=True)
    times = []
    for i in range(1, 3):
        q, k, v = fresh(i)
        t0 = time.time()
        float(jnp.sum(loop(q, k, v)))
        times.append(time.time() - t0)
    best = min(times)
    print(f"{spec}: {best/K*1e3:.2f} ms/attention (K={K})", flush=True)


if __name__ == "__main__":
    main()
