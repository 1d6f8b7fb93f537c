#!/usr/bin/env python
"""Probe the TPU's elementwise (VPU) rates: exp vs fma vs exp2.

Chains N dependent elementwise passes over a [4096, 4096] fp32 array inside
one jit so HBM traffic amortises and the VPU rate dominates. Prints
elements/second per pass — the number that decides whether flash-attention
softmax is exp-bound and what a cheaper exp2 could buy.

Usage: python -u scripts/bench_vpu_exp.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

N = 64
SHAPE = (4096, 4096)


def timeit(tag, op):
    @jax.jit
    def loop(x):
        def body(c, _):
            return op(c), ()
        out, _ = jax.lax.scan(body, x, None, length=N)
        return out

    def fresh(i):
        x = jax.random.uniform(jax.random.PRNGKey(i), SHAPE, jnp.float32,
                               -1.0, 0.0)
        float(jnp.sum(x))
        return x

    x = fresh(0)
    t0 = time.time()
    float(jnp.sum(loop(x)))
    compile_s = time.time() - t0
    times = []
    for i in range(1, 3):
        x = fresh(i)
        t0 = time.time()
        float(jnp.sum(loop(x)))
        times.append(time.time() - t0)
    best = min(times)
    per_pass_ms = best / N * 1e3
    rate = SHAPE[0] * SHAPE[1] * N / best / 1e12
    print(f"{tag:24s} {per_pass_ms:7.3f} ms/pass  {rate:6.2f} Telem/s "
          f"(compile {compile_s:.0f}s)", flush=True)
    return per_pass_ms


def main():
    print("backend:", jax.default_backend(), flush=True)
    # keep values in [-1, 0] under iteration: each op maps [-1,0] -> [-1,0]
    timeit("fma (x*0.9-0.05)", lambda x: x * 0.9 - 0.05)
    timeit("exp (-exp(x)*0.5)", lambda x: -jnp.exp(x) * 0.5)
    timeit("exp2 (-exp2(x)*0.5)", lambda x: -jnp.exp2(x) * 0.5)
    timeit("max.reduce+bcast", lambda x: x - jnp.max(x, axis=0, keepdims=True) * 0.01 - 0.005)
    timeit("tanh", lambda x: jnp.tanh(x) - 0.5)


if __name__ == "__main__":
    main()
