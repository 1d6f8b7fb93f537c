#!/usr/bin/env python
"""Attention microbench at arbitrary shapes/impls (TPU tunnel methodology).

Round-3 SVD hunt: the fwd breakdown attributes 534 ms to spatial flash
sites and ~490 ms to the S=25 temporal sites; this measures candidate
implementations per site shape.

Usage:
  python -u scripts/bench_attn_shapes.py B,S,H,D spec [spec ...]

spec:
  bf16p               — the dispatched short-seq XLA path
  packed              — block-diagonal packed XLA path (pack=128//S)
  xla                 — exact fp32-softmax einsum path
  dt:BQ:BK[:exp_impl] — Pallas transposed flash with those blocks
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

K = 8


def make_fn(spec, scale):
    from vdx.ops import attention as A

    if spec == "bf16p":
        return lambda q, k, v: A._xla_attention_bf16probs(q, k, v, scale)
    if spec == "bf16ps":
        return lambda q, k, v: A._xla_attention_bf16probs_static(q, k, v, scale)
    if spec == "packed":
        return lambda q, k, v: A.dot_product_attention(
            q, k, v, scale=scale, impl="xla_bf16p_packed")
    if spec == "xla":
        return lambda q, k, v: A._xla_attention(q, k, v, scale, None)
    parts = spec.split(":")
    assert parts[0] == "dt", spec
    from vdx.kernels.flash_attention import flash_attention_dt

    bq, bk = int(parts[1]), int(parts[2])
    exp_impl = parts[3] if len(parts) > 3 else "exp2"
    return lambda q, k, v: flash_attention_dt(
        q, k, v, scale=scale, block_q=bq, block_k=bk, exp_impl=exp_impl)


def main():
    from vdx.core.cache import enable_compilation_cache

    enable_compilation_cache()
    dims = [int(x) for x in sys.argv[1].split(",")]
    B, S, H, D = dims[:4]
    Skv = dims[4] if len(dims) > 4 else S  # optional 5th: KV length
    print(f"backend={jax.default_backend()} shape=[{B},{S},{H},{D}] "
          f"Skv={Skv} K={K}", flush=True)
    scale = D ** -0.5

    for spec in sys.argv[2:]:
        fn = make_fn(spec, scale)

        @jax.jit
        def loop(q, k, v):
            def body(c, _):
                o = fn(c, k, v)
                return (c + 0.01 * o).astype(c.dtype), ()

            out, _ = jax.lax.scan(body, q, None, length=K)
            return out

        def fresh(i):
            ks = jax.random.split(jax.random.PRNGKey(i), 3)
            shapes = ((B, S, H, D), (B, Skv, H, D), (B, Skv, H, D))
            arrs = tuple(
                jax.random.normal(kk, sh, jnp.float32).astype(jnp.bfloat16)
                for kk, sh in zip(ks, shapes))
            jax.block_until_ready(arrs)
            float(jnp.sum(arrs[0].astype(jnp.float32)))
            return arrs

        q, k, v = fresh(0)
        t0 = time.time()
        float(jnp.sum(loop(q, k, v).astype(jnp.float32)))
        print(f"[{spec}] compile+first {time.time()-t0:.1f} s", flush=True)
        times = []
        for i in range(1, 3):
            q, k, v = fresh(i)
            t0 = time.time()
            float(jnp.sum(loop(q, k, v).astype(jnp.float32)))
            times.append(time.time() - t0)
        print(f"[{spec}] {min(times)/K*1e3:.2f} ms/site", flush=True)


if __name__ == "__main__":
    main()
