#!/usr/bin/env python
"""Probe: does v5e int8 MXU throughput beat bf16 for the UNet's GEMMs?

v5e lists 394 int8 TOPS vs 197 bf16 TFLOPS. If XLA exposes that through
``lax.dot_general(int8, int8, preferred_element_type=int32)``, a w8a8 path
for the UNet's FF/projection GEMMs becomes a serving turbo lever worth
building (with PAB-style quality curves). Measure first: time bf16 vs
int8 matmuls at the three level GEMM shapes of the SD-1.5 UNet forward
(tokens x C -> 4C, the FF up-projections; the down-projections and
attention QKV/out have the same K/N families).

K-chained scan + jitted scalar sum + fresh values per timing run
(PERF.md tunnel methodology).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

K_CHAIN = 16
# (tokens, C_in, C_out): level-0/1/2 FF up-projections of the 1.3B UNet at
# the reference workload (32 = CFG pair x 16 frames; 4096/1024/256 = HW/64).
SHAPES = [
    (32 * 4096, 320, 1280),
    (32 * 1024, 640, 2560),
    (32 * 256, 1280, 5120),
]


def time_loop(loop, fresh, label, m, k, n):
    a, w = fresh(0)
    t0 = time.time()
    float(jnp.sum(loop(a, w).astype(jnp.float32)))
    compile_s = time.time() - t0
    times = []
    for i in range(1, 3):
        a, w = fresh(i)
        t0 = time.time()
        float(jnp.sum(loop(a, w).astype(jnp.float32)))
        times.append(time.time() - t0)
    best = min(times) / K_CHAIN
    tops = 2 * m * k * n / best / 1e12
    print(
        f"{label} [{m}x{k}x{n}]: {best*1e3:.3f} ms/matmul "
        f"({tops:.1f} T{'OP' if 'int8' in label else 'FLOP'}/s) "
        f"[compile {compile_s:.1f} s]",
        flush=True,
    )
    return best


def bench_shape(m, k, n):
    def fresh_bf16(i):
        ka, kw = jax.random.split(jax.random.PRNGKey(i))
        a = jax.random.normal(ka, (m, k), jnp.float32).astype(jnp.bfloat16)
        w = jax.random.normal(kw, (k, n), jnp.float32).astype(jnp.bfloat16)
        jax.block_until_ready((a, w))
        float(jnp.sum(a.astype(jnp.float32)))
        return a, w

    @jax.jit
    def loop_bf16(a, w):
        def body(c, _):
            y = c @ w  # bf16 x bf16 -> bf16 (MXU)
            return y[:, :k] * jnp.bfloat16(0.01), ()

        out, _ = jax.lax.scan(body, a, None, length=K_CHAIN)
        return out

    def fresh_int8(i):
        ka, kw = jax.random.split(jax.random.PRNGKey(i))
        a = jax.random.randint(ka, (m, k), -127, 127, jnp.int8)
        w = jax.random.randint(kw, (k, n), -127, 127, jnp.int8)
        jax.block_until_ready((a, w))
        float(jnp.sum(a.astype(jnp.float32)))
        return a, w

    @jax.jit
    def loop_int8(a, w):
        def body(c, _):
            y = jax.lax.dot_general(
                c, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            # requantize a slice back to int8 to chain the dependency
            return (y[:, :k] >> 8).astype(jnp.int8), ()

        out, _ = jax.lax.scan(body, a, None, length=K_CHAIN)
        return out

    t_bf16 = time_loop(loop_bf16, fresh_bf16, "bf16", m, k, n)
    t_int8 = time_loop(loop_int8, fresh_int8, "int8->int32", m, k, n)
    print(f"  speedup int8/bf16: {t_bf16/t_int8:.2f}x", flush=True)


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    shapes = SHAPES
    if len(sys.argv) > 1:
        m, k, n = (int(x) for x in sys.argv[1].split(":"))
        shapes = [(m, k, n)]
    for m, k, n in shapes:
        bench_shape(m, k, n)


if __name__ == "__main__":
    main()
