#!/usr/bin/env python
"""TPU microbench: fused Pallas GroupNorm+SiLU vs XLA at UNet hot shapes.

Follows the tunnel timing methodology (PERF.md): fresh input values per
iteration, host materialisation to force execution.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from vdx.kernels.groupnorm import fused_group_norm, fused_group_norm_2phase
from vdx.ops.groupnorm import _group_norm_silu_xla


def bench(fn, make_args, iters=3, K=30):
    """K-chained-scan timing (PERF.md methodology): per-dispatch tunnel
    latency is ~30 ms and an EAGER jnp.sum materialisation of a big
    output costs ~10 s, so single-call timing is pure noise for a ~2 ms
    op.  The scan carries the output back into the next input (no DCE)
    and one jitted scalar sum forces execution."""

    @jax.jit
    def loop(x, s, b):
        def body(xc, _):
            y = fn(xc, s, b)
            y = (y.astype(jnp.float32) * 1.0001
                 + xc.astype(jnp.float32) * 0.01).astype(xc.dtype)
            return y, None

        xK, _ = jax.lax.scan(body, x, None, length=K)
        return jnp.sum(xK.astype(jnp.float32))

    float(loop(*make_args(0)))  # compile + warm
    times = []
    for i in range(1, iters + 1):
        args = make_args(i)
        t0 = time.time()
        float(loop(*args))
        times.append(time.time() - t0)
    return min(times) / K


def main():
    print("backend:", jax.default_backend(), flush=True)
    G = 32
    # (B, S, C): UNet level shapes. B=32 = 2 (CFG) x 16 frames.
    shapes = [
        (32, 4096, 320),   # level 0 resnet GN
        (32, 1024, 640),   # level 1
        (32, 256, 1280),   # level 2
        (2, 65536, 320),   # motion-module GN (stats span F*H*W)
        (50, 9216, 320),   # SVD L0 spatial resnet GN (576x1024, CFG pair)
        (50, 2304, 640),   # SVD L1
        (50, 576, 1280),   # SVD L2
        (2, 230400, 320),  # SVD temporal-res GN (stats span F*H*W)
    ]
    if len(sys.argv) > 1:  # select shapes by index, e.g. "0,3"
        idx = [int(i) for i in sys.argv[1].split(",")]
        shapes = [shapes[i] for i in idx]
    for (B, S, C) in shapes:
        rng = np.random.default_rng(0)
        scale = jnp.asarray(rng.standard_normal(C).astype(np.float32))
        bias = jnp.asarray(rng.standard_normal(C).astype(np.float32))

        # host-gen once per shape (42 s for the big shapes on this core);
        # fresh values per timed iteration come from a device-side add
        x0 = jnp.asarray(
            rng.standard_normal((B, S, C), dtype=np.float32)
        ).astype(jnp.bfloat16)
        perturb = jax.jit(lambda x, i: x + i * jnp.bfloat16(0.001))

        def make(i):
            return (perturb(x0, i), scale, bias)

        xla = bench(lambda x, s, b: _group_norm_silu_xla(x, G, s, b), make)
        single_elems = B and S * C
        if S * C <= 2 * 1024 * 1024:
            t1 = bench(
                lambda x, s, b: fused_group_norm(
                    x, s, b, num_groups=G, with_silu=True), make)
        else:
            t1 = float("nan")
        t2 = bench(
            lambda x, s, b: fused_group_norm_2phase(
                x, s, b, num_groups=G, with_silu=True), make)
        bytes_min = B * S * C * 2 * 2  # read + write bf16
        print(
            f"[{B},{S},{C}] xla {xla*1e3:7.2f} ms | fused {t1*1e3:7.2f} ms | "
            f"2phase {t2*1e3:7.2f} ms | min-bytes floor "
            f"{bytes_min / 819e9 * 1e3:.2f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
