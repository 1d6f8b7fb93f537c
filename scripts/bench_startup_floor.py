#!/usr/bin/env python
"""Measure the per-process startup floor on the tunneled TPU backend.

Answers BENCH_r02's compile_s=702 / init_s=341 question: how much of the
one-time cost is the tunnel itself (first H2D, first D2H, transfer
bandwidth, executable load) vs the framework's init/compile choices.

Run: timeout 1800 python scripts/bench_startup_floor.py > /tmp/startup_floor.log 2>&1
"""

import json
import time

import numpy as np


def t(label, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"{label}: {dt:.2f} s", flush=True)
    return out, dt


def main():
    import jax
    import jax.numpy as jnp

    results = {}
    _, results["import_backend"] = t("backend init (jax.devices)", jax.devices)
    print("backend:", jax.default_backend(), flush=True)

    # 1. first tiny H2D
    x_small = np.ones((8, 8), np.float32)
    dev, results["first_h2d_tiny"] = t(
        "first H2D (256 B)", lambda: jax.device_put(x_small)
    )

    # 2. first tiny D2H
    _, results["first_d2h_tiny"] = t("first D2H (256 B)", lambda: np.asarray(dev))

    # 3. tiny jit compile + run (no cache)
    f = jax.jit(lambda a: a * 2 + 1)
    _, results["tiny_jit_compile"] = t(
        "tiny jit compile+run", lambda: np.asarray(f(dev))
    )

    # 4. second tiny H2D/D2H (steady state)
    x2 = np.ones((8, 8), np.float32) * 2
    d2, results["h2d_tiny_steady"] = t("steady H2D (256 B)", lambda: jax.device_put(x2))
    _, results["d2h_tiny_steady"] = t("steady D2H (256 B)", lambda: np.asarray(d2))

    # 5. transfer bandwidth: 100 MB H2D then D2H
    big = np.random.default_rng(0).standard_normal((25, 1024, 1024)).astype(np.float32)
    dbig, results["h2d_100mb"] = t("H2D 100 MB", lambda: jax.device_put(big))
    _, results["d2h_100mb"] = t("D2H 100 MB", lambda: np.asarray(dbig))
    print(f"H2D bandwidth: {100/results['h2d_100mb']:.1f} MB/s", flush=True)
    print(f"D2H bandwidth: {100/results['d2h_100mb']:.1f} MB/s", flush=True)

    # 6. second 100 MB H2D (is the first one paying a warmup?)
    big2 = big + 1
    _, results["h2d_100mb_2nd"] = t("H2D 100 MB (2nd)", lambda: jax.device_put(big2))

    # 7. many-small-leaves H2D: 200 x 1 MB (the init_params per-leaf pattern)
    leaves = [np.ones((256, 1024), np.float32) * i for i in range(200)]
    _, results["h2d_200x1mb"] = t(
        "H2D 200 x 1 MB separate puts", lambda: [jax.device_put(l) for l in leaves]
    )

    # 8. one bulk device_put of the same tree
    _, results["h2d_tree_bulk"] = t(
        "H2D 200 x 1 MB one tree put", lambda: jax.device_put(leaves)
    )

    # 9. on-device generation: one jitted program making 200 x 1 MB normals
    def gen(key):
        ks = jax.random.split(key, 200)
        return [jax.random.normal(k, (256, 1024)) * 0.02 for k in ks]

    gj = jax.jit(gen)
    _, results["ondevice_gen_compile"] = t(
        "on-device 200-leaf gen (compile+run)",
        lambda: jax.block_until_ready(gj(jax.random.PRNGKey(0))),
    )
    _, results["ondevice_gen_steady"] = t(
        "on-device 200-leaf gen (steady)",
        lambda: jax.block_until_ready(gj(jax.random.PRNGKey(1))),
    )

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
