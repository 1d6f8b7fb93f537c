"""TPU spot-check: chunked dispatch is bit-exact vs the monolithic program.

CPU tests pin this (tests/test_pipeline.py::TestSegmentedDispatch); this
re-checks on the real TPU backend at a dispatchable length — the backend
compiles each segment separately, and bit-exactness requires its scan-body
codegen to be deterministic across programs, which is a backend property
worth one cheap measurement. Euler path (bit-exact contract).

Usage: python scripts/check_segment_exact_tpu.py
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    import jax
    import jax.numpy as jnp

    from vdx.core.cache import enable_compilation_cache
    from vdx.core.dtypes import Policy
    from vdx.pipelines import AnimateDiffPipeline

    enable_compilation_cache()
    t0 = time.time()
    np.asarray(jax.jit(lambda a: a * 2)(
        jax.device_put(np.ones((8, 8), np.float32))))
    print(f"tunnel warmup {time.time() - t0:.1f} s", flush=True)

    policy = Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    pipe = AnimateDiffPipeline.with_random_params(seed=0, policy=policy)
    kw = dict(num_frames=16, height=512, width=512, guidance_scale=7.5,
              num_inference_steps=5, scheduler="euler", seed=11,
              output_type="np")
    t0 = time.time()
    a = pipe("portrait", **kw)
    print(f"monolithic: {time.time() - t0:.1f} s", flush=True)
    t0 = time.time()
    b = pipe("portrait", dispatch_steps=2, **kw)
    print(f"K=2 (3 dispatches): {time.time() - t0:.1f} s", flush=True)

    # determinism control: the SAME monolithic program twice must be
    # bit-identical (isolates per-program codegen from nondeterminism)
    a2 = pipe("portrait", **kw)
    det = bool(jnp.array_equal(a.latents, a2.latents))

    lat_equal = bool(jnp.array_equal(a.latents, b.latents))
    frames_equal = bool(np.array_equal(a.frames[0], b.frames[0]))
    la = np.asarray(a.latents, np.float32)
    lb = np.asarray(b.latents, np.float32)
    nmse = float(((la - lb) ** 2).mean() / (la ** 2).mean())
    fd = np.abs(a.frames[0].astype(np.int32) - b.frames[0].astype(np.int32))
    print(f"RESULT segment-exact-tpu: same-program deterministic={det}; "
          f"segmented-vs-monolithic latents bit-equal={lat_equal} "
          f"(NMSE {nmse:.3e}), frames bit-equal={frames_equal} "
          f"(max|df| {fd.max()} uint8, frac>1 {(fd > 1).mean():.3e})",
          flush=True)
    sys.exit(0 if det else 1)


if __name__ == "__main__":
    main()
