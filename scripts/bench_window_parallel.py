"""Window-parallel context program measured single-chip (mesh=1).

The long-clip scaling design (pipelines/context.py): context windows are
independent denoiser evaluations per step, sharded over the mesh's
``frames`` axis and blended by weighted psum. Real multi-chip hardware is
unavailable (NOTES_r4), so this measures the WINDOW-PARALLEL PROGRAM
ITSELF on one chip — a 1-device mesh executes the identical shard_map
program with every window local — against the plain scan-over-windows
context program at the same workload. The delta prices the shard_map/psum
machinery; per-window compute is chip-bound either way, so n-chip
wall-clock projects as (windows/n) * ms_per_window + blend overhead.

The 1-device mesh is forced by overriding the pipeline's private
window-parallel latch (constructor requires frame_shards>1, which needs
n devices); program structure is identical to the n-device one.

Usage: python scripts/bench_window_parallel.py [frames] [steps]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

PROMPT = "a portrait of a woman, highly detailed, studio lighting"


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 12

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vdx.core.cache import enable_compilation_cache
    from vdx.core.dtypes import Policy
    from vdx.parallel.mesh import make_mesh
    from vdx.pipelines import AnimateDiffPipeline, ContextConfig
    from vdx.pipelines.context import window_starts

    enable_compilation_cache()
    t0 = time.time()
    np.asarray(jax.jit(lambda a: a * 2)(
        jax.device_put(np.ones((8, 8), np.float32))))
    print(f"tunnel warmup {time.time() - t0:.1f} s", flush=True)

    policy = Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    ctx = ContextConfig(frames=16, stride=8)
    n_win = len(window_starts(frames, ctx.frames, ctx.stride))
    kw = dict(num_frames=frames, height=512, width=512, guidance_scale=7.5,
              num_inference_steps=steps, scheduler="dpm", output_type="np",
              decode_chunk=8)

    results = {}
    for mode in ("scan", "window-parallel"):
        t0 = time.time()
        pipe = AnimateDiffPipeline.with_random_params(
            seed=0, policy=policy, scheduler="ddim", context=ctx,
        )
        if mode == "window-parallel":
            # force the sharded-window program on a 1-device mesh (see
            # module docstring) — identical structure to frame_shards=n
            pipe.mesh = make_mesh(1, 1, 1)
            pipe._window_parallel = True
            pipe.frame_shards = 1
        print(f"[{mode}] init {time.time() - t0:.1f} s", flush=True)
        t0 = time.time()
        pipe(PROMPT, seed=42, **kw)
        print(f"[{mode}] compile+first {time.time() - t0:.1f} s "
              f"({n_win} windows/step)", flush=True)
        t0 = time.time()
        out = pipe(PROMPT, seed=43, **kw)
        dt = time.time() - t0
        results[mode] = (dt, out.frames[0])
        print(f"[{mode}] {dt:.2f} s/video  {frames / dt:.3f} f/s  "
              f"{dt / (n_win * steps) * 1e3:.0f} ms/window-eval", flush=True)
        del pipe, out

    a, fa = results["scan"]
    b, fb = results["window-parallel"]
    diff = np.abs(fa.astype(np.int32) - fb.astype(np.int32))
    print(f"RESULT window-parallel@mesh1 vs scan ({frames}f@512^2, {steps} "
          f"steps, {n_win} windows): {b:.2f} vs {a:.2f} s/video "
          f"(overhead {100 * (b - a) / a:+.1f}%); frame agreement "
          f"max|diff|={diff.max()} uint8 ({(diff > 1).mean():.2e} > 1)",
          flush=True)


if __name__ == "__main__":
    main()
