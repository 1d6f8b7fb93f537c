#!/usr/bin/env python
"""PAB speed-vs-quality curves (VERDICT r1 task 10; PERF.md PAB section).

For a grid of PABConfig schedules, generate the same seeded video exact and
with PAB, then score the drift the broadcast introduces with the metric
engine's formulas (MSE / PSNR / flicker delta on the decoded frames) and
time both. Weights are seeded-random (zero-egress env): the drift measures
the APPROXIMATION, not model quality — the broadcast error mechanism is
weight-independent (attention outputs drifting slowly across steps), so the
ranking transfers; absolute numbers get re-validated when real checkpoints
exist.

Writes artifacts/pab_quality_curves.csv and prints the table.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax.numpy as jnp
import numpy as np


def video_metrics(frames):  # [F, H, W, 3] uint8 -> dict
    x = jnp.asarray(frames, jnp.float32) / 255.0
    d = x[1:] - x[:-1]
    mse = jnp.mean(d * d, axis=(1, 2, 3))
    flicker = jnp.mean(jnp.abs(x[:-2] - 2 * x[1:-1] + x[2:]))
    return {"frame_mse": float(jnp.mean(mse)), "flicker": float(flicker)}


def drift(a, b):  # exact vs PAB frames
    xa = jnp.asarray(a, jnp.float32) / 255.0
    xb = jnp.asarray(b, jnp.float32) / 255.0
    mse = float(jnp.mean((xa - xb) ** 2))
    psnr = float(10.0 * jnp.log10(1.0 / max(mse, 1e-12)))
    return mse, psnr


def run(pipe, prompt, seeds, kwargs):
    times, outs = [], []
    for s in seeds:
        t0 = time.time()
        out = pipe(prompt, seed=s, output_type="np", **kwargs)
        out.frames[0][0, 0, 0, 0]  # host materialisation
        times.append(time.time() - t0)
        outs.append(out.frames[0])
    return min(times), outs


def main():
    from vdx.core.cache import enable_compilation_cache
    from vdx.core.dtypes import Policy
    from vdx.pipelines import AnimateDiffPipeline
    from vdx.pipelines.base import PABConfig

    enable_compilation_cache()
    policy = Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    kwargs = dict(
        negative_prompt="bad quality, blurry, distorted",
        num_frames=16, guidance_scale=7.5, num_inference_steps=25,
        height=512, width=512, decode_chunk=8,
    )
    prompt = "a corgi walking on the beach, sunset lighting, high quality"
    seeds = [101, 202]

    grid = [
        ("exact", None),
        ("conservative", PABConfig(spatial_interval=2, temporal_interval=2,
                                   cross_interval=4, warmup_steps=3,
                                   cooldown_steps=3)),
        ("default", PABConfig()),  # 2/4/6, warmup 2, cooldown 2
        ("aggressive", PABConfig(spatial_interval=3, temporal_interval=6,
                                 cross_interval=12, warmup_steps=2,
                                 cooldown_steps=1)),
    ]

    rows = []
    exact_frames = None
    exact_time = None
    for name, pab in grid:
        pipe = AnimateDiffPipeline.with_random_params(
            seed=0, policy=policy, scheduler="ddim", pab=pab)
        sec, outs = run(pipe, prompt, seeds, kwargs)
        if name == "exact":
            exact_frames, exact_time = outs, sec
            rows.append({"config": name, "sec_per_video": round(sec, 2),
                         "speedup": 1.0, "drift_mse": 0.0, "drift_psnr_db":
                         float("inf"), **video_metrics(outs[0])})
            continue
        mses, psnrs = [], []
        for a, b in zip(exact_frames, outs):
            m, p = drift(a, b)
            mses.append(m)
            psnrs.append(p)
        rows.append({
            "config": name,
            "sec_per_video": round(sec, 2),
            "speedup": round(exact_time / sec, 3),
            "drift_mse": float(np.mean(mses)),
            "drift_psnr_db": round(float(np.mean(psnrs)), 2),
            **video_metrics(outs[0]),
        })
        print(json.dumps(rows[-1]), flush=True)

    out = Path(__file__).resolve().parents[1] / "artifacts" / "pab_quality_curves.csv"
    out.parent.mkdir(exist_ok=True)
    import csv

    with open(out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    print("wrote", out)
    for r in rows:
        print(r)


if __name__ == "__main__":
    main()
