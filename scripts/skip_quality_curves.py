#!/usr/bin/env python
"""Adaptive step-skip (SkipConfig) speed-vs-quality curves.

Same methodology as pab_quality_curves.py: for each threshold, generate the
same seeded videos exact and with skip, time them (fresh seeds per timed
run — tunnel methodology), read the model-evaluation count from the program
itself (``PipelineOutput.n_evals`` — the axon tunnel rejects host callbacks,
so the progress-counter route is CPU-only), and
score the drift vs the exact trajectory. Weights are seeded-random: the
skip signal (relative L1 latent drift between steps) measures the
APPROXIMATION mechanism; absolute quality re-validates on real checkpoints.

One config per process (the tunnel compile is minutes):
    python -u scripts/skip_quality_curves.py exact
    python -u scripts/skip_quality_curves.py t010
    ...
    python -u scripts/skip_quality_curves.py assemble   # -> CSV + table
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
ART = ROOT / "artifacts"
RUNS = ART / "skip_runs"

KWARGS = dict(
    negative_prompt="bad quality, blurry, distorted",
    num_frames=16, guidance_scale=7.5, num_inference_steps=25,
    height=512, width=512, decode_chunk=8,
)
PROMPT = "a corgi walking on the beach, sunset lighting, high quality"
SEEDS = [101, 202]

CONFIGS = ["exact", "t005", "t010", "t020", "t040"]


def get_config(name):
    from vdx.pipelines import SkipConfig

    if name == "exact":
        return None
    thr = int(name[1:]) / 100.0
    return SkipConfig(threshold=thr, warmup_steps=3, cooldown_steps=3)


def video_metrics(frames):
    import jax.numpy as jnp

    x = jnp.asarray(frames, jnp.float32) / 255.0
    d = x[1:] - x[:-1]
    return {
        "frame_mse": float(jnp.mean(d * d)),
        "flicker": float(jnp.mean(jnp.abs(x[:-2] - 2 * x[1:-1] + x[2:]))),
    }


def run_config(name):
    import jax.numpy as jnp

    from vdx.core.cache import enable_compilation_cache
    from vdx.core.dtypes import Policy
    from vdx.pipelines import AnimateDiffPipeline

    enable_compilation_cache()
    RUNS.mkdir(parents=True, exist_ok=True)
    policy = Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    pipe = AnimateDiffPipeline.with_random_params(
        seed=0, policy=policy, scheduler="ddim", skip=get_config(name))

    times, frames, counts = [], [], []
    pipe(PROMPT, seed=999, output_type="np", **KWARGS)  # compile warmup
    for s in SEEDS:
        t0 = time.time()
        out = pipe(PROMPT, seed=s, output_type="np", **KWARGS)
        out.frames[0][0, 0, 0, 0]
        times.append(time.time() - t0)
        frames.append(out.frames[0])
        counts.append(
            int(out.n_evals) if out.n_evals is not None
            else KWARGS["num_inference_steps"]
        )
    np.save(RUNS / f"{name}.npy", np.stack(frames))
    rec = {"config": name, "sec_per_video": round(min(times), 3),
           "n_evals": counts, **video_metrics(frames[0])}
    with open(RUNS / f"{name}.json", "w") as f:
        json.dump(rec, f)
    print(json.dumps(rec), flush=True)


def assemble():
    import csv

    exact = np.load(RUNS / "exact.npy")
    exact_rec = json.load(open(RUNS / "exact.json"))
    rows = []
    for name in CONFIGS:
        f = RUNS / f"{name}.json"
        if not f.exists():
            continue
        rec = json.load(open(f))
        frames = np.load(RUNS / f"{name}.npy")
        mses = [
            float(np.mean((a.astype(np.float32) / 255 - b.astype(np.float32) / 255) ** 2))
            for a, b in zip(exact, frames)
        ]
        mse = float(np.mean(mses))
        rec["n_evals"] = "/".join(str(c) for c in rec["n_evals"])
        rec["speedup"] = round(exact_rec["sec_per_video"] / rec["sec_per_video"], 3)
        rec["drift_mse"] = mse
        rec["drift_psnr_db"] = round(10 * np.log10(1.0 / max(mse, 1e-12)), 2)
        rows.append(rec)
    out = ART / "skip_quality_curves.csv"
    with open(out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    print("wrote", out)
    for r in rows:
        print(r)


if __name__ == "__main__":
    arg = sys.argv[1] if len(sys.argv) > 1 else "assemble"
    if arg == "assemble":
        assemble()
    else:
        run_config(arg)
