"""Experiment 06: measure grid-search results.

Parity rebuild of reference experiments/06_measure_grid_search.py — same CLI,
same per-experiment *_metrics.json + grid_search_results.json outputs (see
vdx/metrics/engine.py; the heavy lifting is jit-batched on device instead of
the reference's per-pair host<->GPU loop).

Usage:
    python experiments/06_measure_grid_search.py [--input DIR] [--output DIR]
        [--filter STR]
"""

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser(description="Measure grid search experiments")
    p.add_argument("--input", default="outputs/05_grid_search")
    p.add_argument("--output", default="outputs/06_grid_search_metrics")
    p.add_argument("--filter", default=None)
    p.add_argument(
        "--device", choices=["auto", "cpu", "tpu"], default="auto",
        help="metric backend. auto: CPU when the only TPU is a remote-"
        "dispatch tunnel (its per-dispatch latency dominates these small "
        "per-video programs — measured 8.5 s/exp tunneled vs ~3 s CPU); "
        "device TPU otherwise.",
    )
    args = p.parse_args()

    if args.device == "cpu" or (
        args.device == "auto" and os.environ.get("PALLAS_AXON_POOL_IPS")
    ):
        # must happen before jax backend init (measure_experiments imports jax)
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    from vdx.harness.grid import measure_experiments

    input_dir = Path(args.input)
    if not input_dir.exists():
        print(f"Error: {input_dir} does not exist")
        print("Run experiments/05_grid_search_ablation.py first")
        return

    metrics = measure_experiments(input_dir, Path(args.output), args.filter)
    print("\n" + "=" * 60)
    print(f"Measurement complete! {len(metrics)} experiments")
    print(f"Results: {args.output}/grid_search_results.json")
    print("Next step: python experiments/07_analyze_grid_search.py")


if __name__ == "__main__":
    main()
