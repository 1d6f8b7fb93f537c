"""Experiment 05: systematic grid-search ablation.

Parity rebuild of reference experiments/05_grid_search_ablation.py (same
phases, grids, artifact layout, resume semantics, manifest; see
vdx/harness/grid.py for the library implementation).

Usage:
    python experiments/05_grid_search_ablation.py [--phase {all,cfg,steps,prompt}]
        [--video NAME] [--output DIR] [--tiny] [--yes]
"""

import argparse
import sys
from datetime import datetime
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def main():
    from vdx.harness.config import CFG_VALUES, STEPS_VALUES
    from vdx.harness.grid import generate_manifest, run_grid_search

    p = argparse.ArgumentParser(description="Systematic Grid Search Ablation")
    p.add_argument("--phase", default="all", choices=["all", "cfg", "steps", "prompt"])
    p.add_argument("--video", default=None, help="partial-match video filter")
    p.add_argument("--output", default="outputs/05_grid_search")
    p.add_argument("--tiny", action="store_true", help="tiny configs (CI smoke)")
    p.add_argument("--yes", action="store_true", help="skip confirmation prompt")
    p.add_argument("--checkpoint", default=None,
                   help="Orbax dir of converted weights "
                        "(scripts/convert_checkpoint.py)")
    p.add_argument("--step-progress", action="store_true",
                   help="log every denoise step (streams from inside the "
                        "fused scan via jax.debug.callback)")
    args = p.parse_args()

    output_dir = Path(args.output)
    output_dir.mkdir(parents=True, exist_ok=True)

    print("=" * 60)
    print("SYSTEMATIC GRID SEARCH ABLATION")
    print("=" * 60)
    print(f"Phase: {args.phase}\nVideo filter: {args.video or 'all'}")
    print(f"Output: {output_dir}")
    print(f"CFG values: {CFG_VALUES}\nSteps values: {STEPS_VALUES}")

    if not args.yes:
        input("\nPress Enter to start (or Ctrl+C to cancel)...")

    from experiments_common import load_pipeline  # noqa: F401

    pipe = load_pipeline(tiny=args.tiny, scheduler="ddim",
                         checkpoint=args.checkpoint)

    start = datetime.now()
    if args.tiny:
        # shrink the experiment plan to smoke-test scale
        import dataclasses

        from vdx.harness import grid as grid_mod
        from vdx.harness.grid import plan_grid_search

        def tiny_plan(phase="all", video_filter=None):
            return [
                dataclasses.replace(
                    c, height=64, width=64, num_frames=4, num_inference_steps=2
                )
                for c in plan_grid_search(phase, video_filter)
            ]

        grid_mod_plan = grid_mod.plan_grid_search
        grid_mod.plan_grid_search = tiny_plan
        try:
            configs = run_grid_search(pipe, args.phase, args.video, output_dir,
                                      step_progress=args.step_progress)
        finally:
            grid_mod.plan_grid_search = grid_mod_plan
    else:
        configs = run_grid_search(pipe, args.phase, args.video, output_dir,
                                  step_progress=args.step_progress)
    generate_manifest(output_dir)
    print(f"\nTotal time: {datetime.now() - start}")
    print(f"Experiments: {len(configs)}")
    print("\nNext step: python experiments/06_measure_grid_search.py")


if __name__ == "__main__":
    main()
