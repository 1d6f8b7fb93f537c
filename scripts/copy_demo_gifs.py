"""Copy curated demo GIFs from the grid-search outputs to assets/.

Parity rebuild of reference scripts/copy_demo_gifs.py:21-107 — the same 16
finding-illustrating GIFs, plus the report markdown skeleton.

Usage: python scripts/copy_demo_gifs.py [--input DIR] [--assets DIR]
"""

import argparse
import shutil
from pathlib import Path

# The curated set illustrating the study's findings (reference :21-53).
DEMO_GIFS = [
    # CFG finding: 9.0 vs default
    "birds_flying_cfg9.0_steps25",
    "birds_flying_cfg7.5_steps25",
    "portrait_cfg9.0_steps25",
    "portrait_cfg7.5_steps25",
    # Steps finding: 15 vs 50
    "birds_flying_cfg7.5_steps15",
    "birds_flying_cfg7.5_steps50",
    "landscape_cfg7.5_steps15",
    "landscape_cfg7.5_steps50",
    # Prompt finding: baseline vs enhanced
    "woman_waving_cfg7.5_steps25_prompt_baseline",
    "woman_waving_cfg7.5_steps25_prompt_enhanced",
    "portrait_cfg7.5_steps25_prompt_baseline",
    "portrait_cfg7.5_steps25_prompt_enhanced",
    "corgi_beach_cfg7.5_steps25_prompt_baseline",
    "corgi_beach_cfg7.5_steps25_prompt_enhanced",
    "mig21_missile_cfg7.5_steps25_prompt_baseline",
    "mig21_missile_cfg7.5_steps25_prompt_enhanced",
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", default="outputs/05_grid_search")
    p.add_argument("--assets", default="assets")
    args = p.parse_args()

    input_dir = Path(args.input)
    assets = Path(args.assets)
    assets.mkdir(parents=True, exist_ok=True)

    copied, missing = [], []
    for exp_id in DEMO_GIFS:
        src = input_dir / exp_id / f"{exp_id}.gif"
        if src.exists():
            shutil.copy2(src, assets / src.name)
            copied.append(exp_id)
        else:
            missing.append(exp_id)

    print(f"Copied {len(copied)} GIFs to {assets}/")
    for m in missing:
        print(f"  MISSING: {m}")

    print("\nReport skeleton:")
    print("## Key findings")
    print("| Finding | Baseline | Result |")
    print("|---|---|---|")
    print("| CFG 9.0 best | ![](assets/birds_flying_cfg7.5_steps25.gif) | ![](assets/birds_flying_cfg9.0_steps25.gif) |")
    print("| Steps 15 best | ![](assets/birds_flying_cfg7.5_steps50.gif) | ![](assets/birds_flying_cfg7.5_steps15.gif) |")
    print("| Prompts content-dependent | ![](assets/woman_waving_cfg7.5_steps25_prompt_baseline.gif) | ![](assets/woman_waving_cfg7.5_steps25_prompt_enhanced.gif) |")


if __name__ == "__main__":
    main()
