"""Experiment 07: analyze grid-search results (per-video sweeps, optima).

Thin CLI over vdx.analysis.basic (parity with reference experiments/07).

Usage:
    python experiments/07_analyze_grid_search.py [--input JSON] [--output DIR]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from vdx.analysis.basic import main  # noqa: E402

if __name__ == "__main__":
    main()
