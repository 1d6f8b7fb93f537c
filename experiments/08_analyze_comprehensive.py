"""Experiment 08: comprehensive analysis (trends, agreement, recommendations).

Thin CLI over vdx.analysis.comprehensive (parity with reference
experiments/08).

Usage:
    python experiments/08_analyze_comprehensive.py [--input JSON] [--output DIR]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from vdx.analysis.comprehensive import main  # noqa: E402

if __name__ == "__main__":
    main()
