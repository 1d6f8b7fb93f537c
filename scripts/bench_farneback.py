#!/usr/bin/env python
"""Benchmark the native Farnebäck flow vs OpenCV (when available).

Workload = the reference's flow call (experiments/06:176-187): 512x512
grayscale pair, pyr_scale 0.5, levels 3, winsize 15, iterations 3,
poly_n 5, poly_sigma 1.2. Frames are smooth synthetic patterns with a
known shift so the pyramid does real work.

Set VDX_FLOW_PROFILE=1 to get the C++ per-phase breakdown on stderr.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from vdx.metrics.flow import OpticalFlowEstimator  # noqa: E402


def make_pair(h=512, w=512, shift=3):
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    img = (
        127
        + 60 * np.sin(x / 17.0) * np.cos(y / 23.0)
        + 40 * np.sin((x + y) / 31.0)
    )
    g1 = np.clip(img, 0, 255).astype(np.uint8)
    g2 = np.roll(g1, (shift, shift), axis=(0, 1))
    return g1, g2


def main() -> None:
    g1, g2 = make_pair()
    est = OpticalFlowEstimator(backend="native")
    est.compute_flow_gray(g1, g2)  # warm (page-in, lib load)
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    times = []
    for _ in range(n):
        t0 = time.time()
        flow = est.compute_flow_gray(g1, g2)
        times.append(time.time() - t0)
    print(f"native: best {min(times)*1e3:.1f} ms  mean {np.mean(times)*1e3:.1f} ms"
          f"  (flow mean |u| {np.abs(flow).mean():.3f})")

    try:
        import cv2
    except ImportError:
        print("cv2 not available; skipping OpenCV comparison")
        return
    cv2.calcOpticalFlowFarneback(g1, g2, None, 0.5, 3, 15, 3, 5, 1.2, 0)
    times = []
    for _ in range(n):
        t0 = time.time()
        ref = cv2.calcOpticalFlowFarneback(g1, g2, None, 0.5, 3, 15, 3, 5, 1.2, 0)
        times.append(time.time() - t0)
    err = np.abs(ref - flow)
    print(f"cv2:    best {min(times)*1e3:.1f} ms  mean {np.mean(times)*1e3:.1f} ms"
          f"  |diff| max {err.max():.2e} mean {err.mean():.2e}")


if __name__ == "__main__":
    main()
