"""Live parity vs real OpenCV Farnebäck (cv2 is in the build env).

Stronger than the committed-value goldens in test_metrics.py: arbitrary
synthetic inputs, fresh cv2 output, exact reference parameters
(reference experiments/06_measure_grid_search.py:176-187 — pyr_scale 0.5,
levels 3, winsize 15, iterations 3, poly_n 5, poly_sigma 1.2, flags 0).
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from vdx.metrics.farneback import calc_flow, flow_stats  # noqa: E402


def _smooth_field(rng, h, w, blur=9):
    """Textured but smooth grayscale image — Farnebäck needs local structure
    but pure white noise makes flow ill-conditioned on both sides."""
    img = rng.random((h, w)).astype(np.float32)
    img = cv2.GaussianBlur(img, (blur, blur), 0)
    img = (img - img.min()) / (img.max() - img.min() + 1e-9)
    return (img * 255).astype(np.uint8)


@pytest.mark.parametrize("shift", [(2, 3), (-4, 1)])
def test_flow_stats_match_cv2_on_shifted_images(shift):
    rng = np.random.default_rng(0)
    a = _smooth_field(rng, 96, 128)
    dy, dx = shift
    b = np.roll(np.roll(a, dy, axis=0), dx, axis=1)

    want = cv2.calcOpticalFlowFarneback(
        a, b, None, 0.5, 3, 15, 3, 5, 1.2, 0
    )
    got = calc_flow(a, b)

    # Flow-field statistics drive the metric engine; borders differ by
    # implementation detail (cv2's border handling), so compare interiors.
    wi, gi = want[16:-16, 16:-16], got[16:-16, 16:-16]
    sw, sg = flow_stats(wi), flow_stats(gi)
    assert sg["magnitude_mean"] == pytest.approx(sw["magnitude_mean"], rel=2e-2)
    assert sg["magnitude_std"] == pytest.approx(sw["magnitude_std"], rel=6e-2)
    # pointwise: interiors agree to a small fraction of a pixel
    assert float(np.abs(gi - wi).mean()) < 0.05
    # and both recover the true shift direction
    assert np.sign(gi[..., 0].mean()) == np.sign(dx)
    assert np.sign(gi[..., 1].mean()) == np.sign(dy)


def test_flow_metric_fields_match_cv2_on_natural_pair(reference_root):
    """On real committed reference frames: our flow's metric-level numbers
    match live cv2's to the tolerance the engine uses."""
    import pathlib

    from PIL import Image

    frames_dir = None
    for p in sorted(
        (reference_root / "outputs" / "05_grid_search").glob("*/frames")
    ):
        frames_dir = p
        break
    if frames_dir is None:
        from tests.conftest import golden_skip

        golden_skip("no committed reference frames")
    fs = sorted(pathlib.Path(frames_dir).glob("*.png"))[:2]
    if len(fs) < 2:
        pytest.skip("not enough frames")
    a = np.asarray(Image.open(fs[0]).convert("L"))
    b = np.asarray(Image.open(fs[1]).convert("L"))

    want = cv2.calcOpticalFlowFarneback(a, b, None, 0.5, 3, 15, 3, 5, 1.2, 0)
    got = calc_flow(a, b)
    sw, sg = flow_stats(want), flow_stats(got)
    assert sg["magnitude_mean"] == pytest.approx(sw["magnitude_mean"], rel=2e-3)
    assert sg["magnitude_std"] == pytest.approx(sw["magnitude_std"], rel=2e-3)
