"""Temporal-consistency metrics — exact formulas of the reference engine.

Reimplements, on device as batched jnp ops, the per-pair/per-video metrics of
reference experiments/06_measure_grid_search.py:

  * MSE / PSNR            (06:209-218; PSNR=100 when MSE < 1e-10)
  * flicker index          = mean_t mean_px |I_t - 2 I_{t+1} + I_{t+2}| (06:221-235)
  * temporal consistency   = var(mse)*1000 + mean(mse)*100
                             + mean(lpips)*50 + var(lpips)*500 (06:238-252)

Where the reference loops frame pairs one at a time with per-pair host<->GPU
transfers (06:320-349), here every pair is computed in ONE jitted call over
the [F, H, W, C] stack — the whole suite is a single device program.
Variances are population variances (np.var default), matching the reference.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def mse_pairs(frames: jnp.ndarray) -> jnp.ndarray:
    """[F, H, W, C] in [0,1] -> [F-1] per-consecutive-pair MSE."""
    d = frames[1:].astype(jnp.float32) - frames[:-1].astype(jnp.float32)
    return jnp.mean(d * d, axis=(1, 2, 3))


def psnr_from_mse(mse: jnp.ndarray) -> jnp.ndarray:
    """PSNR per pair; the reference pins 100.0 below 1e-10 (06:215-218)."""
    safe = jnp.maximum(mse, 1e-30)
    return jnp.where(mse < 1e-10, 100.0, 10.0 * jnp.log10(1.0 / safe))


def flicker_index(frames: jnp.ndarray) -> jnp.ndarray:
    """Second-order temporal difference (06:221-235). Scalar; 0 if F < 3."""
    F = frames.shape[0]
    if F < 3:
        return jnp.float32(0.0)
    x = frames.astype(jnp.float32)
    second = x[:-2] - 2.0 * x[1:-1] + x[2:]
    return jnp.mean(jnp.abs(second))


def temporal_consistency_score(
    mse: jnp.ndarray, lpips: jnp.ndarray
) -> jnp.ndarray:
    """Composite score (06:238-252). Population variances."""
    return (
        jnp.var(mse) * 1000.0
        + jnp.mean(mse) * 100.0
        + jnp.mean(lpips) * 50.0
        + jnp.var(lpips) * 500.0
    )


@jax.jit
def basic_metrics(frames: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """All non-model metrics of the suite in one jitted call."""
    mse = mse_pairs(frames)
    return {
        "mse": mse,
        "psnr": psnr_from_mse(mse),
        "flicker_index": flicker_index(frames),
    }
