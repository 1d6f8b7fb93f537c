"""DDIM sampler as a pure, scan-compatible function.

Matches the scheduler the reference grid search configures
(reference experiments/05_grid_search_ablation.py:136-141):
``DDIMScheduler.from_config(..., beta_schedule="linear", steps_offset=1,
clip_sample=False)`` on the SD-1.5 base config (leading timestep spacing,
set_alpha_to_one=False, eta=0 deterministic path; math per reference
docs/01_diffusion_fundamentals.md:105-124).

Design: instead of a stateful ``scheduler.step`` object, :func:`make_tables`
precomputes per-step ``(alpha_prod_t, alpha_prod_prev)`` vectors indexed by
the scan step index, so the whole denoise loop lives inside one
``jax.lax.scan`` with no host round-trips.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from vdx.schedulers.common import (
    ScheduleConfig,
    make_alphas_cumprod,
    pred_x0_and_eps,
    timesteps_leading,
    timesteps_linspace,
    timesteps_trailing,
)


@dataclasses.dataclass(frozen=True)
class DDIMConfig:
    schedule: ScheduleConfig = ScheduleConfig()
    steps_offset: int = 1
    clip_sample: bool = False
    clip_sample_range: float = 1.0
    set_alpha_to_one: bool = False
    thresholding: bool = False
    timestep_spacing: str = "leading"  # "leading" | "trailing" | "linspace"


class DDIMTables(NamedTuple):
    """Per-step constants for an N-step DDIM run. All fp32, shape [N]."""

    timesteps: jnp.ndarray  # int32 — the train-time t fed to the model
    alpha_prod_t: jnp.ndarray
    alpha_prod_prev: jnp.ndarray
    init_noise_sigma: float  # DDIM latents start at unit sigma


def make_tables(num_inference_steps: int, cfg: DDIMConfig = DDIMConfig()) -> DDIMTables:
    T = cfg.schedule.num_train_timesteps
    acp = make_alphas_cumprod(cfg.schedule)
    if cfg.timestep_spacing == "leading":
        ts = timesteps_leading(T, num_inference_steps, cfg.steps_offset)
    elif cfg.timestep_spacing == "trailing":
        ts = timesteps_trailing(T, num_inference_steps)
    elif cfg.timestep_spacing == "linspace":
        ts = timesteps_linspace(T, num_inference_steps)
    else:
        raise ValueError(f"unknown timestep_spacing: {cfg.timestep_spacing}")
    ts = np.clip(ts, 0, T - 1)

    prev_ts = ts - T // num_inference_steps
    final_alpha = 1.0 if cfg.set_alpha_to_one else float(acp[0])
    a_t = acp[ts]
    a_prev = np.where(prev_ts >= 0, acp[np.clip(prev_ts, 0, T - 1)], final_alpha)

    return DDIMTables(
        timesteps=jnp.asarray(ts, dtype=jnp.int32),
        alpha_prod_t=jnp.asarray(a_t, dtype=jnp.float32),
        alpha_prod_prev=jnp.asarray(a_prev, dtype=jnp.float32),
        init_noise_sigma=1.0,
    )


def step(
    sample: jnp.ndarray,
    model_output: jnp.ndarray,
    step_index: jnp.ndarray,
    tables: DDIMTables,
    cfg: DDIMConfig = DDIMConfig(),
) -> jnp.ndarray:
    """One deterministic (eta=0) DDIM update: x_t -> x_{t-1}.

    ``step_index`` indexes into the precomputed tables (0 = most-noised step),
    making this directly usable as the body of ``lax.scan`` over
    ``jnp.arange(N)``.
    """
    a_t = tables.alpha_prod_t[step_index]
    a_prev = tables.alpha_prod_prev[step_index]

    sample32 = sample.astype(jnp.float32)
    out32 = model_output.astype(jnp.float32)
    x0, eps = pred_x0_and_eps(sample32, out32, a_t, cfg.schedule.prediction_type)

    if cfg.clip_sample:
        x0 = jnp.clip(x0, -cfg.clip_sample_range, cfg.clip_sample_range)

    direction = jnp.sqrt(1.0 - a_prev) * eps
    prev_sample = jnp.sqrt(a_prev) * x0 + direction
    return prev_sample.astype(sample.dtype)


def scale_model_input(sample: jnp.ndarray, step_index, tables: DDIMTables) -> jnp.ndarray:
    """DDIM applies no input scaling (identity, kept for a uniform sampler API)."""
    del step_index, tables
    return sample


def add_noise(
    original: jnp.ndarray,
    noise: jnp.ndarray,
    timestep: jnp.ndarray,
    cfg: DDIMConfig = DDIMConfig(),
) -> jnp.ndarray:
    """Forward-diffuse clean samples to train-time t (img2img / training path)."""
    acp = jnp.asarray(make_alphas_cumprod(cfg.schedule))
    a = acp[timestep]
    return jnp.sqrt(a) * original + jnp.sqrt(1.0 - a) * noise


def add_noise_at(
    original: jnp.ndarray,
    noise: jnp.ndarray,
    step_index,
    tables: DDIMTables,
) -> jnp.ndarray:
    """``add_noise`` indexed by inference step (the video2video entry
    point): diffuse clean latents to the step_index-th table node."""
    a = tables.alpha_prod_t[step_index]
    return (
        jnp.sqrt(a) * original.astype(jnp.float32)
        + jnp.sqrt(1.0 - a) * noise.astype(jnp.float32)
    )
