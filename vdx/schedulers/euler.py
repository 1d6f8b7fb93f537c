"""Euler discrete sampler (Karras-style sigma formulation) as pure functions.

Matches the scheduler the reference baseline configures
(reference experiments/01_baseline_generation.py:76-80):
``EulerDiscreteScheduler.from_config(..., timestep_spacing="linspace",
beta_schedule="linear")`` — i.e. sigmas interpolated onto a linspace timestep
grid, init latents scaled by max sigma, model input scaled by
1/sqrt(sigma^2+1), deterministic Euler update (s_churn=0); math per
reference docs/01_diffusion_fundamentals.md:126-140.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from vdx.schedulers.common import ScheduleConfig, make_alphas_cumprod


@dataclasses.dataclass(frozen=True)
class EulerConfig:
    schedule: ScheduleConfig = ScheduleConfig()
    timestep_spacing: str = "linspace"


class EulerTables(NamedTuple):
    """Per-step constants, shape [N] (sigmas has N+1 with terminal 0)."""

    timesteps: jnp.ndarray  # fp32 — Euler feeds fractional timesteps to the model
    sigmas: jnp.ndarray  # [N+1]
    init_noise_sigma: float


def make_tables(num_inference_steps: int, cfg: EulerConfig = EulerConfig()) -> EulerTables:
    T = cfg.schedule.num_train_timesteps
    acp = make_alphas_cumprod(cfg.schedule).astype(np.float64)
    sigmas_train = np.sqrt((1.0 - acp) / acp)

    if cfg.timestep_spacing == "linspace":
        ts = np.linspace(0, T - 1, num_inference_steps, dtype=np.float64)[::-1].copy()
    elif cfg.timestep_spacing == "leading":
        step_ratio = T // num_inference_steps
        ts = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].copy() + 1
    elif cfg.timestep_spacing == "trailing":
        step_ratio = T / num_inference_steps
        ts = np.round(np.arange(T, 0, -step_ratio)).astype(np.float64) - 1
    else:
        raise ValueError(cfg.timestep_spacing)

    sigmas = np.interp(ts, np.arange(0, T), sigmas_train)
    sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)

    max_sigma = float(sigmas.max())
    if cfg.timestep_spacing in ("linspace", "trailing"):
        init_noise_sigma = max_sigma
    else:
        init_noise_sigma = float((max_sigma**2 + 1.0) ** 0.5)

    return EulerTables(
        timesteps=jnp.asarray(ts, dtype=jnp.float32),
        sigmas=jnp.asarray(sigmas, dtype=jnp.float32),
        init_noise_sigma=init_noise_sigma,
    )


def scale_model_input(sample: jnp.ndarray, step_index, tables: EulerTables) -> jnp.ndarray:
    sigma = tables.sigmas[step_index]
    return (sample.astype(jnp.float32) / jnp.sqrt(sigma**2 + 1.0)).astype(sample.dtype)


def add_noise_at(
    original: jnp.ndarray,
    noise: jnp.ndarray,
    step_index,
    tables: EulerTables,
) -> jnp.ndarray:
    """Forward-diffuse clean latents to the step_index-th sigma node —
    the video2video entry point (the trajectory then continues from that
    node exactly as if it had been denoised down to it)."""
    sigma = tables.sigmas[step_index]
    return (original.astype(jnp.float32) + sigma * noise.astype(jnp.float32))


def step(
    sample: jnp.ndarray,
    model_output: jnp.ndarray,
    step_index: jnp.ndarray,
    tables: EulerTables,
    cfg: EulerConfig = EulerConfig(),
) -> jnp.ndarray:
    """One deterministic Euler update along the sigma grid.

    NOTE: ``sample`` here is the *unscaled* latent; the model was fed
    ``scale_model_input(sample)``.
    """
    sigma = tables.sigmas[step_index]
    sigma_next = tables.sigmas[step_index + 1]

    sample32 = sample.astype(jnp.float32)
    out32 = model_output.astype(jnp.float32)

    pred = cfg.schedule.prediction_type
    if pred == "epsilon":
        denoised = sample32 - sigma * out32
    elif pred == "v_prediction":
        # x0 = x * (1/(sigma^2+1)) + v * (-sigma/sqrt(sigma^2+1))
        denoised = sample32 * (1.0 / (sigma**2 + 1.0)) + out32 * (
            -sigma / jnp.sqrt(sigma**2 + 1.0)
        )
    elif pred == "sample":
        denoised = out32
    else:
        raise ValueError(pred)

    derivative = (sample32 - denoised) / sigma
    prev_sample = sample32 + derivative * (sigma_next - sigma)
    return prev_sample.astype(sample.dtype)
