"""EDM (Karras) sampler — the SVD img2vid sampling formulation.

Implements the EDM preconditioning + Karras sigma schedule (Karras et al.
2022) used by Stable Video Diffusion (BASELINE.json configs[2]):

  sigma grid: sigma_i = (smax^(1/rho) + i/(n-1) (smin^(1/rho) - smax^(1/rho)))^rho
  preconditioning (sigma_data = 1):
      c_skip = 1 / (sigma^2 + 1)
      c_out  = -sigma / sqrt(sigma^2 + 1)
      c_in   = 1 / sqrt(sigma^2 + 1)
      denoised = c_skip * x + c_out * F(c_in * x, t)      [v-style model]
  model timestep: t = 0.25 * log(sigma)  (continuous)
  deterministic Euler update on the sigma grid.

Pure scan-compatible functions, same surface as the other samplers.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class EDMConfig:
    sigma_min: float = 0.002
    sigma_max: float = 700.0
    sigma_data: float = 1.0
    rho: float = 7.0


class EDMTables(NamedTuple):
    timesteps: jnp.ndarray  # [N] continuous: 0.25*log(sigma)
    sigmas: jnp.ndarray  # [N+1], terminal 0
    init_noise_sigma: float


def make_tables(num_inference_steps: int, cfg: EDMConfig = EDMConfig()) -> EDMTables:
    n = num_inference_steps
    i = np.arange(n, dtype=np.float64)
    inv_rho = 1.0 / cfg.rho
    sigmas = (
        cfg.sigma_max**inv_rho
        + i / max(n - 1, 1) * (cfg.sigma_min**inv_rho - cfg.sigma_max**inv_rho)
    ) ** cfg.rho
    ts = 0.25 * np.log(sigmas)
    sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)
    return EDMTables(
        timesteps=jnp.asarray(ts, dtype=jnp.float32),
        sigmas=jnp.asarray(sigmas, dtype=jnp.float32),
        init_noise_sigma=float(sigmas[0]),
    )


def scale_model_input(sample: jnp.ndarray, step_index, tables: EDMTables) -> jnp.ndarray:
    """c_in scaling."""
    sigma = tables.sigmas[step_index]
    return (sample.astype(jnp.float32) / jnp.sqrt(sigma**2 + 1.0)).astype(sample.dtype)


def add_noise_at(
    original: jnp.ndarray,
    noise: jnp.ndarray,
    step_index,
    tables: EDMTables,
) -> jnp.ndarray:
    """Forward-diffuse clean latents to the step_index-th sigma node
    (video2video entry point; EDM latents live at natural scale)."""
    sigma = tables.sigmas[step_index]
    return (original.astype(jnp.float32) + sigma * noise.astype(jnp.float32))


def denoised_from_model_output(
    sample: jnp.ndarray, model_output: jnp.ndarray, sigma, cfg: EDMConfig = EDMConfig()
) -> jnp.ndarray:
    """EDM skip/out combination. ``sample`` is the UNSCALED latent."""
    x = sample.astype(jnp.float32)
    F_out = model_output.astype(jnp.float32)
    c_skip = 1.0 / (sigma**2 + 1.0)
    c_out = -sigma / jnp.sqrt(sigma**2 + 1.0)
    return c_skip * x + c_out * F_out


def step(
    sample: jnp.ndarray,
    model_output: jnp.ndarray,
    step_index: jnp.ndarray,
    tables: EDMTables,
    cfg: EDMConfig = EDMConfig(),
) -> jnp.ndarray:
    sigma = tables.sigmas[step_index]
    sigma_next = tables.sigmas[step_index + 1]
    x = sample.astype(jnp.float32)
    denoised = denoised_from_model_output(sample, model_output, sigma, cfg)
    d = (x - denoised) / sigma
    return (x + d * (sigma_next - sigma)).astype(sample.dtype)
