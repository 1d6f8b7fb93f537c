"""DPM-Solver++(2M) on the EDM/Karras sigma grid — SVD's fast exact sampler.

Beyond-parity sampler for the EDM-preconditioned families (SVD img2vid,
BASELINE.json configs[2]; the reference's docs survey DPM-Solver as future
work, reference docs/01_diffusion_fundamentals.md solver table). Second-order
multistep in log-SNR space over the SAME Karras sigma schedule as the
first-order ``edm`` sampler — one model evaluation per step, so N steps of
dpm_edm cost exactly N steps of edm but carry second-order ODE accuracy:
the 25-step Euler-EDM trajectory quality arrives in ~half the steps
(measured: scripts/bench_svd_sampler.py, PERF.md).

Math (variance-exploding form — EDM latents live at x_t = x0 + sigma_t eps,
i.e. alpha_t = 1, lambda_t = -log sigma_t):

  h_i   = lambda_{i+1} - lambda_i = log(sigma_i / sigma_{i+1})
  e^{-h_i} = sigma_{i+1} / sigma_i                      (exact, no logs)
  x_{i+1} = (sigma_{i+1}/sigma_i) x_i + (1 - sigma_{i+1}/sigma_i) * D_i
  D_i   = x0_i + (1 / 2 r_i) (x0_i - x0_{i-1}),  r_i = h_{i-1} / h_i

with x0_i the EDM-preconditioned denoised prediction (edm.
denoised_from_model_output). First order (D_i = x0_i) at step 0 (no
history) and at the FINAL step (sigma_{N} = 0 makes h_N infinite —
the standard lower_order_final stabilization).

Pure scan-compatible functions; plugs into the pipelines' generic
``dpm*`` multistep protocol (vdx/pipelines/base.py _denoise_raw).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from vdx.schedulers.edm import (
    EDMConfig,
    EDMTables,
    add_noise_at,
    denoised_from_model_output,
    make_tables,
    scale_model_input,
)

__all__ = [
    "EDMConfig",
    "EDMTables",
    "make_tables",
    "scale_model_input",
    "add_noise_at",
    "init_state",
    "step_multistep",
    "step",
]

IS_MULTISTEP = True

_TINY = 1e-10


def init_state(sample: jnp.ndarray) -> jnp.ndarray:
    """Previous-x0 slot for the multistep carry (zeros before step 0)."""
    return jnp.zeros_like(sample)


def step_multistep(
    sample: jnp.ndarray,
    model_output: jnp.ndarray,
    step_index: jnp.ndarray,
    prev_x0: jnp.ndarray,
    tables: EDMTables,
    cfg: EDMConfig = EDMConfig(),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """DPM-Solver++(2M) update. Returns (next_sample, x0_for_next_carry).

    ``sample`` is the UNSCALED latent (the pipeline scan keeps latents at
    natural EDM scale and applies c_in via scale_model_input)."""
    i = step_index
    x = sample.astype(jnp.float32)

    sigma_prev = tables.sigmas[jnp.maximum(i - 1, 0)]
    sigma_cur = tables.sigmas[i]
    sigma_next = tables.sigmas[i + 1]

    x0 = denoised_from_model_output(sample, model_output, sigma_cur, cfg)

    ratio = sigma_next / jnp.maximum(sigma_cur, _TINY)
    h = jnp.log(jnp.maximum(sigma_cur, _TINY)) - jnp.log(
        jnp.maximum(sigma_next, _TINY)
    )
    h_prev = jnp.log(jnp.maximum(sigma_prev, _TINY)) - jnp.log(
        jnp.maximum(sigma_cur, _TINY)
    )
    r = h_prev / jnp.maximum(h, _TINY)

    # second-order extrapolated denoised estimate
    d2 = x0 + (0.5 / jnp.maximum(r, _TINY)) * (x0 - prev_x0)
    # first order at step 0 (no history) and the terminal step (h -> inf).
    # Terminal is detected by sigma_next == 0 rather than a static index so
    # the SAME program is correct under variable_steps (padded tables put
    # the literal 0.0 terminal at the runtime step count's node).
    first_order = jnp.logical_or(i == 0, sigma_next <= 0.0)
    d = jnp.where(first_order, x0, d2)

    next_sample = ratio * x + (1.0 - ratio) * d
    return next_sample.astype(sample.dtype), x0


def step(
    sample: jnp.ndarray,
    model_output: jnp.ndarray,
    step_index: jnp.ndarray,
    tables: EDMTables,
    cfg: EDMConfig = EDMConfig(),
) -> jnp.ndarray:
    """Stateless first-order fallback (uniform sampler API; identical to the
    ``edm`` Euler update ONLY in the terminal step — elsewhere it is the
    DDIM-like exponential-integrator first-order update)."""
    out, _ = step_multistep(
        sample, model_output, step_index, jnp.zeros_like(sample), tables, cfg
    )
    return out
