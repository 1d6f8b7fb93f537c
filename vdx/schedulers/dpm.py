"""DPM-Solver++(2M) multistep sampler as pure, scan-compatible functions.

Beyond-parity sampler (the reference's docs survey DPM-Solver as future work,
reference docs/01_diffusion_fundamentals.md solver table): second-order
multistep in log-SNR space, giving DDIM-class quality in ~half the steps.

State threads the previous x0 prediction through the scan carry (the one
extra carry tensor a multistep method needs); step 0 falls back to first
order, exactly like the standard DPM-Solver++(2M) formulation.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from vdx.schedulers.common import (
    ScheduleConfig,
    make_alphas_cumprod,
    pred_x0_and_eps,
    timesteps_leading,
)


IS_MULTISTEP = True


@dataclasses.dataclass(frozen=True)
class DPMConfig:
    schedule: ScheduleConfig = ScheduleConfig()
    steps_offset: int = 1


class DPMTables(NamedTuple):
    timesteps: jnp.ndarray  # [N] int32
    alpha_t: jnp.ndarray  # [N+1] sqrt(alphas_cumprod) per solver node (terminal ~ x0)
    sigma_t: jnp.ndarray  # [N+1] sqrt(1 - alphas_cumprod)
    lam: jnp.ndarray  # [N+1] log(alpha/sigma)
    alpha_prod: jnp.ndarray  # [N] alphas_cumprod at the model-facing timestep
    init_noise_sigma: float


def make_tables(num_inference_steps: int, cfg: DPMConfig = DPMConfig()) -> DPMTables:
    T = cfg.schedule.num_train_timesteps
    acp = make_alphas_cumprod(cfg.schedule).astype(np.float64)
    ts = timesteps_leading(T, num_inference_steps, cfg.steps_offset)
    ts = np.clip(ts, 0, T - 1)

    a_nodes = acp[ts]
    # Terminal node: fully denoised. Use a tiny sigma floor to keep lambda finite.
    a_full = np.concatenate([a_nodes, [1.0 - 1e-8]])
    alpha_t = np.sqrt(a_full)
    sigma_t = np.sqrt(1.0 - a_full)
    lam = np.log(alpha_t) - np.log(np.maximum(sigma_t, 1e-10))

    return DPMTables(
        timesteps=jnp.asarray(ts, dtype=jnp.int32),
        alpha_t=jnp.asarray(alpha_t, dtype=jnp.float32),
        sigma_t=jnp.asarray(sigma_t, dtype=jnp.float32),
        lam=jnp.asarray(lam, dtype=jnp.float32),
        alpha_prod=jnp.asarray(a_nodes, dtype=jnp.float32),
        init_noise_sigma=1.0,
    )


def scale_model_input(sample: jnp.ndarray, step_index, tables: DPMTables) -> jnp.ndarray:
    del step_index, tables
    return sample


def init_state(sample: jnp.ndarray) -> jnp.ndarray:
    """Previous-x0 slot for the multistep carry (zeros before step 0)."""
    return jnp.zeros_like(sample)


def step_multistep(
    sample: jnp.ndarray,
    model_output: jnp.ndarray,
    step_index: jnp.ndarray,
    prev_x0: jnp.ndarray,
    tables: DPMTables,
    cfg: DPMConfig = DPMConfig(),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """DPM-Solver++(2M) update. Returns (next_sample, x0_for_next_carry)."""
    i = step_index
    sample32 = sample.astype(jnp.float32)
    out32 = model_output.astype(jnp.float32)

    a_prod = tables.alpha_prod[i]
    x0, _ = pred_x0_and_eps(sample32, out32, a_prod, cfg.schedule.prediction_type)

    lam_s, lam_t = tables.lam[i], tables.lam[i + 1]
    alpha_next, sigma_next = tables.alpha_t[i + 1], tables.sigma_t[i + 1]
    sigma_cur = tables.sigma_t[i]
    h = lam_t - lam_s

    # First-order (DDIM-like in x0 parameterisation) target
    first = (sigma_next / sigma_cur) * sample32 - alpha_next * jnp.expm1(-h) * x0

    # Second-order correction using the previous x0 prediction
    lam_prev = tables.lam[jnp.maximum(i - 1, 0)]
    h_prev = lam_s - lam_prev
    r = h_prev / jnp.where(h == 0, 1.0, h)
    d = jnp.where(r == 0, 0.0, 1.0 / jnp.maximum(r, 1e-10))
    x0_bar = x0 + 0.5 * d * (x0 - prev_x0)
    second = (sigma_next / sigma_cur) * sample32 - alpha_next * jnp.expm1(-h) * x0_bar

    # lower_order_final (the standard DPM-Solver++ stabilization, matching
    # diffusers' default): the terminal node's lambda gap is huge (sigma
    # floor 1e-10), so the 1/(2r) extrapolation amplifies the last x0
    # delta — use first order there. Terminal is detected by the appended
    # node's sigma value (1e-4; every real schedule sigma is >= 0.01) so
    # the check stays correct under variable_steps' padded tables.
    first_order = jnp.logical_or(i == 0, sigma_next < 5e-4)
    next_sample = jnp.where(first_order, first, second)
    return next_sample.astype(sample.dtype), x0


def step(sample, model_output, step_index, tables, cfg: DPMConfig = DPMConfig()):
    """Stateless first-order fallback (for the uniform sampler API)."""
    out, _ = step_multistep(
        sample, model_output, step_index, jnp.zeros_like(sample), tables, cfg
    )
    return out
