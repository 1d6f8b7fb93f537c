"""UniPC (unified predictor-corrector) sampler, order 2, x0-prediction.

Beyond-parity sampler (the reference's docs survey fast ODE solvers as
future work, reference docs/01_diffusion_fundamentals.md solver table):
Zhao et al. 2023, "UniPC: A Unified Predictor-Corrector Framework for
Fast Sampling of Diffusion Models". Same exponential-integrator family as
DPM-Solver++(2M) (schedulers/dpm.py) with two differences:

  * the B(h) = expm1(h) variant ("bh2") weights the slope correction,
  * an optional CORRECTOR: each model evaluation also refines the
    previous transition (one extra linear combine — zero extra UNet
    evals), lifting the effective local order by one.

Pure scan-compatible functions on the DDPM discrete grid (tables are
exactly dpm.make_tables'). Multistep state is the pytree
``(x0_prev, sample_prev)`` — the generalized carry the pipelines thread
opaquely via ``init_state`` (pipelines/base.py multistep scan).

Derivation note (predict-x0 parameterisation): with lambda = log(alpha/
sigma), h = lam_{i+1} - lam_i, the exact transition is
x_{i+1} = (sig_{i+1}/sig_i) x_i + alpha_{i+1} * int e^{lam-lam_{i+1}} x0(lam) dlam.
Order 1 collapses to (sig'/sig) x - alpha' expm1(-h) x0 (== DPM++ 1st
order). Order 2 adds the slope term -alpha' B(h) rho D1 with
B(h) = expm1(-h), rho = (expm1(-h)/(-h) - 1)/B(h), D1 the finite-difference
x0 slope — exact for x0 linear in lambda. The corrector applies the same
order-2 combine to the PREVIOUS transition using the just-computed x0 at
its far endpoint.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax.numpy as jnp

from vdx.schedulers import dpm
from vdx.schedulers.common import ScheduleConfig, pred_x0_and_eps

IS_MULTISTEP = True


@dataclasses.dataclass(frozen=True)
class UniPCConfig:
    schedule: ScheduleConfig = ScheduleConfig()
    steps_offset: int = 1
    #: apply the UniC corrector to the previous transition on every eval
    corrector: bool = True


class UniPCState(NamedTuple):
    x0_prev: jnp.ndarray
    sample_prev: jnp.ndarray


def make_tables(num_inference_steps: int,
                cfg: UniPCConfig = UniPCConfig()) -> dpm.DPMTables:
    """Same solver nodes as DPM-Solver++(2M) (the DDPM discrete grid)."""
    return dpm.make_tables(
        num_inference_steps,
        dpm.DPMConfig(schedule=cfg.schedule, steps_offset=cfg.steps_offset),
    )


def scale_model_input(sample, step_index, tables):
    del step_index, tables
    return sample


def init_state(sample: jnp.ndarray) -> UniPCState:
    return UniPCState(jnp.zeros_like(sample), jnp.zeros_like(sample))


def _order2_combine(x, x0, slope_term, i_from, i_to, tables):
    """The shared UniPC order-2 exponential-integrator combine for the
    transition node[i_from] -> node[i_to] (tables index space, where the
    appended terminal node is index N)."""
    lam_s, lam_t = tables.lam[i_from], tables.lam[i_to]
    h = lam_t - lam_s
    hh = -h
    hh_safe = jnp.where(hh == 0, 1.0, hh)
    phi1 = jnp.expm1(hh)            # expm1(-h); also B(h) for bh2
    b_h = jnp.where(phi1 == 0, 1.0, phi1)
    rho = (phi1 / hh_safe - 1.0) / b_h
    sig_s = jnp.where(tables.sigma_t[i_from] == 0, 1.0, tables.sigma_t[i_from])
    first = (tables.sigma_t[i_to] / sig_s) * x - tables.alpha_t[i_to] * phi1 * x0
    return first, first - tables.alpha_t[i_to] * phi1 * rho * slope_term


def step_multistep(
    sample: jnp.ndarray,
    model_output: jnp.ndarray,
    step_index: jnp.ndarray,
    state: UniPCState,
    tables: dpm.DPMTables,
    cfg: UniPCConfig = UniPCConfig(),
) -> Tuple[jnp.ndarray, UniPCState]:
    """One UniPC-2 update: correct the previous transition with the fresh
    model output (UniC), then predict the next node (UniP). Returns
    (next_sample, state) — state is threaded opaquely by the scan."""
    i = step_index
    x = sample.astype(jnp.float32)
    out32 = model_output.astype(jnp.float32)
    x0, _ = pred_x0_and_eps(x, out32, tables.alpha_prod[i],
                            cfg.schedule.prediction_type)
    x0_prev, samp_prev = state.x0_prev, state.sample_prev
    is_first = i == 0

    if cfg.corrector:
        # UniC for node[i-1] -> node[i]: same combine, slope from the two
        # endpoint x0 estimates (r = 1). Zero extra model evaluations.
        i_prev = jnp.maximum(i - 1, 0)
        _, corrected = _order2_combine(
            samp_prev.astype(jnp.float32), x0_prev, x0 - x0_prev,
            i_prev, i, tables,
        )
        x = jnp.where(is_first, x, corrected)

    # UniP for node[i] -> node[i+1]: slope extrapolated from history.
    lam_prev = tables.lam[jnp.maximum(i - 1, 0)]
    h = tables.lam[i + 1] - tables.lam[i]
    r0 = (lam_prev - tables.lam[i]) / jnp.where(h == 0, 1.0, h)
    d1 = (x0_prev - x0) / jnp.where(r0 == 0, 1.0, r0)
    first, second = _order2_combine(x, x0, d1, i, i + 1, tables)
    # first order at step 0 (no history) and at the terminal node (the
    # lower_order_final guard — same sigma-value detection as dpm.py, so
    # variable_steps' padded tables stay correct)
    first_order = jnp.logical_or(is_first, tables.sigma_t[i + 1] < 5e-4)
    next_sample = jnp.where(first_order, first, second)
    return next_sample.astype(sample.dtype), UniPCState(
        x0, x.astype(sample.dtype)
    )


def step(sample, model_output, step_index, tables,
         cfg: UniPCConfig = UniPCConfig()):
    """Stateless first-order fallback (uniform sampler API)."""
    out, _ = step_multistep(
        sample, model_output, step_index, init_state(sample), tables,
        dataclasses.replace(cfg, corrector=False),
    )
    return out
