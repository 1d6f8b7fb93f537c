"""Shared diffusion-schedule math.

Implements the beta schedules and timestep grids with the exact semantics the
reference configures on its diffusers schedulers:

  * Euler baseline:  ``timestep_spacing="linspace", beta_schedule="linear"``
    (reference experiments/01_baseline_generation.py:76-80)
  * DDIM grid search: ``beta_schedule="linear", steps_offset=1,
    clip_sample=False`` (reference experiments/05_grid_search_ablation.py:136-141)

Both inherit the SD-1.5 training schedule: 1000 train timesteps,
beta_start=0.00085, beta_end=0.012. All schedule math is fp32 (tiny and
precision-critical — see core/dtypes.py).

Everything here is a pure function of static config; outputs are device
arrays suitable for closure into a jitted ``lax.scan``.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ScheduleConfig:
    """Training-time diffusion schedule (SD-1.5 defaults).

    The two post-processing knobs cover the checkpoint families whose
    published schedulers modify alphas_cumprod after the beta grid:

    * ``snr_shift_scale`` s != 1 applies the CogVideoX SNR shift
      acp' = acp / (s - (s-1) acp) — equivalent to scaling every SNR by
      1/s, shifting noise mass toward high-resolution detail (CogVideoX
      report; diffusers CogVideoXDDIMScheduler semantics).
    * ``rescale_zero_snr`` applies the zero-terminal-SNR rescale of Lin
      et al. 2023 ("Common Diffusion Noise Schedules and Sample Steps are
      Flawed"): sqrt(acp) is affinely mapped so the terminal step has
      exactly zero SNR (acp[-1] = 0) while acp[0] is preserved. Requires
      v_prediction (epsilon's x0 recovery divides by sqrt(acp) -> 0).
    """

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "linear"  # "linear" | "scaled_linear" | "squaredcos_cap_v2"
    prediction_type: str = "epsilon"  # "epsilon" | "v_prediction" | "sample"
    snr_shift_scale: float = 1.0
    rescale_zero_snr: bool = False


def make_betas(cfg: ScheduleConfig) -> np.ndarray:
    T = cfg.num_train_timesteps
    if cfg.beta_schedule == "linear":
        betas = np.linspace(cfg.beta_start, cfg.beta_end, T, dtype=np.float64)
    elif cfg.beta_schedule == "scaled_linear":
        betas = (
            np.linspace(cfg.beta_start**0.5, cfg.beta_end**0.5, T, dtype=np.float64)
            ** 2
        )
    elif cfg.beta_schedule == "squaredcos_cap_v2":
        # Cosine schedule (Nichol & Dhariwal 2021), capped at 0.999.
        def alpha_bar(t):
            return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2

        ts = np.arange(T, dtype=np.float64)
        betas = np.minimum(1.0 - alpha_bar((ts + 1) / T) / alpha_bar(ts / T), 0.999)
    else:
        raise ValueError(f"unknown beta_schedule: {cfg.beta_schedule}")
    return betas.astype(np.float32)


def make_alphas_cumprod(cfg: ScheduleConfig) -> np.ndarray:
    betas = make_betas(cfg).astype(np.float64)
    acp = np.cumprod(1.0 - betas)
    if cfg.snr_shift_scale != 1.0:
        s = float(cfg.snr_shift_scale)
        acp = acp / (s - (s - 1.0) * acp)
    if cfg.rescale_zero_snr:
        if cfg.prediction_type == "epsilon":
            raise ValueError(
                "rescale_zero_snr makes the terminal alphas_cumprod exactly "
                "0; epsilon prediction divides x0 recovery by sqrt(acp) and "
                "would silently produce NaN — use prediction_type="
                "'v_prediction' (Lin et al. 2023 §4) or 'sample'"
            )
        # affine map on sqrt(acp): terminal -> exactly 0, first preserved
        sq = np.sqrt(acp)
        sq = (sq - sq[-1]) * (sq[0] / (sq[0] - sq[-1]))
        acp = sq**2
    return acp.astype(np.float32)


def timesteps_leading(num_train: int, num_steps: int, steps_offset: int = 0) -> np.ndarray:
    """'leading' spacing (diffusers default; DDIM grid search path).

    round(arange(n) * (T // n))[::-1] + steps_offset
    """
    step_ratio = num_train // num_steps
    ts = (np.arange(0, num_steps) * step_ratio).round()[::-1].copy()
    return (ts + steps_offset).astype(np.int32)


def timesteps_linspace(num_train: int, num_steps: int) -> np.ndarray:
    """'linspace' spacing (Euler baseline path): linspace(0, T-1, n)[::-1]."""
    return (
        np.linspace(0, num_train - 1, num_steps, dtype=np.float64)[::-1]
        .round()
        .astype(np.int32)
        .copy()
    )


def timesteps_trailing(num_train: int, num_steps: int) -> np.ndarray:
    """'trailing' spacing: round(T - i*T/n) - 1 for i in [0, n).

    Same grid as the textbook ``arange(T, 0, -T/n).round() - 1`` but with
    an integer-length construction: the float-step arange emits n+1 entries
    (trailing t = -1) for ~6% of step counts (n = 61, 103, 121, ...), which
    silently broke the [N] table-shape contract downstream.
    """
    i = np.arange(num_steps, dtype=np.float64)
    ts = np.round(num_train - i * (num_train / num_steps)).astype(np.int32) - 1
    return ts


def dynamic_cfg_schedule(guidance_scale: float, num_steps: int) -> np.ndarray:
    """Cosine^5 dynamic-CFG ramp (the CogVideoX recipe): guidance starts at
    1 (no CFG while the trajectory is pure noise) and ramps to
    ``guidance_scale`` by the final step,

        g_i = 1 + (g - 1) * (1 - cos(pi * ((i+1)/N)^5)) / 2

    so early high-sigma steps are barely guided and detail-setting late
    steps get the full scale. Returns an [N] fp32 array for the pipelines'
    per-step guidance surface (``pipe(prompt, guidance_scale=schedule)``).
    The ramp's constant convention re-validates against the published
    pipeline on real-weights day; the per-step mechanism is exact.
    """
    i = np.arange(1, num_steps + 1, dtype=np.float64)
    ramp = 1.0 - np.cos(np.pi * (i / num_steps) ** 5.0)
    return (1.0 + (guidance_scale - 1.0) * ramp / 2.0).astype(np.float32)


def cfg_combine(
    uncond: jnp.ndarray,
    cond: jnp.ndarray,
    guidance_scale,
    guidance_rescale: float = 0.0,
) -> jnp.ndarray:
    """Classifier-free-guidance combine with optional std rescale.

    ``uncond + s * (cond - uncond)`` (reference docs/01:184), then — when
    ``guidance_rescale`` phi > 0 — the overexposure fix of Lin et al.
    ("Common Diffusion Noise Schedules and Sample Steps are Flawed",
    eq. 15-16): per-sample std of the guided output is matched back to the
    cond branch's std, blended by phi. Stats run in fp32 over all
    non-batch axes; phi is a Python float baked into the program (one
    compile per deployment value, like the sampler choice).
    """
    guided = uncond + guidance_scale * (cond - uncond)
    if not guidance_rescale:
        return guided
    axes = tuple(range(1, guided.ndim))
    g32 = guided.astype(jnp.float32)
    std_cond = jnp.std(cond.astype(jnp.float32), axis=axes, keepdims=True)
    std_g = jnp.std(g32, axis=axes, keepdims=True)
    rescaled = g32 * (std_cond / jnp.maximum(std_g, 1e-8))
    out = guidance_rescale * rescaled + (1.0 - guidance_rescale) * g32
    return out.astype(guided.dtype)


def pred_x0_and_eps(
    sample: jnp.ndarray,
    model_output: jnp.ndarray,
    alpha_prod_t: jnp.ndarray,
    prediction_type: str,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Recover (x0, eps) from a model output under each prediction convention."""
    sqrt_a = jnp.sqrt(alpha_prod_t)
    sqrt_1ma = jnp.sqrt(1.0 - alpha_prod_t)
    if prediction_type == "epsilon":
        eps = model_output
        x0 = (sample - sqrt_1ma * eps) / sqrt_a
    elif prediction_type == "v_prediction":
        x0 = sqrt_a * sample - sqrt_1ma * model_output
        eps = sqrt_a * model_output + sqrt_1ma * sample
    elif prediction_type == "sample":
        x0 = model_output
        eps = (sample - sqrt_a * x0) / sqrt_1ma
    else:
        raise ValueError(f"unknown prediction_type: {prediction_type}")
    return x0, eps


def pad_tables(tables, num_steps: int, max_steps: int):
    """Edge-pad every per-step leaf so tables become a RUNTIME argument.

    Turns an N-step table pytree (NamedTuple of [N] or [N+k] arrays plus
    python scalars) into a max_steps-shaped one: array leaves gain
    (max_steps - num_steps) edge-repeated rows, scalars become jnp fp32.
    With steps i >= num_steps skipped via ``lax.cond`` in the pipeline's
    variable-steps denoise program, the padded entries are never used — the
    padding only fixes the SHAPES so one compiled program serves every step
    count (the reference study's 6 step counts would otherwise be 6
    compiles; experiments/05 grids at 05:40-51).
    """
    import jax.numpy as _jnp

    extra = max_steps - num_steps
    if extra < 0:
        raise ValueError(f"num_steps {num_steps} > max_steps {max_steps}")
    out = {}
    for name, leaf in tables._asdict().items():
        a = np.asarray(leaf)
        if a.ndim >= 1:
            a = np.pad(a, [(0, extra)] + [(0, 0)] * (a.ndim - 1), mode="edge")
            out[name] = _jnp.asarray(a)
        else:
            out[name] = _jnp.asarray(a, _jnp.float32)
    return type(tables)(**out)
