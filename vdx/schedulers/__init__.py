"""Samplers as pure, scan-compatible function namespaces.

Uniform surface per sampler module:
  make_tables(num_inference_steps, cfg) -> Tables (NamedTuple of device arrays)
  scale_model_input(sample, step_index, tables) -> sample fed to the model
  step(sample, model_output, step_index, tables, cfg) -> next sample
plus ``tables.timesteps`` (the model-facing t per step) and
``tables.init_noise_sigma`` (initial latent scale).
"""

from vdx.schedulers import ddim, dpm, dpm_edm, edm, euler, unipc
from vdx.schedulers.common import ScheduleConfig

_SAMPLERS = {
    "ddim": ddim,
    "euler": euler,
    "dpm": dpm,
    "dpmsolver++": dpm,
    "edm": edm,
    "dpm_edm": dpm_edm,
    "unipc": unipc,
}


def get_sampler(name: str):
    try:
        return _SAMPLERS[name.lower()]
    except KeyError:
        raise ValueError(
            f"unknown sampler {name!r}; available: {sorted(_SAMPLERS)}"
        ) from None


def is_multistep(name: str) -> bool:
    """Whether the sampler threads a multistep state through the scan carry
    (``init_state`` / ``step_multistep``) — the gate pipelines use for the
    carry shape and for features that need a single-step sampler (PAB,
    video2video)."""
    return getattr(get_sampler(name), "IS_MULTISTEP", False)


def make_tables_for(name: str, num_steps: int, cfg=None):
    """``make_tables`` honoring an optional per-pipeline config override
    (None = the sampler module's defaults, the SD-1.5 reference semantics).
    The single spot for the override conditional — pipelines, the PAB
    program, and the batched harness all route through it."""
    sampler = get_sampler(name)
    if cfg is None:
        return sampler.make_tables(num_steps)
    return sampler.make_tables(num_steps, cfg)


__all__ = [
    "ddim", "euler", "dpm", "edm", "dpm_edm", "unipc", "get_sampler",
    "is_multistep", "make_tables_for", "ScheduleConfig",
]
