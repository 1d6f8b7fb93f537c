"""Sharded diffusion training step.

The reference never trains (inference-only harness), but a production
framework must: this is the eps-prediction DDPM objective over the motion
UNet, jitted over the (data, frames, tensor) mesh with optax. Used by the
driver's multi-chip dry run and as the framework's fine-tuning entry point.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from vdx.schedulers.common import ScheduleConfig, make_alphas_cumprod


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def make_train_step(model, optimizer, schedule: ScheduleConfig = ScheduleConfig(),
                    with_grad_stats: bool = False):
    """Returns train_step(state, batch, rng) -> (state, metrics).

    batch: {"latents": [B, F, h, w, C] clean latents,
            "context": [B, S, D] text conditioning}
    with_grad_stats=True adds metrics["grad_absmax"], a pytree of per-leaf
    |grad| maxima — dead-parameter / divergence diagnostics (and it lets the
    training tests assert gradient flow without compiling a second program).
    """
    acp = jnp.asarray(make_alphas_cumprod(schedule))
    T = schedule.num_train_timesteps

    def loss_fn(params, latents, context, rng):
        B = latents.shape[0]
        rt, rn = jax.random.split(rng)
        t = jax.random.randint(rt, (B,), 0, T)
        noise = jax.random.normal(rn, latents.shape, dtype=latents.dtype)
        a = acp[t][:, None, None, None, None]
        noisy = jnp.sqrt(a) * latents + jnp.sqrt(1.0 - a) * noise
        pred = model.apply(params, noisy, t, context)
        loss = jnp.mean((pred.astype(jnp.float32) - noise.astype(jnp.float32)) ** 2)
        return loss

    def train_step(state: TrainState, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, batch["latents"], batch["context"], rng
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss}
        if with_grad_stats:
            metrics["grad_absmax"] = jax.tree.map(
                lambda g: jnp.max(jnp.abs(g)), grads
            )
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


def init_train_state(model, params, learning_rate: float = 1e-4):
    optimizer = optax.adamw(learning_rate)
    return (
        TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32)),
        optimizer,
    )
