"""Sharded diffusion training step.

The reference never trains (inference-only harness), but a production
framework must: this is the eps-prediction DDPM objective over the motion
UNet, jitted over the (data, frames, tensor) mesh with optax. Used by the
driver's multi-chip dry run and as the framework's fine-tuning entry point.

Production levers (all composable, all exercised by tests/test_training.py):

  * ``make_optimizer`` — global-norm clipping + adamw + linear-warmup/cosine
    decay, the standard diffusion fine-tuning recipe.
  * ``remat=True`` — ``jax.checkpoint`` around the denoiser forward: trades
    ~1/3 more FLOPs for activation memory that no longer scales with UNet
    depth (the lever that fits 1.3B-param training on one chip's HBM).
  * ``grad_accum=k`` — k sequential micro-batches per step under
    ``lax.scan``, averaged grads: k-times larger effective batch at constant
    activation memory.
  * ``ema_decay`` — exponential moving average of params carried in the
    TrainState; sampling from the EMA weights is the standard diffusion
    eval/serving practice.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from vdx.schedulers.common import ScheduleConfig, make_alphas_cumprod


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray
    ema_params: Optional[dict] = None  # present iff ema_decay was set


def make_optimizer(
    learning_rate: float = 1e-4,
    *,
    warmup_steps: int = 0,
    total_steps: int = 0,
    clip_norm: float = 1.0,
    weight_decay: float = 1e-2,
    b1: float = 0.9,
    b2: float = 0.999,
) -> optax.GradientTransformation:
    """Clip-by-global-norm -> adamw, with linear warmup + cosine decay when
    ``total_steps`` > 0 (constant LR otherwise)."""
    if total_steps > 0:
        lr = optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=learning_rate,
            warmup_steps=max(warmup_steps, 1),
            decay_steps=total_steps,
        )
    elif warmup_steps > 0:
        lr = optax.linear_schedule(0.0, learning_rate, warmup_steps)
    else:
        lr = learning_rate
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(lr, b1=b1, b2=b2, weight_decay=weight_decay),
    )


def make_train_step(model, optimizer, schedule: ScheduleConfig = ScheduleConfig(),
                    with_grad_stats: bool = False, remat: bool = False,
                    grad_accum: int = 1, ema_decay: Optional[float] = None):
    """Returns train_step(state, batch, rng) -> (state, metrics).

    batch: {"latents": [B, F, h, w, C] clean latents,
            "context": [B, S, D] text conditioning}
    with_grad_stats=True adds metrics["grad_absmax"], a pytree of per-leaf
    |grad| maxima — dead-parameter / divergence diagnostics (and it lets the
    training tests assert gradient flow without compiling a second program).
    remat=True rematerialises the denoiser forward in the backward pass.
    grad_accum=k splits B into k micro-batches scanned sequentially (B % k
    == 0), averaging grads — constant activation memory.
    ema_decay=d maintains state.ema_params (requires a TrainState whose
    ema_params is non-None, see init_train_state).
    """
    acp = jnp.asarray(make_alphas_cumprod(schedule))
    T = schedule.num_train_timesteps

    apply = model.apply
    if remat:
        apply = jax.checkpoint(apply)

    def draw(rng, latents):
        """(noisy, t, noise) for the FULL batch — drawn once per step so
        grad_accum changes memory, never the realised sample: the
        accumulated gradient equals the full-batch gradient exactly
        (tests/test_training.py pins this)."""
        B = latents.shape[0]
        rt, rn = jax.random.split(rng)
        t = jax.random.randint(rt, (B,), 0, T)
        noise = jax.random.normal(rn, latents.shape, dtype=latents.dtype)
        a = acp[t][:, None, None, None, None]
        noisy = jnp.sqrt(a) * latents + jnp.sqrt(1.0 - a) * noise
        return noisy, t, noise

    def micro_loss(params, noisy, t, noise, context):
        pred = apply(params, noisy, t, context)
        return jnp.mean(
            (pred.astype(jnp.float32) - noise.astype(jnp.float32)) ** 2
        )

    grad_fn = jax.value_and_grad(micro_loss)

    def accum_grads(params, noisy, t, noise, context):
        B = noisy.shape[0]
        assert B % grad_accum == 0, (
            f"batch {B} must divide into grad_accum={grad_accum} micro-batches"
        )
        m = B // grad_accum
        split = lambda x: x.reshape((grad_accum, m) + x.shape[1:])  # noqa: E731

        def body(carry, mb):
            loss_sum, grads_sum = carry
            loss, grads = grad_fn(params, *mb)
            return (
                loss_sum + loss,
                jax.tree.map(jnp.add, grads_sum, grads),
            ), None

        zeros = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), params)
        (loss_sum, grads_sum), _ = jax.lax.scan(
            body, (jnp.zeros((), jnp.float32), zeros),
            (split(noisy), split(t), split(noise), split(context)),
        )
        k = jnp.float32(grad_accum)
        # accumulate fp32, hand back param-dtype grads — same dtypes as the
        # grad_accum=1 path, so optimizer state never silently upcasts (and
        # the jitted step doesn't recompile between step 1 and step 2)
        return loss_sum / k, jax.tree.map(
            lambda g, p: (g / k).astype(p.dtype), grads_sum, params
        )

    def train_step(state: TrainState, batch, rng):
        noisy, t, noise = draw(rng, batch["latents"])
        if grad_accum > 1:
            loss, grads = accum_grads(
                state.params, noisy, t, noise, batch["context"]
            )
        else:
            loss, grads = grad_fn(
                state.params, noisy, t, noise, batch["context"]
            )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema_decay is not None:
            assert ema is not None, (
                "ema_decay set but state.ema_params is None — build the "
                "state with init_train_state(..., ema=True)"
            )
            d = jnp.asarray(ema_decay, jnp.float32)
            ema = jax.tree.map(
                lambda e, p: (d * e.astype(jnp.float32)
                              + (1.0 - d) * p.astype(jnp.float32)).astype(e.dtype),
                ema, params,
            )
        metrics = {"loss": loss}
        if with_grad_stats:
            metrics["grad_absmax"] = jax.tree.map(
                lambda g: jnp.max(jnp.abs(g)), grads
            )
        return TrainState(params, opt_state, state.step + 1, ema), metrics

    return train_step


def make_lora_train_step(model, optimizer,
                         schedule: ScheduleConfig = ScheduleConfig(),
                         remat: bool = False):
    """LoRA fine-tuning step: optimize ONLY the adapter, base frozen.

    Returns ``step(state, batch, rng, base_params) -> (state, metrics)``
    where ``state.params`` is the flat adapter tree from
    ``core.lora.init_lora`` and ``base_params`` is the frozen denoiser
    tree, passed as a runtime argument (never baked into the executable,
    never touched by AD — gradients flow to the adapter through the
    ``merge_lora`` reparameterisation only). Same eps-prediction DDPM
    objective as ``make_train_step``; optimizer state spans just the
    adapter (~0.1% of the params), which is LoRA's memory story.
    """
    from vdx.core.lora import merge_lora

    acp = jnp.asarray(make_alphas_cumprod(schedule))
    T = schedule.num_train_timesteps
    apply = jax.checkpoint(model.apply) if remat else model.apply

    def step(state: TrainState, batch, rng, base_params):
        latents = batch["latents"]
        rt, rn = jax.random.split(rng)
        t = jax.random.randint(rt, (latents.shape[0],), 0, T)
        noise = jax.random.normal(rn, latents.shape, dtype=latents.dtype)
        a = acp[t][:, None, None, None, None]
        noisy = jnp.sqrt(a) * latents + jnp.sqrt(1.0 - a) * noise

        def loss_fn(lora):
            merged = merge_lora(base_params, lora, 1.0)
            pred = apply(merged, noisy, t, batch["context"])
            return jnp.mean(
                (pred.astype(jnp.float32) - noise.astype(jnp.float32)) ** 2
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        lora = optax.apply_updates(state.params, updates)
        return (
            TrainState(lora, opt_state, state.step + 1, state.ema_params),
            {"loss": loss},
        )

    return step


def init_train_state(model, params, learning_rate: float = 1e-4,
                     optimizer: Optional[optax.GradientTransformation] = None,
                     ema: bool = False):
    """Build (TrainState, optimizer). Pass a ``make_optimizer(...)`` result
    for the production recipe; the default stays plain adamw for
    back-compat. ``ema=True`` seeds the EMA tree with a copy of params."""
    del model  # kept for signature stability
    if optimizer is None:
        optimizer = optax.adamw(learning_rate)
    ema_params = jax.tree.map(jnp.array, params) if ema else None
    return (
        TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32),
                   ema_params),
        optimizer,
    )
