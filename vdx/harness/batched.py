"""Batched / sharded experiment execution — the #1 TPU win.

The reference runs its 78 experiments strictly serially on one GPU
(reference experiments/05_grid_search_ablation.py:316-334, ~2-3 h). The
grid is embarrassingly parallel (SURVEY.md §3.2): experiments differing only
in (prompt, CFG, seed) share one compiled program, so we stack them on the
batch axis — one jitted denoise executes N experiments at once — and shard
that axis over the ``data`` dimension of a device mesh for multi-chip.

Grouping key = (num_inference_steps, num_frames, H, W): members of a group
run in a single program; different step counts compile separately (static
scan length).
"""

from __future__ import annotations

import itertools
from pathlib import Path
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vdx.core.rng import as_key
from vdx.harness.config import ExperimentConfig
from vdx.io.frames import export_to_gif, save_frames
from vdx.schedulers import get_sampler, is_multistep, make_tables_for
from vdx.schedulers.common import cfg_combine


def group_configs(configs: Sequence[ExperimentConfig]):
    keyf = lambda c: (c.num_inference_steps, c.num_frames, c.height, c.width)  # noqa: E731
    ordered = sorted(configs, key=keyf)
    return [(k, list(g)) for k, g in itertools.groupby(ordered, key=keyf)]


def _batched_denoise_fn(pipe, num_steps: int, latent_shape, scheduler: str):
    """One program: N experiments, CFG batched inside, vmapped over N."""
    if getattr(pipe, "pab", None) is not None or getattr(pipe, "skip", None) is not None:
        raise ValueError(
            "the batched runner compiles its own denoise program and does "
            "not implement the turbo modes — use a plain pipeline for "
            "batched grids/serving (pab/skip are per-pipeline features)"
        )
    sampler = get_sampler(scheduler)
    # honor the pipeline's checkpoint-faithful sampling constants
    # (prediction type / beta schedule / SNR shift), exactly like the
    # pipeline's own compiled core
    _cfg = pipe._sampler_cfg(scheduler)
    step_kw = {} if _cfg is None else {"cfg": _cfg}
    tables = make_tables_for(scheduler, num_steps, _cfg)
    unet = pipe.unet
    is_dpm = is_multistep(scheduler)
    rescale = getattr(pipe, "guidance_rescale", 0.0)

    def one(unet_params, key, context, guidance_scale):
        # context: [2, S, D] (uncond, cond); latent_shape leads with 1
        latents = (
            jax.random.normal(key, latent_shape, jnp.float32)
            * tables.init_noise_sigma
        )

        def body(carry, i):
            lat = carry[0] if is_dpm else carry
            t = tables.timesteps[i]
            model_in = jnp.concatenate([lat, lat], axis=0)
            model_in = sampler.scale_model_input(model_in, i, tables)
            t_b = jnp.broadcast_to(t, (2,))
            eps = unet.apply(unet_params, model_in, t_b, context)
            u, c = jnp.split(eps, 2, axis=0)
            eps = cfg_combine(u, c, guidance_scale, rescale)
            if is_dpm:
                lat, x0 = sampler.step_multistep(
                    lat, eps, i, carry[1], tables, **step_kw
                )
                return (lat, x0), None
            return sampler.step(lat, eps, i, tables, **step_kw), None

        init = ((latents, sampler.init_state(latents))
                if is_dpm else latents)
        out, _ = jax.lax.scan(body, init, jnp.arange(num_steps))
        return out[0] if is_dpm else out

    batched = jax.vmap(one, in_axes=(None, 0, 0, 0))
    return jax.jit(batched)


def run_batched_experiments(
    pipe,
    configs: Sequence[ExperimentConfig],
    output_dir: Path,
    scheduler: str = "ddim",
    mesh=None,
    max_batch: int = 8,
    decode_chunk: int = 4,
    log=print,
) -> List[ExperimentConfig]:
    """Run experiments in stacked batches; same artifact contract + resume."""
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    todo = [
        c for c in configs
        if not (output_dir / c.experiment_id / "config.json").exists()
    ]
    done = [c for c in configs if c not in todo]
    for c in done:
        log(f"  Skipping {c.experiment_id} (already exists)")

    pending = None  # (device frames [N,F,H,W,3], cfgs) awaiting readback+save

    def _flush(p):
        frames_np = np.asarray(p[0])  # rides under the NEXT batch's denoise
        from PIL import Image

        for arr, cfg in zip(frames_np, p[1]):
            pil = [Image.fromarray(f) for f in arr]
            exp_dir = output_dir / cfg.experiment_id
            save_frames(pil, exp_dir / "frames")
            export_to_gif(pil, exp_dir / f"{cfg.experiment_id}.gif")
            cfg.save(exp_dir / "config.json")

    for (steps, F, H, W), group in group_configs(todo):
        ds = pipe.vae.config.downscale
        latent_shape = (1, F, H // ds, W // ds, pipe.unet.config.in_channels)
        denoise = _batched_denoise_fn(pipe, steps, latent_shape, scheduler)

        for start in range(0, len(group), max_batch):
            chunk_cfgs = group[start : start + max_batch]
            n = len(chunk_cfgs)
            log(f"  Batch of {n} experiments @ steps={steps} {H}x{W}x{F}")

            contexts = jnp.stack(
                [pipe.encode_prompt(c.prompt, c.negative_prompt) for c in chunk_cfgs]
            )  # [N, 2, S, D]
            keys = jnp.stack([as_key(c.seed) for c in chunk_cfgs])
            scales = jnp.asarray([c.guidance_scale for c in chunk_cfgs], jnp.float32)

            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                sh = NamedSharding(mesh, P("data"))
                contexts = jax.device_put(contexts, sh)
                keys = jax.device_put(keys, sh)
                scales = jax.device_put(scales, sh)

            latents = denoise(pipe.params["unet"], keys, contexts, scales)

            dchunk = max(1, min(decode_chunk, F))
            while F % dchunk:
                dchunk -= 1
            decode = pipe._get_decode(dchunk)
            # ONE batched decode for the whole chunk (like serving's
            # _run_batch), left on device; the PREVIOUS batch's readback +
            # PNG/GIF encode then runs while this batch executes.
            frames_dev = decode(pipe.params, latents[:, 0])
            if pending is not None:
                _flush(pending)
            pending = (frames_dev, chunk_cfgs)

    if pending is not None:
        _flush(pending)
    return list(configs)
