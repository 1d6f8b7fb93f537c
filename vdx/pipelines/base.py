"""Video diffusion pipeline base — jit-compiled end to end.

The TPU-native rebuild of the pipeline object family the reference drives
through diffusers (call sites: reference experiments/01_baseline_generation.py:100-105,
05_grid_search_ablation.py:158-167). ONE base class hosts the compiled
machinery for EVERY family — AnimateDiff / ModelScope UNet3D / Latte DiT
subclass it directly; SVD img2vid and CogVideoX plug into the same core
through four small hooks (conditioning prep, denoiser args, latent
channels, decode). Call surface:

    pipe(prompt, negative_prompt=..., num_frames=16, guidance_scale=7.5,
         num_inference_steps=25, height=512, width=512, seed=42)
    -> output.frames[0]  (list of PIL images)

TPU-first differences from the reference's torch path (SURVEY.md §2b):
  * CFG is batched: cond+uncond run as ONE UNet forward per step
    (batch axis 2B), not two sequential forwards.
  * The whole denoise loop is a single ``jax.lax.scan`` under ``jit`` —
    zero host round-trips between steps.
  * VAE decode is frame-tiled inside XLA (``decode_frames_tiled``) instead
    of eager ``enable_vae_slicing``.
  * fp32 guidance/scheduler math around a bf16 UNet (core/dtypes policy).
  * Scheduler tables are runtime arguments (cached device-side per
    (scheduler, steps)), so re-tracing never re-uploads them.

Compiled executables are cached per (shape, steps, sampler) signature.
The machinery every family inherits from this core:
  * single-program generate (noise -> denoise scan -> decode -> uint8)
  * ``variable_steps=N`` — ONE step-count-agnostic program per sweep
  * ``frame_shards=n`` — frame-axis sequence parallelism over a mesh
  * PAB turbo mode (denoiser-permitting)
  * skip turbo mode (adaptive whole-step model-output reuse; eval count
    reported device-side via ``PipelineOutput.n_evals``)
  * multi-video batching: ``pipe([p1, p2], seed=[s1, s2])`` runs N videos
    in one program, each bit-identical to its single call
  * optional per-step progress callback (``jax.debug.callback``, off by
    default — zero-cost when unset; auto-disabled with a warning on
    backends without host-callback support, e.g. the axon tunnel PJRT —
    core/compat.host_callbacks_supported)
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from vdx.core.dtypes import DEFAULT_POLICY, Policy
from vdx.core.rng import as_key
from vdx.models.clip_text import CLIPTextConfig, CLIPTextModel
from vdx.models.tokenizer import load_tokenizer
from vdx.models.unet_motion import UNetMotion, UNetMotionConfig
from vdx.models.vae import AutoencoderKL, VAEConfig
from vdx.pipelines.context import (
    ContextConfig, make_freenoise_maker, make_windowed_apply,
)
from vdx.schedulers import get_sampler, make_tables_for
from vdx.schedulers import is_multistep as schedulers_is_multistep
from vdx.schedulers.common import cfg_combine, pad_tables


@dataclasses.dataclass(frozen=True)
class PABConfig:
    """Pyramid Attention Broadcast schedule (training-free turbo mode).

    Attention outputs drift slowly across adjacent denoise steps; broadcast
    (reuse) each attention type's output between refreshes — cross-attention
    drifts slowest, spatial fastest (the "pyramid"). Always refresh during
    the first/last steps where the trajectory moves quickly.
    """

    spatial_interval: int = 2
    temporal_interval: int = 4
    cross_interval: int = 6
    #: joint text+video attention (CogVideoX-class DiTs) — those models have
    #: ONE attention type, so this is their only broadcast site
    joint_interval: int = 2
    warmup_steps: int = 2
    cooldown_steps: int = 2


@dataclasses.dataclass(frozen=True)
class SkipConfig:
    """Adaptive whole-step model-output reuse (TeaCache-class turbo mode).

    The denoiser's output drifts slowly over stretches of the trajectory;
    instead of re-evaluating the 1.3B-param model every step, accumulate the
    relative L1 change of the (sampler-scaled) latents between steps and only
    re-evaluate once the accumulated change crosses ``threshold`` — otherwise
    reuse the previous model output. Unlike PAB's fixed broadcast intervals,
    the skip pattern is *input-adaptive*: fast-moving trajectories re-evaluate
    more. Runs INSIDE the denoise scan via ``lax.cond`` (a skipped step never
    executes the model branch), so the one-program invariant holds.

    ``threshold=0`` forces an eval every step (bit-exact vs the plain
    program — tested). Warm-up/cool-down steps always evaluate: the
    trajectory moves fastest at both ends of the schedule.
    """

    #: accumulated relative-L1 latent change that triggers a re-eval
    threshold: float = 0.08
    warmup_steps: int = 3
    cooldown_steps: int = 3

    def __post_init__(self):
        # step 0 has no previous output to reuse — it must evaluate
        if self.warmup_steps < 1:
            raise ValueError("skip turbo mode needs warmup_steps >= 1")
        if self.threshold < 0:
            raise ValueError("threshold must be >= 0")


@dataclasses.dataclass
class PipelineOutput:
    """``frames[i]`` is the list of PIL frames (or the uint8 array) for the
    i-th video — the exact access pattern of the reference (01:108, 05:169)."""

    frames: List[Any]
    latents: Optional[jnp.ndarray] = None
    #: skip turbo mode only: number of real model evaluations the adaptive
    #: scan performed (device-computed int32 scalar — works on backends
    #: with no host-callback support, unlike the progress counter)
    n_evals: Optional[jnp.ndarray] = None


class VideoDiffusionPipeline:
    """Base: compiled denoise/decode machinery around a pluggable denoiser."""

    denoiser_cls = UNetMotion
    denoiser_config_cls = UNetMotionConfig
    #: key of the denoiser's param subtree in ``self.params``
    denoiser_param_key = "unet"
    #: number of conditioning tensors the denoiser takes after (sample, t)
    n_denoiser_cond = 1
    #: build the CFG pair regardless of guidance_scale (SVD's per-frame scale)
    guidance_always = False
    #: whether the denoiser supports frame sharding (``temporal_impl`` knob)
    supports_frame_shards = True
    #: whether the denoiser's frame axis can be sliced into context windows
    #: (False for token-packed DiTs whose conditioning is frame-entangled)
    supports_context = True

    def __init__(
        self,
        unet_config=None,
        vae_config: VAEConfig = VAEConfig(),
        text_config: CLIPTextConfig = CLIPTextConfig(),
        params: Optional[dict] = None,
        tokenizer=None,
        policy: Policy = DEFAULT_POLICY,
        scheduler: str = "euler",
        attn_impl: str = "auto",
        pab: "PABConfig | None" = None,
        skip: "SkipConfig | None" = None,
        context: "ContextConfig | None" = None,
        frame_shards: int = 1,
        seq_impl: str = "ulysses",
        mesh=None,
        variable_steps: int = 0,
        progress: Optional[Callable[[int, int], None]] = None,
        guidance_rescale: float = 0.0,
        sampler_configs=None,
        freeu=None,
    ):
        unet_config = unet_config or self.denoiser_config_cls()
        unet_kwargs = dict(policy=policy, attn_impl=attn_impl)
        if pab is not None:
            unet_kwargs["pab"] = True  # denoiser must support the pab flag
        if freeu is not None:
            # FreeU (nn/freeu.py): skip-connection UNets only — DiT
            # denoisers have no backbone/skip split to re-weight.
            if not hasattr(self.denoiser_cls, "freeu"):
                raise ValueError(
                    f"{self.denoiser_cls.__name__} has no skip-connection "
                    "up path — FreeU does not apply"
                )
            unet_kwargs["freeu"] = freeu
        self.unet = self.denoiser_cls(unet_config, **unet_kwargs)
        self.vae = AutoencoderKL(vae_config, policy=policy)
        self.text_encoder = CLIPTextModel(text_config, policy=policy)
        self.tokenizer = tokenizer or load_tokenizer()
        self.params = params
        self._init_core(
            unet_config, policy=policy, scheduler=scheduler,
            attn_impl=attn_impl, pab=pab, skip=skip, context=context,
            frame_shards=frame_shards,
            seq_impl=seq_impl, mesh=mesh, variable_steps=variable_steps,
            progress=progress, guidance_rescale=guidance_rescale,
            sampler_configs=sampler_configs, freeu=freeu,
        )

    def _init_core(self, denoiser_config, *, policy, scheduler, attn_impl,
                   pab, frame_shards, mesh, variable_steps, progress,
                   seq_impl="ulysses", skip=None, context=None,
                   guidance_rescale=0.0, sampler_configs=None, freeu=None):
        """Shared compiled-machinery state — called by every family's
        ``__init__`` after it builds its components."""
        self.policy = policy
        self.scheduler = scheduler
        # Checkpoint-faithful sampling constants: sampler name -> that
        # sampler's frozen config dataclass (e.g. "ddim" -> DDIMConfig with
        # v_prediction + SNR shift for CogVideoX). None entries / missing
        # names use the sampler module's defaults (the SD-1.5 reference
        # semantics). Frozen dataclasses hash, so they key program caches.
        self.sampler_configs = dict(sampler_configs or {})
        self.pab = pab
        if pab is not None and skip is not None:
            raise ValueError(
                "pab and skip are both turbo modes with their own denoise "
                "programs — pick one"
            )
        self.skip = skip
        # Temporal context windows (long-clip generation): each denoiser
        # evaluation runs per overlapping fixed-length frame window and
        # blends (pipelines/context.py). Applies only when a request's
        # num_frames exceeds the window; shorter clips run the exact
        # context-free program.
        self.context = context
        if context is not None:
            if not self.supports_context:
                raise ValueError(
                    f"{type(self).__name__} denoiser packs frames into "
                    "tokens — temporal context windows do not apply"
                )
            if pab is not None:
                raise ValueError(
                    "context windows and PAB are incompatible: PAB's "
                    "attention caches are sized per model call, and each "
                    "window would clobber the previous window's cache"
                )
            # context + frame_shards>1 = WINDOW parallelism (below): the
            # per-step windows are independent denoiser evaluations, so
            # they shard over the mesh instead of the frame axis — the
            # multi-chip long-clip mode for clips past the trained span
            # (plain frame sharding would run the motion PE outside its
            # trained context; docs/05).
        # CFG std-rescale (Lin et al. overexposure fix) — a deployment-level
        # constant baked into the denoise program (schedulers.common.
        # cfg_combine); 0.0 = plain CFG, the reference's behaviour
        self.guidance_rescale = float(guidance_rescale)
        # variable_steps=N > 0: compile ONE step-count-agnostic generate
        # program (padded tables + lax.cond-skipped steps, max N steps)
        # instead of one program per step count — the right mode for
        # step-count sweeps (grid search) and mixed-step serving.
        self.variable_steps = variable_steps
        self._compiled = {}
        #: component -> {adapter, pristine leaves, treedef, scale}
        self._lora_active = {}
        # Per-step progress callback (i, n) — wired through
        # jax.debug.callback so the one-program invariant holds (SURVEY §7e).
        # None => the callback is not traced into the program at all.
        self.progress_callback = progress
        # Frame-axis sequence parallelism on the pipeline surface: the
        # denoise scan and VAE decode run frame-sharded over an n-device
        # mesh (Ulysses all_to_all temporal blocks by default, or ring
        # attention via seq_impl="ring"; spatial/cross ops shard-local).
        # Same params as local execution — the long-clip north star
        # (SURVEY.md §5; capability analogue of the reference's memory
        # scaling knobs, 01:85, 05:143-144).
        self.frame_shards = frame_shards
        self.mesh = None
        self._sharded_unet_apply = None
        self._ring_model = None
        #: context + frame_shards>1: WINDOW parallelism — each device
        #: evaluates a subset of the per-step context windows on replicated
        #: latents and the blend is a weighted psum (the denoiser itself
        #: stays local; windows are independent evaluations). Requests at
        #: or below the window length fall through to the local program.
        self._window_parallel = False
        if frame_shards > 1:
            if not self.supports_frame_shards:
                raise ValueError(
                    f"{type(self).__name__} denoiser has no frame-sharded "
                    "(ring) execution mode"
                )
            from vdx.parallel.mesh import make_mesh

            self.mesh = mesh if mesh is not None else make_mesh(1, frame_shards, 1)
            if context is not None:
                self._window_parallel = True
            else:
                from vdx.parallel.frame_parallel import (
                    make_frame_sharded_denoiser,
                )

                self._ring_model, self._sharded_unet_apply = make_frame_sharded_denoiser(
                    self.denoiser_cls, denoiser_config, self.mesh,
                    policy=policy, attn_impl=attn_impl,
                    n_conditioning=self.n_denoiser_cond, pab=pab is not None,
                    seq_impl=seq_impl, freeu=freeu,
                )

    # ------------------------------------------------------------------
    # Family hooks — override points for SVD / CogVideoX / future families
    # ------------------------------------------------------------------
    @property
    def latent_channels(self) -> int:
        """Channels of the DENOISED latent (may differ from the denoiser's
        input channels when conditioning is channel-concatenated)."""
        return self.unet.config.in_channels

    def _prepare_cond(self, params, key, cond, latent_shape) -> dict:
        """Turn the raw conditioning pytree into denoiser arguments — runs
        INSIDE the compiled program (so image towers / VAE-encodes / RNG
        all fuse into the one dispatch). Returns
          den_args: tuple of conditioning tensors after (sample, t)
          concat:   optional [2B or B, F, h, w, Cc] tensor channel-concat'd
                    to the model input AFTER scale_model_input
          key:      the PRNG key to draw the initial noise from
        Default (text-to-video): ``cond`` is already the encoded context.
        """
        del params, latent_shape
        return {"den_args": (cond,), "concat": None, "key": key}

    def _decode_raw(self, chunk: int, **opts):
        """Raw (untraced) latents->uint8 decoder: [B, F, h, w, C] ->
        [B, F, H, W, 3]. Families with non-standard VAEs override this."""
        assert not opts, f"unknown decode opts: {opts}"
        vae = self.vae

        def decode(params, latents):
            B, F = latents.shape[:2]
            z = latents.reshape(B * F // chunk, chunk, *latents.shape[2:])
            imgs = jax.lax.map(
                lambda c: vae.apply(params["vae"], c, method=vae.decode), z
            )
            imgs = imgs.reshape(B, F, *imgs.shape[2:])
            return _to_uint8(imgs)

        return decode

    def _encode_raw(self, chunk: int):
        """Raw (untraced) pixels->latents encoder: [B, F, H, W, 3] in
        [-1, 1] -> [B, F, h, w, C]. Frame-chunked like ``_decode_raw``
        (posterior MEAN, scaled — deterministic, so video2video stays
        bit-reproducible per seed)."""
        vae = self.vae

        def encode(params, video):
            B, F = video.shape[:2]
            x = video.reshape(B * F // chunk, chunk, *video.shape[2:])
            z = jax.lax.map(
                lambda c: vae.apply(params["vae"], c, method=vae.encode), x
            )
            return z.reshape(B, F, *z.shape[2:])

        return encode

    def _encode_composable(self, chunk: int):
        """The encode stage, shard_map-wrapped under frame sharding
        (encode is frame-local, mirroring ``_decode_composable``)."""
        encode = self._encode_raw(chunk)
        if self.mesh is not None:
            import functools as _ft

            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            encode = _ft.partial(
                shard_map, mesh=self.mesh, in_specs=(P(), P(None, "frames")),
                out_specs=P(None, "frames"), check_vma=False,
            )(encode)
        return encode

    # ------------------------------------------------------------------
    # Parameter initialisation / loading
    # ------------------------------------------------------------------
    @classmethod
    def with_random_params(cls, seed: int = 0, **kwargs) -> "VideoDiffusionPipeline":
        """Seeded random weights — for benchmarking and offline testing.

        (The zero-egress build environment has no model hub; real SD-1.5 /
        motion-adapter checkpoints load through core.convert when present.)
        """
        pipe = cls(**kwargs)
        pipe.params = pipe.init_params(seed)
        return pipe

    def save_checkpoint(self, path) -> None:
        """Persist all component params via Orbax (core/checkpoint.py)."""
        from vdx.core.checkpoint import save_params

        save_params(self.params, path)

    def load_checkpoint(self, path) -> None:
        from vdx.core.checkpoint import load_params

        template = self.params if self.params is not None else self.init_params()
        self.params = load_params(path, template=template)

    # ------------------------------------------------------------------
    # LoRA adapters (capability analogue of diffusers' load_lora_weights)
    # ------------------------------------------------------------------
    def load_lora(self, source, scale: float = 1.0, component: str = None,
                  targets=None, strict: bool = True) -> Optional[dict]:
        """Attach a LoRA adapter to one component (default: the denoiser).

        source: a ``.safetensors`` path, a torch LoRA state dict
        (peft / old-diffusers-processor / kohya key formats), or an
        adapter tree from ``core.lora.init_lora`` / a LoRA fine-tune.

        Weight-space semantics (core/lora.py): the adapted kernels become
        ``W + scale * (a @ b)`` in ONE jitted device program — no compiled
        pipeline program is invalidated (params are runtime arguments) and
        the per-step cost is exactly zero. Loading REPLACES any adapter
        already active on the component; pristine weights are stashed so
        ``unload_lora`` / ``set_lora_scale`` are exact (bit-identical
        restore). Returns the conversion report for torch sources.
        """
        from vdx.core import lora as L

        component = component or self.denoiser_param_key
        targets = tuple(targets or L.DEFAULT_TARGETS)
        report = None
        if not isinstance(source, dict) or L.is_lora_state_dict(source):
            if not isinstance(source, dict):
                from vdx.core.convert import load_safetensors

                source = load_safetensors(source)
            rules, _ = self._conversion_rules()[component]
            source, report = L.convert_lora_checkpoint(
                source, self.params[component], rules,
                targets=targets, strict=strict,
            )
        base = self._lora_restore(component)  # drop any active adapter
        leaves, treedef = jax.tree_util.tree_flatten(base)
        idx = L._leaf_paths(base)
        self._lora_active[component] = {
            "adapter": source,
            "pristine": {p: leaves[i] for p, i in idx.items() if p in source},
            "treedef": treedef,
            "scale": float(scale),
        }
        self._lora_merge(component, base)
        return report

    def set_lora_scale(self, scale: float, component: str = None) -> None:
        """Re-merge the active adapter at a new scale (from pristine —
        scales never accumulate rounding)."""
        component = component or self.denoiser_param_key
        if component not in self._lora_active:
            raise ValueError(f"no LoRA active on {component!r}")
        self._lora_active[component]["scale"] = float(scale)
        self._lora_merge(component, self._lora_restore(component))

    def unload_lora(self, component: str = None) -> None:
        """Detach the adapter, restoring the pristine weights bit-exactly."""
        component = component or self.denoiser_param_key
        if component not in self._lora_active:
            raise ValueError(f"no LoRA active on {component!r}")
        base = self._lora_restore(component)
        del self._lora_active[component]
        params = dict(self.params)
        params[component] = base
        self.params = params

    def _lora_restore(self, component: str):
        """Component tree with pristine leaves back in place (host-side
        reference surgery — no device work)."""
        from vdx.core.lora import _leaf_paths

        tree = self.params[component]
        state = self._lora_active.get(component)
        if state is None:
            return tree
        leaves = list(jax.tree_util.tree_flatten(tree)[0])
        for p, i in _leaf_paths(tree).items():
            if p in state["pristine"]:
                leaves[i] = state["pristine"][p]
        return jax.tree_util.tree_unflatten(state["treedef"], leaves)

    def _lora_merge(self, component: str, base) -> None:
        from vdx.core.lora import merge_lora

        state = self._lora_active[component]
        key = ("lora_merge", component)
        if key not in self._compiled:
            self._compiled[key] = jax.jit(merge_lora)
        merged = self._compiled[key](
            base, state["adapter"], jnp.float32(state["scale"])
        )
        params = dict(self.params)
        params[component] = merged
        self.params = params

    # ------------------------------------------------------------------
    # Torch-checkpoint conversion (the from_pretrained surface)
    # ------------------------------------------------------------------
    def _denoiser_rules(self):
        """Torch->flax mapping rules for this family's denoiser."""
        from vdx.core.convert import unet_motion_rules

        return unet_motion_rules(self.unet.config)

    def _conversion_rules(self) -> dict:
        """{component: (rules, allowed_missing substrings)} consumed by
        ``load_pretrained``. Components mirror ``_init_calls``; families
        with non-standard towers override."""
        from vdx.core import convert as C

        return {
            "unet": (self._denoiser_rules(), ()),
            "vae": (C.vae_rules(self.vae.config), ()),
            "text": (C.clip_text_rules(self.text_encoder.config), ()),
        }

    def load_pretrained(self, sources: dict, strict: bool = True) -> dict:
        """Fill ``self.params`` from torch ``.safetensors`` checkpoints.

        sources: {component: path | [paths]} — multiple paths for one
        component merge into a single state dict (the hub ships
        AnimateDiff as a separate SD-1.5 UNet + motion adapter; reference
        experiments/01_baseline_generation.py:55-73). Values may also be
        pre-loaded {torch_key: array} dicts.

        strict=True requires every component present and every param leaf
        covered (modulo the family's documented unconvertible leaves);
        strict=False leaves unsupplied components / uncovered leaves at
        their current values. Returns {component: conversion report}.
        The conversion rules themselves are coverage- and torch-numerics-
        tested (tests/test_convert.py, tests/test_torch_parity.py).
        """
        from vdx.core.convert import convert_checkpoint, load_safetensors

        specs = self._conversion_rules()
        unknown = sorted(set(sources) - set(specs))
        if unknown:
            raise ValueError(
                f"unknown components {unknown}; "
                f"{type(self).__name__} takes {sorted(specs)}"
            )
        if strict:
            absent = sorted(set(specs) - set(sources))
            if absent:
                raise ValueError(
                    f"missing components {absent} "
                    "(pass strict=False to keep init values for them)"
                )
        if self.params is None:
            self.params = self.init_params()
        params = dict(self.params)
        reports = {}
        for comp, paths in sources.items():
            rules, allowed_missing = specs[comp]
            if isinstance(paths, (str,)) or hasattr(paths, "__fspath__") or (
                isinstance(paths, dict)
            ):
                paths = [paths]
            sd: dict = {}
            for p in paths:
                part = p if isinstance(p, dict) else load_safetensors(p)
                overlap = set(sd) & set(part)
                if overlap:
                    raise ValueError(
                        f"{comp}: overlapping checkpoint keys "
                        f"{sorted(overlap)[:5]}"
                    )
                sd.update(part)
            converted, report = convert_checkpoint(
                sd, params[comp], rules, strict=False
            )
            hard = [
                m for m in report["missing"]
                if not any(a in m for a in allowed_missing)
            ]
            if strict and (hard or report["shape_errors"]):
                raise ValueError(
                    f"{comp}: conversion failed:\n"
                    + "\n".join((hard + report["shape_errors"])[:20])
                )
            params[comp] = converted
            reports[comp] = report
        # ONE whole-tree transfer — per-leaf puts pay a tunnel round trip
        # each and measure 16x slower (PERF.md startup-floor table).
        self.params = jax.device_put(params)
        return reports

    @classmethod
    def from_pretrained(cls, sources: dict, strict: bool = True, **kwargs):
        """Construct the pipeline and load converted torch checkpoints in
        one call — the capability analogue of diffusers'
        ``from_pretrained`` (reference 01:69-73). See ``load_pretrained``
        for the sources contract; ``scripts/convert_checkpoint.py`` is the
        CLI wrapper that persists the result as an Orbax checkpoint."""
        pipe = cls(**kwargs)
        pipe.load_pretrained(sources, strict=strict)
        return pipe

    def _init_calls(self, seed: int) -> dict:
        """{component: (init_fn, args)} — the family's component inits."""
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
        F, H, W = 2, 64, 64
        sample = jnp.zeros((1, F, H // 8, W // 8, self.unet.config.in_channels))
        t = jnp.zeros((1,), jnp.int32)
        ctx = jnp.zeros((1, 77, self.unet.config.cross_attention_dim))
        img = jnp.zeros((1, 64, 64, 3))
        ids = jnp.zeros((1, 77), jnp.int32)
        return {
            "unet": (self.unet.init, (k1, sample, t, ctx)),
            "vae": (self.vae.init, (k2, img)),
            "text": (self.text_encoder.init, (k3, ids)),
        }

    def init_params(self, seed: int = 0, fast: bool = True) -> dict:
        """Seeded random params.

        fast=True builds leaves host-side from ``jax.eval_shape`` trees and
        transfers the WHOLE tree in one ``jax.device_put`` — avoiding both
        compilation of the billion-param init graph (minutes-slow on
        remote-compile TPU backends) and per-leaf transfers (each put pays
        a tunnel round trip; scripts/bench_startup_floor.py measures
        per-leaf puts 16x slower than one tree put). fast=False uses the
        exact flax initializers (CPU tests, tiny configs).
        """
        calls = self._init_calls(seed)
        if not fast:
            return {name: fn(*args) for name, (fn, args) in calls.items()}
        shapes = {
            name: jax.eval_shape(fn, *args) for name, (fn, args) in calls.items()
        }
        return fast_tree_init(shapes, seed)

    # ------------------------------------------------------------------
    # Compiled stages
    # ------------------------------------------------------------------
    def _sampler_cfg(self, scheduler: str):
        """The pipeline's config override for this sampler (or None for the
        module defaults — the SD-1.5 reference semantics). A family that
        SET faithful constants warns when a sampler without one is chosen:
        sampling a v-prediction model with epsilon defaults is silently
        wrong, not an error."""
        cfg = self.sampler_configs.get(scheduler)
        if cfg is None and self.sampler_configs:
            warned = getattr(self, "_warned_sampler_cfg", set())
            if scheduler not in warned:
                import warnings

                warnings.warn(
                    f"{type(self).__name__} has checkpoint-faithful "
                    f"configs for {sorted(self.sampler_configs)} but none "
                    f"for scheduler={scheduler!r}; falling back to the "
                    "sampler module's SD-1.5 defaults (epsilon prediction, "
                    "linear betas) — pass sampler_configs={...} if that is "
                    "not what this checkpoint was trained with",
                    stacklevel=3,
                )
                warned.add(scheduler)
                self._warned_sampler_cfg = warned
        return cfg

    def _get_tables(self, scheduler: str, num_steps: int, max_steps: int = 0):
        """Device-resident scheduler tables, cached per signature.

        max_steps>0 pads to the variable-steps program shape
        (schedulers.common.pad_tables). Cached so per-request host work and
        re-uploads are zero on the steady path."""
        cfg = self._sampler_cfg(scheduler)
        key = ("tables", scheduler, num_steps, max_steps, cfg)
        if key not in self._compiled:
            self._compiled[key] = pad_tables(
                make_tables_for(scheduler, num_steps, cfg),
                num_steps, max_steps or num_steps,
            )
        return self._compiled[key]

    def _noise_maker(self, latent_shape):
        """Initial-noise builder. For B>1 the key is a stacked [B, 2] array
        and each video draws from its own key — bit-identical to B single
        calls with those seeds (the multi-prompt contract)."""
        if latent_shape[0] == 1:
            return lambda key: jax.random.normal(key, latent_shape, jnp.float32)
        per_video = lambda k: jax.random.normal(  # noqa: E731
            k, latent_shape[1:], jnp.float32
        )
        return lambda keys: jax.vmap(per_video)(keys)

    def _emit_progress(self, i, n):
        cb = self.progress_callback
        if cb is not None:
            cb(int(i), int(n))

    def _progress_enabled(self) -> bool:
        """Whether the per-step callback gets traced into the program.
        Requested-but-unsupported (the axon tunnel PJRT rejects host
        callbacks at RUN time — core/compat) degrades to off with one
        warning instead of a mid-generation UNIMPLEMENTED crash."""
        if self.progress_callback is None:
            return False
        from vdx.core.compat import host_callbacks_supported

        if not host_callbacks_supported():
            if not getattr(self, "_warned_progress", False):
                import warnings

                warnings.warn(
                    "per-step progress disabled: this backend (axon "
                    "remote-dispatch PJRT) does not support host "
                    "callbacks; use PipelineOutput.n_evals for skip-mode "
                    "eval counts", stacklevel=3,
                )
                self._warned_progress = True
            return False
        return True

    def _denoise_raw(self, scheduler: str, guidance: bool, latent_shape,
                     max_steps: int = 0, num_steps: int = 0,
                     t_start: int = 0, encode_fn=None, pad_frames: int = 0,
                     segment=None):
        """The denoise program body (unjitted, for composition).

        Two modes sharing one step implementation:
          static   (num_steps>0): scan over exactly num_steps; signature
                   (params, key, cond, guidance_scale, tables)
          variable (max_steps>0): scan over max_steps with
                   ``lax.cond(i < n, step, identity)``; signature gains
                   a trailing runtime ``n``. ONE compile serves every step
                   count <= max_steps (the reference study sweeps SIX
                   counts, 05:40-51 — each a multi-minute compile in
                   static mode).

        video2video (``encode_fn`` set): the signature gains a trailing
        ``video`` ([B, F, H, W, 3] in [-1, 1]); init latents come from the
        in-program VAE encode forward-diffused to step ``t_start``
        (``sampler.add_noise_at``), and the scan covers
        [t_start, num_steps) — SDEdit semantics, static mode only.

        Scheduler tables are runtime args in BOTH modes (values cached
        device-side by _get_tables), so programs never bake them in.
        """
        sampler = get_sampler(scheduler)
        _cfg = self._sampler_cfg(scheduler)
        step_kw = {} if _cfg is None else {"cfg": _cfg}
        is_dpm = schedulers_is_multistep(scheduler)
        variable = max_steps > 0
        skip = self.skip
        if variable:
            assert self.pab is None, "PAB program is per-step-count"
            assert skip is None, "skip programs are static per step count"
        v2v = encode_fn is not None
        if v2v:
            assert not variable and not is_dpm, (
                "video2video is a static ddim/euler/edm program"
            )
        # Segmented dispatch (``segment=(a, b, first, last)``): this program
        # covers denoise steps [a, b) of the num_steps schedule. The first
        # segment draws the noise in-program exactly like the monolithic
        # program; later segments take (latents, carry) as arguments — the
        # carry threads the sampler/skip state (multistep prev_x0, skip's
        # prev_eps/prev_sig/accum) so the chained segments reproduce the
        # monolithic trajectory bit-for-bit. Everything stays device-
        # resident between dispatches; the use case is the tunnel's ~55 s
        # single-dispatch ceiling (PERF.md methodology #0) for long clips.
        if segment is not None:
            seg_a, seg_b, seg_first, seg_last = segment
            assert not variable and not v2v and pad_frames == 0
        else:
            seg_a = seg_b = None
            seg_first = seg_last = True
        unet_apply = self._sharded_unet_apply or self.unet.apply
        mesh = self.mesh
        dkey = self.denoiser_param_key
        make_noise = self._noise_maker(latent_shape)
        # Ragged frame sharding (reference parity: num_frames is a FREE
        # parameter, reference experiments/05_grid_search_ablation.py:154-169
        # — e.g. the 25-frame north star over 8 shards): the frame axis is
        # zero-padded to the next shard multiple INSIDE the program. The
        # noise / conditioning RNG runs at the REAL frame count (identical
        # draws to the local program), the padded scan evolves don't-care
        # values in the pad slots (masked out of every cross-frame op by
        # ``frames_valid`` — nn/temporal.py), and _get_program trims the
        # output back to the real frames.
        frames_real = latent_shape[1]
        fv_kw = {"frames_valid": frames_real} if pad_frames else {}

        def _pad_f(x):
            return jnp.pad(
                x, ((0, 0), (0, pad_frames)) + ((0, 0),) * (x.ndim - 2)
            )
        # long-clip mode: requests longer than the context window evaluate
        # the denoiser per overlapping window and blend; shorter requests
        # fall through to the exact context-free program
        window_parallel = self._window_parallel
        if self.context is not None and latent_shape[1] > self.context.frames:
            if window_parallel:
                # multi-chip long clips: windows shard over the mesh
                # (independent evaluations; weighted-psum blend) — the
                # denoiser stays local per window (pipelines/context.py)
                from vdx.pipelines.context import make_windowed_apply_sharded

                unet_apply = make_windowed_apply_sharded(
                    unet_apply, total_frames=latent_shape[1],
                    out_channels=self.latent_channels, cfg=self.context,
                    mesh=mesh,
                )
            else:
                unet_apply = make_windowed_apply(
                    unet_apply, total_frames=latent_shape[1],
                    out_channels=self.latent_channels, cfg=self.context,
                )
            if self.context.freenoise:
                make_noise = make_freenoise_maker(
                    latent_shape, self.context.frames
                )
        progress = self._progress_enabled()

        def denoise(params, key, cond, guidance_scale, tables, n=None,
                    video=None, latents_in=None, carry_in=None):
            prep = self._prepare_cond(params, key, cond, latent_shape)
            if v2v:
                z = encode_fn(params, video)
                noise = make_noise(prep["key"])
                latents = sampler.add_noise_at(
                    z.astype(jnp.float32), noise, t_start, tables
                )
            elif segment is not None and not seg_first:
                # continuation segment: resume from the previous dispatch's
                # device-resident state (prep is recomputed — deterministic
                # for the same key, so conditioning is identical)
                latents = latents_in
            else:
                latents = make_noise(prep["key"]) * tables.init_noise_sigma
            if pad_frames:
                latents = _pad_f(latents)
                if prep["concat"] is not None:
                    prep = dict(prep, concat=_pad_f(prep["concat"]))
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                # window parallelism keeps latents REPLICATED (each device
                # evaluates whole windows); sequence parallelism shards the
                # frame axis
                spec = P() if window_parallel else P(None, "frames")
                latents = jax.lax.with_sharding_constraint(
                    latents, NamedSharding(mesh, spec)
                )
            n_total = n if variable else num_steps

            def eval_eps(lat, i):
                model_in = (
                    jnp.concatenate([lat, lat], axis=0) if guidance else lat
                )
                model_in = sampler.scale_model_input(model_in, i, tables)
                if prep["concat"] is not None:
                    model_in = jnp.concatenate(
                        [model_in, prep["concat"]], axis=-1
                    )
                t_b = jnp.broadcast_to(
                    tables.timesteps[i], (model_in.shape[0],)
                )
                eps = unet_apply(params[dkey], model_in, t_b,
                                 *prep["den_args"], **fv_kw)
                if guidance:
                    u, c = jnp.split(eps, 2, axis=0)
                    # rank-1 guidance = a per-STEP schedule (dynamic CFG):
                    # index the current step's scale. Higher-rank arrays
                    # broadcast as-is (SVD's per-frame linspace).
                    g_i = (
                        guidance_scale[i]
                        if getattr(guidance_scale, "ndim", 0) == 1
                        else guidance_scale
                    )
                    eps = cfg_combine(u, c, g_i, self.guidance_rescale)
                if progress:
                    # fires per MODEL EVALUATION — under skip turbo mode a
                    # broadcast step never enters this branch, so the
                    # callback count == eval count (tested)
                    jax.debug.callback(
                        self._emit_progress, i, n_total, ordered=False
                    )
                return eps

            def real_step(lat, i, prev_x0=None):
                eps = eval_eps(lat, i)
                if is_dpm:
                    return sampler.step_multistep(
                        lat, eps, i, prev_x0, tables, **step_kw
                    )
                return sampler.step(lat, eps, i, tables, **step_kw)

            if skip is not None:
                thresh = jnp.float32(skip.threshold)

                def body(carry, i):
                    # is_dpm: the multistep (prev_x0) slot rides the carry;
                    # a skipped step reuses the MODEL OUTPUT but still takes
                    # a full multistep update — x0 at the current node is
                    # recomputed from the reused output, so the solver's
                    # history stays consistent with the nodes it visited.
                    if is_dpm:
                        lat, prev_eps, prev_sig, accum, prev_x0 = carry
                    else:
                        lat, prev_eps, prev_sig, accum = carry
                    # trajectory-change signal: relative L1 drift of the
                    # sampler-scaled latents since the last evaluated step
                    # (real frames only — pad slots hold don't-care values
                    # whose drift must not perturb the eval decisions)
                    sig = sampler.scale_model_input(lat, i, tables).astype(
                        jnp.float32
                    )
                    if pad_frames:
                        d = jnp.abs(sig - prev_sig)[:, :frames_real]
                        p = jnp.abs(prev_sig[:, :frames_real])
                    else:
                        d = jnp.abs(sig - prev_sig)
                        p = jnp.abs(prev_sig)
                    rel = jnp.mean(d) / (jnp.mean(p) + 1e-8)
                    accum = accum + rel
                    forced = jnp.logical_or(
                        i < t_start + skip.warmup_steps,
                        i >= num_steps - skip.cooldown_steps,
                    )
                    do_eval = jnp.logical_or(forced, accum >= thresh)
                    eps = jax.lax.cond(
                        do_eval,
                        lambda l: eval_eps(l, i).astype(jnp.float32),
                        lambda l: prev_eps,
                        lat,
                    )
                    accum = jnp.where(do_eval, jnp.float32(0.0), accum)
                    if is_dpm:
                        lat, x0 = sampler.step_multistep(
                            lat, eps, i, prev_x0, tables, **step_kw
                        )
                        return (lat, eps, sig, accum, x0), do_eval
                    lat = sampler.step(lat, eps, i, tables, **step_kw)
                    return (lat, eps, sig, accum), do_eval

                if segment is not None and not seg_first:
                    init = (latents,) + tuple(carry_in)
                else:
                    zeros = jnp.zeros(latents.shape, jnp.float32)
                    init = (latents, zeros, zeros, jnp.float32(0.0))
                    if is_dpm:
                        init = init + (sampler.init_state(latents),)
                lo = seg_a if segment is not None else t_start
                hi = seg_b if segment is not None else num_steps
                res, evals = jax.lax.scan(body, init, jnp.arange(lo, hi))
                # device-computed eval count: observable on backends with
                # no host-callback support (the axon tunnel)
                n_ev = jnp.sum(evals.astype(jnp.int32))
                if segment is not None and not seg_last:
                    return (res[0], tuple(res[1:])), n_ev
                return res[0], n_ev

            if is_dpm:
                # multistep: the carry threads (latents, prev_x0). Under
                # variable_steps a padded step passes the carry through
                # untouched, and the samplers detect the terminal node by
                # its sigma value, so one program serves every step count.
                init = (latents, sampler.init_state(latents))
                if variable:
                    def body(carry, i):
                        return jax.lax.cond(
                            i < n,
                            lambda c: real_step(c[0], i, c[1]),
                            lambda c: c,
                            carry,
                        ), None

                    (out, _), _ = jax.lax.scan(
                        body, init, jnp.arange(max_steps)
                    )
                    return out

                def body(carry, i):
                    lat, x0 = real_step(carry[0], i, carry[1])
                    return (lat, x0), None

                if segment is not None:
                    if not seg_first:
                        init = (latents,) + tuple(carry_in)
                    (out, x0), _ = jax.lax.scan(
                        body, init, jnp.arange(seg_a, seg_b)
                    )
                    return out if seg_last else (out, (x0,))
                (out, _), _ = jax.lax.scan(
                    body, init, jnp.arange(num_steps)
                )
                return out
            if variable:
                def body(lat, i):
                    return jax.lax.cond(
                        i < n, lambda l: real_step(l, i), lambda l: l, lat
                    ), None

                out, _ = jax.lax.scan(body, latents, jnp.arange(max_steps))
                return out

            def body(lat, i):
                return real_step(lat, i), None

            if segment is not None:
                out, _ = jax.lax.scan(
                    body, latents, jnp.arange(seg_a, seg_b)
                )
                return out if seg_last else (out, ())
            out, _ = jax.lax.scan(
                body, latents, jnp.arange(t_start, num_steps)
            )
            return out

        return denoise

    def _denoise_raw_pab(self, num_steps, scheduler, guidance, latent_shape,
                         pab: PABConfig, pad_frames: int = 0, segment=None):
        """PAB variant: step 0 populates the attention cache (outside the
        scan so the carry structure exists); steps 1..N-1 scan with the
        cache threaded through the carry and per-type refresh flags.
        Tables are closed over (the program is per-step-count anyway).

        Composes with ``dispatch_steps`` (``segment=(a, b, first, last)``):
        the attention cache rides the inter-segment carry exactly like the
        sampler state — device-resident between dispatches, bit-identical
        to the monolithic PAB program (tests/test_pipeline.py). Refresh
        flags use GLOBAL step indices, so the broadcast schedule is
        unchanged by segmentation. This is what lets turbo modes run at
        shapes whose full program exceeds the tunnel's ~55 s dispatch
        ceiling (CogVideoX 49f@480x720: a ~128 s exact program).

        Composes with ``frame_shards``: the ring denoiser runs inside a
        shard_map whose in/out specs carry the cache — spatial/cross cache
        leaves shard their folded [B*F, ...] axis, temporal leaves their
        frame axis. The cache never leaves its device between steps, so
        any internally-consistent spec assignment is exact."""
        sampler = get_sampler(scheduler)
        _cfg = self._sampler_cfg(scheduler)
        step_kw = {} if _cfg is None else {"cfg": _cfg}
        if schedulers_is_multistep(scheduler):
            raise ValueError("PAB turbo mode supports ddim/euler/edm samplers")
        tables = self._get_tables(scheduler, num_steps)
        unet = self.unet
        mesh = self.mesh
        dkey = self.denoiser_param_key
        make_noise = self._noise_maker(latent_shape)
        # ragged frame sharding: see _denoise_raw — pad in-program, mask
        # cross-frame ops via frames_valid, trim in _get_program
        frames_real = latent_shape[1]
        fv_kw = {"frames_valid": frames_real} if pad_frames else {}

        def _pad_f(x):
            return jnp.pad(
                x, ((0, 0), (0, pad_frames)) + ((0, 0),) * (x.ndim - 2)
            )

        def refresh_flags(i):
            hot = (i < pab.warmup_steps) | (i >= num_steps - pab.cooldown_steps)

            def flag(interval):
                # interval 1 == refresh every step == the exact computation:
                # pass None so the attention modules skip the cache variable
                # entirely — at the SVD north-star shape each cached site is
                # ~295 MB of HBM, and an all-sites cache OOMs a single chip
                # (measured: 18.3 G > 15.75 G). A temporal-only schedule
                # (spatial/cross intervals 1) must not pay for unused caches.
                return None if interval == 1 else hot | (i % interval == 0)

            return {
                "spatial": flag(pab.spatial_interval),
                "temporal": flag(pab.temporal_interval),
                "cross": flag(pab.cross_interval),
                "joint": flag(pab.joint_interval),
            }

        def _apply_local(variables, model_in, t_b, den_args, flags):
            return unet.apply(
                variables, model_in, t_b, *den_args,
                pab_refresh=flags, mutable=["pab_cache"],
            )

        def _make_sharded_steps(uparams, model_in, t_b, den_args):
            """shard_map-wrapped (create, step) fns with cache specs
            inferred from the local model's cache tree (temporal caches
            shard their frame axis, spatial/cross their folded B*F axis)."""
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            n = mesh.shape["frames"]
            F_axis = 1
            local_in = jax.eval_shape(
                lambda x: x[:, : model_in.shape[F_axis] // n], model_in
            )
            eval_flags = {
                k: (None if v is None else True)
                for k, v in refresh_flags(0).items()
            }
            _, cache_struct = jax.eval_shape(
                lambda v, mi, tb, da: _apply_local(v, mi, tb, da, eval_flags),
                {"params": uparams["params"]}, local_in, t_b, den_args,
            )

            def leaf_spec(path, _leaf):
                parts = [str(getattr(p, "key", p)).lower() for p in path]
                temporal = any("motion" in s or "temporal" in s for s in parts)
                return P(None, "frames") if temporal else P("frames")

            cache_specs = jax.tree_util.tree_map_with_path(
                leaf_spec, cache_struct.get("pab_cache", {})
            )
            ring = self._ring_model
            da_specs = (P(),) * len(den_args)

            @functools.partial(
                shard_map, mesh=mesh,
                in_specs=(P(), P(None, "frames"), P()) + (da_specs, P()),
                out_specs=(P(None, "frames"), cache_specs),
                check_vma=False,
            )
            def create(params, mi, tb, da, flags):
                eps, mut = ring.apply(
                    {"params": params["params"]}, mi, tb, *da,
                    pab_refresh=flags, mutable=["pab_cache"], **fv_kw,
                )
                return eps, mut.get("pab_cache", {})

            @functools.partial(
                shard_map, mesh=mesh,
                in_specs=(P(), P(None, "frames"), P())
                + (da_specs, cache_specs, P()),
                out_specs=(P(None, "frames"), cache_specs),
                check_vma=False,
            )
            def step(params, mi, tb, da, cache, flags):
                eps, mut = ring.apply(
                    {"params": params["params"], "pab_cache": cache},
                    mi, tb, *da, pab_refresh=flags, mutable=["pab_cache"],
                    **fv_kw,
                )
                return eps, mut.get("pab_cache", {})

            return create, step

        if segment is not None:
            seg_a, seg_b, seg_first, seg_last = segment
            assert pad_frames == 0 and mesh is None
        else:
            seg_a, seg_b = 0, num_steps
            seg_first = seg_last = True

        def denoise(params, key, cond, guidance_scale, _tables=None, n=None,
                    video=None, latents_in=None, carry_in=None):
            assert video is None, "video2video does not compose with PAB"
            prep = self._prepare_cond(params, key, cond, latent_shape)
            latents = make_noise(prep["key"]) * tables.init_noise_sigma
            if pad_frames:
                latents = _pad_f(latents)
                if prep["concat"] is not None:
                    prep = dict(prep, concat=_pad_f(prep["concat"]))
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                latents = jax.lax.with_sharding_constraint(
                    latents, NamedSharding(mesh, P(None, "frames"))
                )
            uparams = params[dkey]
            sharded = [None]  # (create, step), built on first use

            def unet_step(lat, i, cache):
                model_in = (
                    jnp.concatenate([lat, lat], axis=0) if guidance else lat
                )
                model_in = sampler.scale_model_input(model_in, i, tables)
                if prep["concat"] is not None:
                    model_in = jnp.concatenate(
                        [model_in, prep["concat"]], axis=-1
                    )
                t_b = jnp.broadcast_to(
                    tables.timesteps[i], (model_in.shape[0],)
                )
                flags = refresh_flags(i)
                if mesh is None:
                    variables = {"params": uparams["params"]}
                    if cache is not None:
                        variables["pab_cache"] = cache
                    eps, mut = _apply_local(
                        variables, model_in, t_b, prep["den_args"], flags
                    )
                    new_cache = mut.get("pab_cache", {})
                else:
                    if sharded[0] is None:
                        sharded[0] = _make_sharded_steps(
                            uparams, model_in, t_b, prep["den_args"]
                        )
                    create, step = sharded[0]
                    if cache is None:
                        eps, new_cache = create(
                            uparams, model_in, t_b, prep["den_args"], flags
                        )
                    else:
                        eps, new_cache = step(
                            uparams, model_in, t_b, prep["den_args"],
                            cache, flags,
                        )
                if guidance:
                    u, c = jnp.split(eps, 2, axis=0)
                    g_i = (
                        guidance_scale[i]
                        if getattr(guidance_scale, "ndim", 0) == 1
                        else guidance_scale
                    )
                    eps = cfg_combine(u, c, g_i, self.guidance_rescale)
                return sampler.step(lat, eps, i, tables, **step_kw), new_cache

            if seg_first:
                # step 0: creates the cache collection (outside the scan so
                # the carry structure exists)
                latents, cache = unet_step(latents, jnp.asarray(0), None)
                start = 1
            else:
                # continuation segment: resume from the previous dispatch's
                # device-resident latents + attention cache
                latents = latents_in
                (cache,) = tuple(carry_in)
                start = seg_a

            def body(carry, i):
                lat, cache = carry
                lat, cache = unet_step(lat, i, cache)
                return (lat, cache), None

            (latents, cache), _ = jax.lax.scan(
                body, (latents, cache), jnp.arange(start, seg_b)
            )
            if segment is not None and not seg_last:
                return latents, (cache,)
            return latents

        return denoise

    def _decode_composable(self, chunk: int, decode_opts: dict):
        """The decode stage, shard_map-wrapped under frame sharding
        (decode is chunk-local over frames, so each device decodes its
        frame shard; chunk never exceeds the local frame count)."""
        decode = self._decode_raw(chunk, **decode_opts)
        if self.mesh is not None:
            import functools as _ft

            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            decode = _ft.partial(
                shard_map, mesh=self.mesh, in_specs=(P(), P(None, "frames")),
                out_specs=P(None, "frames"), check_vma=False,
            )(decode)
        return decode

    def _get_decode(self, chunk: int, **opts):
        """Jitted standalone decoder (batched harness / serving use this to
        decode latents produced by their own denoise programs)."""
        key = ("decode", chunk, tuple(sorted(opts.items())))
        if key not in self._compiled:
            self._compiled[key] = jax.jit(self._decode_composable(chunk, opts))
        return self._compiled[key]

    def _get_program(self, *, scheduler, guidance, latent_shape, num_steps,
                     chunk=None, decode_opts=None, variable=False,
                     t_start=0, encode_chunk=None, pad_frames=0,
                     decode_pad=0, segment=None):
        """Build-or-fetch the jitted program for this request signature.

        chunk=None  -> denoise-only (latent output)
        chunk=int   -> single-program generate: noise -> denoise scan ->
                       chunked decode -> uint8, ONE device dispatch
                       (the tunnel charges a round trip per program;
                       PERF.md methodology), latents never surfacing
                       between stages.
        encode_chunk=int -> video2video: the program additionally takes
                       the input video, VAE-encodes it in-program and
                       starts the (truncated) scan at ``t_start``.
        """
        key = ("prog", scheduler, guidance, latent_shape, num_steps if not variable
               else ("var", self.variable_steps), chunk,
               tuple(sorted((decode_opts or {}).items())),
               self.pab is not None, self._progress_enabled(),
               t_start, encode_chunk, pad_frames, decode_pad, segment,
               dataclasses.astuple(self.skip) if self.skip else None,
               dataclasses.astuple(self.context) if self.context else None,
               self.guidance_rescale,
               self._sampler_cfg(scheduler))  # cfg branches the traced step
        if key in self._compiled:
            return self._compiled[key]

        encode_fn = (
            None if encode_chunk is None
            else self._encode_composable(encode_chunk)
        )
        if self.pab is not None:
            denoise_raw = self._denoise_raw_pab(
                num_steps, scheduler, guidance, latent_shape, self.pab,
                pad_frames=pad_frames, segment=segment,
            )
        elif variable:
            denoise_raw = self._denoise_raw(
                scheduler, guidance, latent_shape,
                max_steps=self.variable_steps, pad_frames=pad_frames,
            )
        else:
            denoise_raw = self._denoise_raw(
                scheduler, guidance, latent_shape, num_steps=num_steps,
                t_start=t_start, encode_fn=encode_fn, pad_frames=pad_frames,
                segment=segment,
            )

        skip_stats = self.skip is not None and self.pab is None
        frames_real = latent_shape[1]
        if chunk is None:
            if pad_frames:
                # ragged sharding: the scan ran padded — trim the pad
                # slots off the latent output inside the program
                def denoise_trim(*args, **kwargs):
                    res = denoise_raw(*args, **kwargs)
                    if skip_stats:
                        latents, n_evals = res
                        return latents[:, :frames_real], n_evals
                    return res[:, :frames_real]

                fn = jax.jit(denoise_trim)
            else:
                fn = jax.jit(denoise_raw)
        else:
            decode_raw = self._decode_composable(chunk, decode_opts or {})

            def generate(params, key, cond, guidance_scale, tables, n=None,
                         video=None):
                res = denoise_raw(params, key, cond, guidance_scale,
                                  tables, n, video)
                if skip_stats:
                    latents, n_evals = res
                else:
                    latents, n_evals = res, None
                if pad_frames:
                    # zero the pad slots before decode: frame-local decode
                    # (2D VAEs) ignores them; chunked TEMPORAL decode (SVD)
                    # sees deterministic zeros in any chunk that spans the
                    # real/pad boundary instead of don't-care scan values
                    F_p = latents.shape[1]
                    fmask = (jnp.arange(F_p) < frames_real).astype(
                        latents.dtype
                    )
                    frames_u8 = decode_raw(
                        params, latents * fmask[None, :, None, None, None]
                    )
                    latents = latents[:, :frames_real]
                    frames_u8 = frames_u8[:, :frames_real]
                elif decode_pad:
                    # window parallelism: latents are real-length and
                    # replicated — zero-pad them for the shard-local decode
                    # and trim the decoded frames back
                    lat_dec = jnp.pad(
                        latents,
                        ((0, 0), (0, decode_pad)) + ((0, 0),) * (latents.ndim - 2),
                    )
                    frames_u8 = decode_raw(params, lat_dec)[:, :frames_real]
                else:
                    frames_u8 = decode_raw(params, latents)
                if n_evals is not None:
                    return latents, frames_u8, n_evals
                return latents, frames_u8

            fn = jax.jit(generate)
        self._compiled[key] = fn
        return fn

    def encode_prompt(
        self, prompt: Union[str, Sequence[str]], negative_prompt: str = ""
    ) -> jnp.ndarray:
        """-> [2B, 77, D] context, ordered (uncond x B, cond x B) to match
        the CFG batch split. B = 1 for a string prompt (back-compat [2, ...])."""
        prompts = [prompt] if isinstance(prompt, str) else list(prompt)
        ids = self.tokenizer([negative_prompt or ""] * len(prompts) + prompts)
        if "text_encode" not in self._compiled:
            self._compiled["text_encode"] = jax.jit(self.text_encoder.apply)
        return self._compiled["text_encode"](self.params["text"], jnp.asarray(ids))

    # ------------------------------------------------------------------
    # Shared generate driver
    # ------------------------------------------------------------------
    def _run_generate(self, *, cond, guidance_arr, guidance: bool,
                      latent_shape, scheduler: str, num_inference_steps: int,
                      seed, decode_chunk: int, decode_opts=None,
                      output_type: str = "np", latent_only: bool = False,
                      video=None, t_start: int = 0, dispatch_steps: int = 0):
        """The family-independent request path: resolve chunking/sharding,
        pick static vs variable program, dispatch, postprocess."""
        B, num_frames = latent_shape[0], latent_shape[1]
        if dispatch_steps and dispatch_steps < num_inference_steps:
            # chunked dispatch takes precedence over variable_steps — the
            # whole point is to AVOID one monolithic device dispatch.
            # PAB composes: its attention cache rides the inter-segment
            # carry (see _denoise_raw_pab).
            if video is not None:
                raise ValueError(
                    "dispatch_steps does not compose with video2video"
                )
            return self._run_generate_segmented(
                cond=cond, guidance_arr=guidance_arr, guidance=guidance,
                latent_shape=latent_shape, scheduler=scheduler,
                num_inference_steps=num_inference_steps, seed=seed,
                decode_chunk=decode_chunk, decode_opts=decode_opts,
                output_type=output_type, latent_only=latent_only,
                dispatch_steps=dispatch_steps,
            )
        # Ragged frame sharding: num_frames is a FREE parameter (matching
        # the reference, experiments/05_grid_search_ablation.py:154-169) —
        # when it does not divide the shard count (the 25-frame north star
        # over 8 chips), the program zero-pads the frame axis to the next
        # shard multiple, masks the pad slots out of every cross-frame op,
        # and trims them off the output. Exact vs the local program
        # (tests/test_frame_parallel.py ragged cases).
        mesh_pad = (
            (-num_frames) % self.frame_shards if self.frame_shards > 1 else 0
        )
        if self._window_parallel:
            # window parallelism: the denoise runs on REPLICATED unpadded
            # latents (windows shard over the mesh, not frames); only the
            # shard-local decode needs the frame axis padded to the mesh
            pad_frames, decode_pad = 0, mesh_pad
        else:
            pad_frames, decode_pad = mesh_pad, 0
        local_frames = (num_frames + mesh_pad) // self.frame_shards
        chunk = max(1, min(decode_chunk, local_frames))
        while local_frames % chunk:
            chunk -= 1

        v2v = video is not None
        use_var = (
            self.variable_steps > 0
            and self.pab is None
            and self.skip is None  # skip programs are static per step count
            and not v2v  # v2v programs are static per (steps, t_start)
            and num_inference_steps <= self.variable_steps
        )
        key_arr = self._seed_keys(seed, B)

        prog = self._get_program(
            scheduler=scheduler, guidance=guidance, latent_shape=latent_shape,
            num_steps=num_inference_steps,
            chunk=None if latent_only else chunk,
            decode_opts=decode_opts, variable=use_var,
            t_start=t_start if v2v else 0,
            encode_chunk=chunk if v2v else None,
            pad_frames=pad_frames, decode_pad=decode_pad,
        )
        tables = self._get_tables(
            scheduler, num_inference_steps,
            self.variable_steps if use_var else 0,
        )
        if getattr(guidance_arr, "ndim", 0) == 1:
            # rank-1 guidance = per-STEP schedule (dynamic CFG). Validate
            # HERE — the shared path every family's __call__ routes through
            # (an out-of-range gather would silently clamp, not raise).
            if guidance_arr.shape[0] != num_inference_steps:
                raise ValueError(
                    f"per-step guidance schedule has {guidance_arr.shape[0]} "
                    f"entries for {num_inference_steps} steps"
                )
            if use_var:
                # padded program: edge-pad to the program's step axis
                # (padded steps never evaluate)
                pad = self.variable_steps - guidance_arr.shape[0]
                if pad:
                    guidance_arr = jnp.concatenate(
                        [guidance_arr, jnp.repeat(guidance_arr[-1:], pad)]
                    )
        elif (
            pad_frames
            and getattr(guidance_arr, "ndim", 0) > 1
            and guidance_arr.shape[1] == num_frames
        ):
            # per-FRAME guidance (SVD's linspace [1, F, 1, 1, 1]) must
            # broadcast over the frame-padded latents; edge-pad the pad
            # slots (their combine result is trimmed anyway)
            guidance_arr = jnp.concatenate(
                [guidance_arr]
                + [guidance_arr[:, -1:]] * pad_frames, axis=1
            )
        args = (self.params, key_arr, cond, guidance_arr, tables)
        if use_var:
            args = args + (jnp.int32(num_inference_steps),)
        kwargs = {"video": video} if v2v else {}
        skip_stats = self.skip is not None and self.pab is None
        n_evals = None
        if latent_only:
            res = prog(*args, **kwargs)
            if skip_stats:
                latents, n_evals = res
            else:
                latents = res
            return PipelineOutput(frames=[], latents=latents,
                                  n_evals=n_evals)
        res = prog(*args, **kwargs)
        if skip_stats:
            latents, frames_u8, n_evals = res
        else:
            latents, frames_u8 = res
        return self._postprocess(latents, frames_u8, n_evals, output_type, B)

    def _run_generate_segmented(self, *, cond, guidance_arr, guidance: bool,
                                latent_shape, scheduler: str,
                                num_inference_steps: int, seed,
                                decode_chunk: int, decode_opts=None,
                                output_type: str = "np",
                                latent_only: bool = False,
                                dispatch_steps: int = 0):
        """Chunked dispatch: the denoise runs as ceil(N/K) chained segment
        programs with DEVICE-RESIDENT state between them (latents + the
        sampler/skip carry), then one decode program — bit-identical to the
        monolithic program (tested), but no single dispatch exceeds ~K
        steps. Exists for the tunneled backend's ~55 s single-dispatch
        worker ceiling (PERF.md methodology #0): 128-frame context clips
        need ~80 s of denoise that no monolithic program can dispatch.

        JAX async dispatch keeps the chain gapless: each segment enqueues
        against the previous segment's output without host sync, so the
        only added cost is per-dispatch overhead (~40 ms steady-state).
        """
        if self.mesh is not None:
            raise ValueError(
                "dispatch_steps is a single-chip (tunnel) mechanism; "
                "multi-chip runs have no dispatch ceiling — use "
                "frame_shards/window parallelism without it"
            )
        B = latent_shape[0]
        N, K = num_inference_steps, dispatch_steps
        if getattr(guidance_arr, "ndim", 0) == 1:
            if guidance_arr.shape[0] != N:
                raise ValueError(
                    f"per-step guidance schedule has {guidance_arr.shape[0]} "
                    f"entries for {N} steps"
                )
        key_arr = self._seed_keys(seed, B)
        tables = self._get_tables(scheduler, N)
        skip_stats = self.skip is not None
        bounds = list(range(0, N, K)) + [N]
        segments = [
            (a, b) for a, b in zip(bounds[:-1], bounds[1:]) if b > a
        ]
        latents = carry = None
        n_ev_parts = []
        for a, b in segments:
            first, last = a == 0, b == N
            prog = self._get_program(
                scheduler=scheduler, guidance=guidance,
                latent_shape=latent_shape, num_steps=N, chunk=None,
                segment=(a, b, first, last),
            )
            args = (self.params, key_arr, cond, guidance_arr, tables)
            kwargs = {} if first else {
                "latents_in": latents, "carry_in": carry,
            }
            res = prog(*args, **kwargs)
            if skip_stats:
                res, n_ev = res
                n_ev_parts.append(n_ev)
            if last:
                latents = res
            else:
                latents, carry = res
        n_evals = sum(n_ev_parts[1:], n_ev_parts[0]) if n_ev_parts else None
        if latent_only:
            return PipelineOutput(frames=[], latents=latents,
                                  n_evals=n_evals)
        local_frames = latent_shape[1]
        chunk = max(1, min(decode_chunk, local_frames))
        while local_frames % chunk:
            chunk -= 1
        decode = self._get_decode(chunk, **(decode_opts or {}))
        frames_u8 = decode(self.params, latents)
        return self._postprocess(latents, frames_u8, n_evals, output_type, B)

    def _postprocess(self, latents, frames_u8, n_evals, output_type, B):
        if output_type == "device":
            # Async surface: frames stay on device ([B, F, H, W, 3] uint8)
            # and the call returns as soon as the program is enqueued (JAX
            # async dispatch). The caller overlaps the device->host frame
            # transfer (np.asarray(out.frames)) with the NEXT request's
            # denoise — on the tunneled backend that transfer costs ~1 s
            # per 12 MB video, pure pipeline bubble otherwise (PERF.md).
            return PipelineOutput(frames=frames_u8, latents=latents,
                                  n_evals=n_evals)
        frames_np = np.asarray(frames_u8)  # [B, F, H, W, 3]

        if output_type == "np":
            return PipelineOutput(
                frames=[frames_np[b] for b in range(B)], latents=latents,
                n_evals=n_evals,
            )

        from PIL import Image

        pil = [
            [Image.fromarray(f) for f in frames_np[b]] for b in range(B)
        ]
        return PipelineOutput(frames=pil, latents=latents, n_evals=n_evals)

    @staticmethod
    def _seed_keys(seed, batch: int):
        """Single key for B=1; stacked [B, 2] keys for a video batch. A
        scalar seed with B>1 reuses the same key per video (each video
        then matches the single call with that seed)."""
        if batch == 1:
            if isinstance(seed, (list, tuple)):
                (seed,) = seed
            return as_key(seed)
        seeds = list(seed) if isinstance(seed, (list, tuple)) else [seed] * batch
        assert len(seeds) == batch, (
            f"got {len(seeds)} seeds for {batch} prompts"
        )
        return jnp.stack([as_key(s) for s in seeds])

    # ------------------------------------------------------------------
    # Public API (reference-compatible kwargs)
    # ------------------------------------------------------------------
    def __call__(
        self,
        prompt: Union[str, Sequence[str]],
        negative_prompt: str = "",
        num_frames: int = 16,
        guidance_scale: float = 7.5,
        num_inference_steps: int = 25,
        height: int = 512,
        width: int = 512,
        seed: Union[int, jax.Array, Sequence[int]] = 0,
        scheduler: Optional[str] = None,
        output_type: str = "pil",
        decode_chunk: int = 8,
        video=None,
        strength: float = 0.8,
        dispatch_steps: int = 0,
    ) -> PipelineOutput:
        """Text-to-video; pass ``video`` for video2video (SDEdit): the
        input clip ([F, H, W, 3] or [B, F, H, W, 3], uint8 or float in
        [-1, 1]) is VAE-encoded in-program, forward-diffused to
        ``strength`` of the schedule, and denoised over the remaining
        steps under the prompt — the capability analogue of diffusers'
        AnimateDiffVideoToVideoPipeline on the same compiled core.
        ``num_frames``/``height``/``width`` derive from the video."""
        assert self.params is not None, "load or init params first"
        scheduler = scheduler or self.scheduler
        t_start = 0
        if video is not None:
            if self.pab is not None:
                raise ValueError("video2video does not compose with PAB")
            if schedulers_is_multistep(scheduler):
                raise ValueError(
                    "video2video supports ddim/euler/edm samplers "
                    "(a multistep state assumes a full trajectory)"
                )
            if not 0.0 < strength <= 1.0:
                raise ValueError(f"strength must be in (0, 1], got {strength}")
            video = np.asarray(video)
            if video.ndim == 4:
                video = video[None]
            if video.dtype == np.uint8:
                video = video.astype(np.float32) / 127.5 - 1.0
            video = jnp.asarray(video, jnp.float32)
            _, num_frames, height, width = video.shape[:4]
            # SDEdit truncation: keep ceil-to-1 so strength>0 always denoises
            init_steps = min(
                max(int(num_inference_steps * strength), 1),
                num_inference_steps,
            )
            t_start = num_inference_steps - init_steps
        ds = self.vae.config.downscale
        h, w = height // ds, width // ds
        guidance = self.guidance_always or float(np.max(guidance_scale)) > 1.0
        B = 1 if isinstance(prompt, str) else len(prompt)
        if video is not None and video.shape[0] != B:
            raise ValueError(
                f"video batch {video.shape[0]} != prompt batch {B}"
            )

        context = self.encode_prompt(prompt, negative_prompt)  # [2B, 77, D]
        if not guidance:
            context = context[B:]

        latent_shape = (B, num_frames, h, w, self.latent_channels)
        return self._run_generate(
            cond=context, guidance_arr=jnp.float32(guidance_scale),
            guidance=guidance, latent_shape=latent_shape, scheduler=scheduler,
            num_inference_steps=num_inference_steps, seed=seed,
            decode_chunk=decode_chunk, output_type=output_type,
            latent_only=(output_type == "latent"),
            video=video, t_start=t_start, dispatch_steps=dispatch_steps,
        )


def _to_uint8(imgs: jnp.ndarray) -> jnp.ndarray:
    """[-1, 1] float frames -> [0, 255] uint8."""
    imgs = jnp.clip(imgs.astype(jnp.float32) / 2 + 0.5, 0.0, 1.0)
    return jnp.round(imgs * 255.0).astype(jnp.uint8)


def _leaf_init_kind(path, leaf) -> str:
    name = str(getattr(path[-1], "key", path[-1])).lower()
    if len(leaf.shape) >= 2:
        return "normal"  # fan-in-scaled keeps activations O(1) end to end
    if "mix_factor" in name:
        return "half"
    if "scale" in name:
        return "ones"
    return "zeros"  # bias-like


def fast_tree_init(shapes: dict, seed: int) -> dict:
    """Seeded random params for a dict of eval_shape trees, without
    compiling any model init graph.

    Big trees (the billion-param production configs) generate ON DEVICE in
    one jitted RNG program: host numpy RNG for 1.3B params measures ~9 min
    on this class of host CPU, and per-leaf transfers pay a tunnel round
    trip each (scripts/bench_startup_floor.py) — while the device program
    compiles once (persistently cached) and runs in well under a second.
    Small trees (CPU tests) keep the instant host-numpy path, moved in one
    bulk ``jax.device_put``.
    """
    flat_all = {
        k: jax.tree_util.tree_flatten_with_path(v) for k, v in shapes.items()
    }
    total = sum(
        int(np.prod(leaf.shape))
        for flat, _ in (flat_all[k] for k in flat_all)
        for _, leaf in flat
    )
    if total >= 2**25 and jax.default_backend() != "cpu":
        return _device_tree_init(flat_all, seed)

    rng = np.random.default_rng(seed)

    def build(k):
        flat, treedef = flat_all[k]
        out = []
        for path, leaf in flat:
            kind = _leaf_init_kind(path, leaf)
            if kind == "normal":
                fan_in = int(np.prod(leaf.shape[:-1]))
                a = rng.standard_normal(leaf.shape, dtype=np.float32)
                a *= (1.0 / max(fan_in, 1)) ** 0.5
            else:
                fill = {"half": 0.5, "ones": 1.0, "zeros": 0.0}[kind]
                a = np.full(leaf.shape, fill, np.float32)
            out.append(a.astype(leaf.dtype))
        return jax.tree.unflatten(treedef, out)

    return jax.device_put({k: build(k) for k in shapes})


def _device_tree_init(flat_all: dict, seed: int) -> dict:
    """One jitted program generating every leaf on device."""
    specs = []  # (component, index-in-component, kind, shape, dtype)
    for k, (flat, _) in flat_all.items():
        for i, (path, leaf) in enumerate(flat):
            specs.append((k, i, _leaf_init_kind(path, leaf), leaf.shape,
                          leaf.dtype))

    def gen(key):
        keys = jax.random.split(key, len(specs))
        outs = []
        for (k_, i, kind, shape, dtype), kk in zip(specs, keys):
            if kind == "normal":
                fan_in = int(np.prod(shape[:-1]))
                x = jax.random.normal(kk, shape, jnp.float32)
                x = x * (1.0 / max(fan_in, 1)) ** 0.5
            else:
                fill = {"half": 0.5, "ones": 1.0, "zeros": 0.0}[kind]
                x = jnp.full(shape, fill, jnp.float32)
            outs.append(x.astype(dtype))
        return outs

    leaves = jax.jit(gen)(jax.random.PRNGKey(seed))
    out = {}
    pos = 0
    for k, (flat, treedef) in flat_all.items():
        n = len(flat)
        out[k] = jax.tree.unflatten(treedef, leaves[pos:pos + n])
        pos += n
    return out


class AnimateDiffPipeline(VideoDiffusionPipeline):
    """SD-1.5 + motion modules (the reference's flagship pipeline)."""

    denoiser_cls = UNetMotion
    denoiser_config_cls = UNetMotionConfig
