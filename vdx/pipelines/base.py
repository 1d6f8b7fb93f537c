"""Video diffusion pipeline base — jit-compiled end to end.

The TPU-native rebuild of the pipeline object family the reference drives
through diffusers (call sites: reference experiments/01_baseline_generation.py:100-105,
05_grid_search_ablation.py:158-167). One base class hosts the compiled
machinery; concrete pipelines (AnimateDiff / ModelScope UNet3D / Latte DiT,
see the sibling modules) plug in their denoiser + text tower. Call surface:

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

Compiled executables are cached per (shape, steps, sampler) signature.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from vdx.core.dtypes import DEFAULT_POLICY, Policy
from vdx.core.rng import as_key
from vdx.models.clip_text import CLIPTextConfig, CLIPTextModel
from vdx.models.tokenizer import load_tokenizer
from vdx.models.unet_motion import UNetMotion, UNetMotionConfig
from vdx.models.vae import AutoencoderKL, VAEConfig
from vdx.schedulers import get_sampler


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
    warmup_steps: int = 2
    cooldown_steps: int = 2


@dataclasses.dataclass
class PipelineOutput:
    """``frames[0]`` is the list of PIL frames for the first (only) video —
    the exact access pattern of the reference (01:108, 05:169)."""

    frames: List[Any]
    latents: Optional[jnp.ndarray] = None


class VideoDiffusionPipeline:
    """Base: compiled denoise/decode machinery around a pluggable denoiser."""

    denoiser_cls = UNetMotion
    denoiser_config_cls = UNetMotionConfig

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
        frame_shards: int = 1,
        mesh=None,
        variable_steps: int = 0,
    ):
        # variable_steps=N > 0: compile ONE step-count-agnostic generate
        # program (padded tables + lax.cond-skipped steps, max N steps)
        # instead of one program per step count — the right mode for
        # step-count sweeps (grid search) and mixed-step serving.
        self.variable_steps = variable_steps
        unet_config = unet_config or self.denoiser_config_cls()
        unet_kwargs = dict(policy=policy, attn_impl=attn_impl)
        if pab is not None:
            unet_kwargs["pab"] = True  # denoiser must support the pab flag
        self.pab = pab
        self.unet = self.denoiser_cls(unet_config, **unet_kwargs)
        self.vae = AutoencoderKL(vae_config, policy=policy)
        self.text_encoder = CLIPTextModel(text_config, policy=policy)
        self.tokenizer = tokenizer or load_tokenizer()
        self.params = params
        self.policy = policy
        self.scheduler = scheduler
        self._compiled = {}
        # Frame-axis sequence parallelism on the pipeline surface: the
        # denoise scan and VAE decode run frame-sharded over an n-device
        # mesh (ring temporal attention; spatial/cross ops shard-local).
        # Same params as local execution — the long-clip north star
        # (SURVEY.md §5; capability analogue of the reference's memory
        # scaling knobs, 01:85, 05:143-144).
        self.frame_shards = frame_shards
        self.mesh = None
        self._sharded_unet_apply = None
        if frame_shards > 1:
            assert pab is None, "frame sharding and PAB are mutually exclusive"
            from vdx.parallel.frame_parallel import make_frame_sharded_denoiser
            from vdx.parallel.mesh import make_mesh

            self.mesh = mesh if mesh is not None else make_mesh(1, frame_shards, 1)
            _, self._sharded_unet_apply = make_frame_sharded_denoiser(
                self.denoiser_cls, unet_config, self.mesh,
                policy=policy, attn_impl=attn_impl,
            )

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

    def init_params(self, seed: int = 0, fast: bool = True) -> dict:
        """Seeded random params.

        fast=True builds leaves host-side from ``jax.eval_shape`` trees and
        transfers them — avoiding compilation of the 1.3B-param init graph,
        which is minutes-slow on remote-compile TPU backends. fast=False
        uses the exact flax initializers (CPU tests, tiny configs).
        """
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
        F, H, W = 2, 64, 64
        sample = jnp.zeros((1, F, H // 8, W // 8, self.unet.config.in_channels))
        t = jnp.zeros((1,), jnp.int32)
        ctx = jnp.zeros((1, 77, self.unet.config.cross_attention_dim))
        img = jnp.zeros((1, 64, 64, 3))
        ids = jnp.zeros((1, 77), jnp.int32)
        if not fast:
            return {
                "unet": self.unet.init(k1, sample, t, ctx),
                "vae": self.vae.init(k2, img),
                "text": self.text_encoder.init(k3, ids),
            }

        import numpy as np

        shapes = {
            "unet": jax.eval_shape(self.unet.init, k1, sample, t, ctx),
            "vae": jax.eval_shape(self.vae.init, k2, img),
            "text": jax.eval_shape(self.text_encoder.init, k3, ids),
        }
        rng = np.random.default_rng(seed)

        def build(tree):
            flat = jax.tree_util.tree_flatten_with_path(tree)
            out = []
            for path, leaf in flat[0]:
                name = str(getattr(path[-1], "key", path[-1])).lower()
                if len(leaf.shape) >= 2:
                    # fan-in-scaled normal keeps activations O(1) end to end
                    fan_in = int(np.prod(leaf.shape[:-1]))
                    a = rng.standard_normal(leaf.shape) * (1.0 / max(fan_in, 1)) ** 0.5
                elif "scale" in name:
                    a = np.ones(leaf.shape)
                else:  # bias-like
                    a = np.zeros(leaf.shape)
                out.append(jnp.asarray(a.astype(np.float32), dtype=leaf.dtype))
            return jax.tree.unflatten(flat[1], out)

        return {k: build(v) for k, v in shapes.items()}

    # ------------------------------------------------------------------
    # Compiled stages
    # ------------------------------------------------------------------
    def _denoise_fn(self, num_steps: int, scheduler: str, guidance: bool,
                    latent_shape, jit_wrap: bool = True):
        """Build the jitted noise+scan program (cached per signature).

        Latent noise is generated INSIDE the jit from the key — on
        remote-dispatch TPU backends every host-side op is a round trip, so
        the whole sample path must be one program. jit_wrap=False returns
        the raw function for composition into the single-program generate
        path (_generate_fn).
        """
        sampler = get_sampler(scheduler)
        tables = sampler.make_tables(num_steps)
        unet = self.unet
        is_dpm = scheduler.startswith("dpm")
        pab = self.pab
        if pab is not None and is_dpm:
            raise ValueError("PAB turbo mode supports ddim/euler samplers")
        if pab is not None:
            return self._denoise_fn_pab(num_steps, sampler, tables, guidance, pab,
                                        latent_shape, jit_wrap=jit_wrap), tables

        unet_apply = self._sharded_unet_apply or unet.apply
        mesh = self.mesh

        def denoise(unet_params, key, context, guidance_scale):
            latents = (
                jax.random.normal(key, latent_shape, dtype=jnp.float32)
                * tables.init_noise_sigma
            )
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                latents = jax.lax.with_sharding_constraint(
                    latents, NamedSharding(mesh, P(None, "frames"))
                )
            # latents: [B, F, h, w, 4]; context: [2B or B, 77, D]
            def body(carry, i):
                if is_dpm:
                    lat, prev_x0 = carry
                else:
                    lat = carry
                t = tables.timesteps[i]
                model_in = jnp.concatenate([lat, lat], axis=0) if guidance else lat
                model_in = sampler.scale_model_input(model_in, i, tables)
                t_batch = jnp.broadcast_to(t, (model_in.shape[0],))
                eps = unet_apply(unet_params, model_in, t_batch, context)
                if guidance:
                    eps_uncond, eps_text = jnp.split(eps, 2, axis=0)
                    eps = eps_uncond + guidance_scale * (eps_text - eps_uncond)
                if is_dpm:
                    lat, x0 = sampler.step_multistep(lat, eps, i, prev_x0, tables)
                    return (lat, x0), None
                lat = sampler.step(lat, eps, i, tables)
                return lat, None

            init = (latents, jnp.zeros_like(latents)) if is_dpm else latents
            out, _ = jax.lax.scan(body, init, jnp.arange(num_steps))
            return out[0] if is_dpm else out

        return (jax.jit(denoise) if jit_wrap else denoise), tables

    def _denoise_fn_pab(self, num_steps, sampler, tables, guidance, pab,
                        latent_shape, jit_wrap: bool = True):
        """PAB variant: step 0 populates the attention cache (outside the
        scan so the carry structure exists); steps 1..N-1 scan with the
        cache threaded through the carry and per-type refresh flags."""
        unet = self.unet

        def refresh_flags(i):
            hot = (i < pab.warmup_steps) | (i >= num_steps - pab.cooldown_steps)
            return {
                "spatial": hot | (i % pab.spatial_interval == 0),
                "temporal": hot | (i % pab.temporal_interval == 0),
                "cross": hot | (i % pab.cross_interval == 0),
            }

        def denoise(unet_params, key, context, guidance_scale):
            latents = (
                jax.random.normal(key, latent_shape, dtype=jnp.float32)
                * tables.init_noise_sigma
            )

            def unet_step(lat, i, variables, mutable):
                model_in = jnp.concatenate([lat, lat], axis=0) if guidance else lat
                model_in = sampler.scale_model_input(model_in, i, tables)
                t_b = jnp.broadcast_to(tables.timesteps[i], (model_in.shape[0],))
                eps, mut = unet.apply(
                    variables, model_in, t_b, context,
                    pab_refresh=refresh_flags(i), mutable=mutable,
                )
                if guidance:
                    u, c = jnp.split(eps, 2, axis=0)
                    eps = u + guidance_scale * (c - u)
                return sampler.step(lat, eps, i, tables), mut["pab_cache"]

            # step 0: creates the cache collection
            latents, cache = unet_step(
                latents, jnp.asarray(0), {"params": unet_params["params"]},
                ["pab_cache"],
            )

            def body(carry, i):
                lat, cache = carry
                lat, cache = unet_step(
                    lat, i,
                    {"params": unet_params["params"], "pab_cache": cache},
                    ["pab_cache"],
                )
                return (lat, cache), None

            (latents, _), _ = jax.lax.scan(
                body, (latents, cache), jnp.arange(1, num_steps)
            )
            return latents

        return jax.jit(denoise) if jit_wrap else denoise

    def _decode_fn(self, chunk: int, jit_wrap: bool = True):
        # cached in self._compiled (an lru_cache on the bound method would
        # pin the pipeline instance for the process lifetime)
        key = ("decode", chunk)
        if jit_wrap and key in self._compiled:
            return self._compiled[key]
        vae = self.vae

        def decode(vae_params, latents):  # [F, h, w, 4] -> [F, H, W, 3] uint8
            z = latents.reshape(-1, chunk, *latents.shape[1:])
            imgs = jax.lax.map(
                lambda c: vae.apply(vae_params, c, method=vae.decode), z
            )
            imgs = imgs.reshape(-1, *imgs.shape[2:])
            imgs = jnp.clip(imgs.astype(jnp.float32) / 2 + 0.5, 0.0, 1.0)
            return jnp.round(imgs * 255.0).astype(jnp.uint8)

        if self.mesh is not None:
            # decode is per-frame pure: each device decodes its frame shard
            import functools as _ft

            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            decode = _ft.partial(
                shard_map, mesh=self.mesh, in_specs=(P(), P("frames")),
                out_specs=P("frames"), check_vma=False,
            )(decode)

        if not jit_wrap:
            return decode
        self._compiled[key] = jax.jit(decode)
        return self._compiled[key]

    def _denoise_fn_var(self, scheduler: str, guidance: bool, latent_shape,
                        max_steps: int, jit_wrap: bool = True):
        """Step-count-AGNOSTIC denoise program.

        The static program bakes the scheduler tables in as constants, so
        every step count is its own multi-minute compile (the reference
        study sweeps SIX counts, 05:40-51 — ~25 min of compiles per grid
        run, PERF.md). Here the tables are runtime arguments padded to
        ``max_steps`` (schedulers.common.pad_tables) and the scan runs
        ``max_steps`` iterations with ``lax.cond(i < n, step, identity)``
        — the UNet branch only executes for real steps, so padding costs
        microseconds and ONE compile serves every (ddim/euler) step count
        and guidance scale.
        """
        sampler = get_sampler(scheduler)
        assert not scheduler.startswith("dpm"), "dpm multistep carries state"
        assert self.pab is None, "PAB program is per-step-count"
        unet_apply = self._sharded_unet_apply or self.unet.apply
        mesh = self.mesh

        def denoise(unet_params, key, context, guidance_scale, tables, n):
            latents = (
                jax.random.normal(key, latent_shape, dtype=jnp.float32)
                * tables.init_noise_sigma
            )
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                latents = jax.lax.with_sharding_constraint(
                    latents, NamedSharding(mesh, P(None, "frames"))
                )

            def body(lat, i):
                def real(lat):
                    model_in = (
                        jnp.concatenate([lat, lat], axis=0) if guidance else lat
                    )
                    model_in = sampler.scale_model_input(model_in, i, tables)
                    t_b = jnp.broadcast_to(
                        tables.timesteps[i], (model_in.shape[0],)
                    )
                    eps = unet_apply(unet_params, model_in, t_b, context)
                    if guidance:
                        u, c = jnp.split(eps, 2, axis=0)
                        eps = u + guidance_scale * (c - u)
                    return sampler.step(lat, eps, i, tables)

                return jax.lax.cond(i < n, real, lambda l: l, lat), None

            out, _ = jax.lax.scan(body, latents, jnp.arange(max_steps))
            return out

        return jax.jit(denoise) if jit_wrap else denoise

    def _generate_fn_var(self, scheduler: str, guidance: bool, latent_shape,
                         chunk: int, max_steps: int):
        """Variable-steps single-program generate (see _generate_fn)."""
        denoise_raw = self._denoise_fn_var(
            scheduler, guidance, latent_shape, max_steps, jit_wrap=False
        )
        decode_raw = self._decode_fn(chunk, jit_wrap=False)

        def generate(unet_params, vae_params, key, context, guidance_scale,
                     tables, n):
            latents = denoise_raw(unet_params, key, context, guidance_scale,
                                  tables, n)
            return latents, decode_raw(vae_params, latents[0])

        return jax.jit(generate)

    def _generate_fn(self, num_steps: int, scheduler: str, guidance: bool,
                     latent_shape, chunk: int):
        """The WHOLE per-request sample path as ONE jitted program:
        noise -> CFG denoise scan -> chunked VAE decode -> uint8 frames.

        One device dispatch per generation instead of two (the tunnel
        charges a round trip per program; PERF.md methodology), and the
        latents never surface to the host between stages."""
        denoise_raw, _ = self._denoise_fn(
            num_steps, scheduler, guidance, latent_shape, jit_wrap=False
        )
        decode_raw = self._decode_fn(chunk, jit_wrap=False)

        def generate(unet_params, vae_params, key, context, guidance_scale):
            latents = denoise_raw(unet_params, key, context, guidance_scale)
            return latents, decode_raw(vae_params, latents[0])

        return jax.jit(generate)

    def encode_prompt(self, prompt: str, negative_prompt: str = "") -> jnp.ndarray:
        """-> [2, 77, D] context, ordered (uncond, cond) like the CFG split."""
        ids = self.tokenizer([negative_prompt or "", prompt])
        if "text_encode" not in self._compiled:
            self._compiled["text_encode"] = jax.jit(self.text_encoder.apply)
        return self._compiled["text_encode"](self.params["text"], jnp.asarray(ids))

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
        seed: Union[int, jax.Array] = 0,
        scheduler: Optional[str] = None,
        output_type: str = "pil",
        decode_chunk: int = 8,
    ) -> PipelineOutput:
        assert self.params is not None, "load or init params first"
        scheduler = scheduler or self.scheduler
        sampler = get_sampler(scheduler)
        ds = self.vae.config.downscale
        h, w = height // ds, width // ds
        guidance = guidance_scale > 1.0

        context = self.encode_prompt(
            prompt if isinstance(prompt, str) else prompt[0], negative_prompt
        )
        if not guidance:
            context = context[1:]

        if self.frame_shards > 1:
            assert num_frames % self.frame_shards == 0, (
                f"num_frames={num_frames} must divide over "
                f"frame_shards={self.frame_shards}"
            )
        latent_shape = (1, num_frames, h, w, self.unet.config.in_channels)
        if output_type == "latent":
            cache_key = ("denoise", num_inference_steps, scheduler, guidance,
                         latent_shape, context.shape, self.pab)
            if cache_key not in self._compiled:
                self._compiled[cache_key], _ = self._denoise_fn(
                    num_inference_steps, scheduler, guidance, latent_shape
                )
            latents = self._compiled[cache_key](
                self.params["unet"], as_key(seed), context,
                jnp.float32(guidance_scale),
            )
            return PipelineOutput(frames=[], latents=latents)

        local_frames = num_frames // self.frame_shards
        chunk = max(1, min(decode_chunk, local_frames))
        while local_frames % chunk:
            chunk -= 1
        use_var = (
            self.variable_steps > 0
            and self.pab is None
            and not scheduler.startswith("dpm")
            and num_inference_steps <= self.variable_steps
        )
        if use_var:
            from vdx.schedulers.common import pad_tables

            cache_key = ("var_generate", scheduler, guidance, latent_shape,
                         context.shape, chunk, self.variable_steps)
            if cache_key not in self._compiled:
                self._compiled[cache_key] = self._generate_fn_var(
                    scheduler, guidance, latent_shape, chunk,
                    self.variable_steps,
                )
            tables = pad_tables(
                get_sampler(scheduler).make_tables(num_inference_steps),
                num_inference_steps, self.variable_steps,
            )
            latents, frames_u8 = self._compiled[cache_key](
                self.params["unet"], self.params["vae"], as_key(seed),
                context, jnp.float32(guidance_scale), tables,
                jnp.int32(num_inference_steps),
            )
        else:
            cache_key = ("generate", num_inference_steps, scheduler, guidance,
                         latent_shape, context.shape, self.pab, chunk)
            if cache_key not in self._compiled:
                self._compiled[cache_key] = self._generate_fn(
                    num_inference_steps, scheduler, guidance, latent_shape,
                    chunk,
                )
            latents, frames_u8 = self._compiled[cache_key](
                self.params["unet"], self.params["vae"], as_key(seed), context,
                jnp.float32(guidance_scale),
            )
        frames_np = np.asarray(frames_u8)

        if output_type == "np":
            return PipelineOutput(frames=[frames_np], latents=latents)

        from PIL import Image

        pil = [Image.fromarray(f) for f in frames_np]
        return PipelineOutput(frames=[pil], latents=latents)


class AnimateDiffPipeline(VideoDiffusionPipeline):
    """SD-1.5 + motion modules (the reference's flagship pipeline)."""

    denoiser_cls = UNetMotion
    denoiser_config_cls = UNetMotionConfig
