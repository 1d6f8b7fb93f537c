"""CogVideoX text-to-video pipeline (joint-attention DiT + 3D causal VAE).

Target config BASELINE.json configs[3]: 49 frames @ 480x720. T5 text states
-> DDIM denoise over the 3D DiT with CFG batched -> causal VAE decode
(temporal 4x + spatial 8x upsampling; frame count = 1 + 4*(F_latent-1)).

Built on the shared ``VideoDiffusionPipeline`` compiled core: single-program
generate (denoise scan + causal decode in one dispatch), ``variable_steps``,
and PAB turbo mode come from the base. PAB here broadcasts the JOINT
text+video attention output (``PABConfig.joint_interval``) — the family's
single attention type and exactly the DiT regime the PAB technique targets;
the spatial/temporal/cross intervals have no sites in this model.
``frame_shards`` is NOT supported: the DiT attends jointly over
text+all-frame tokens, so there is no frame-local/ring split of its
attention (the UNet families' temporal-only communication pattern does not
apply); scaling CogVideoX runs means data parallelism over requests instead.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from vdx.core.dtypes import DEFAULT_POLICY, Policy
from vdx.models.cogvideox import (
    CausalVAEConfig,
    CausalVAEDecoder,
    CausalVAEEncoder,
    CogVideoXConfig,
    CogVideoXDiT,
)
from vdx.models.t5 import T5Config, T5Encoder
from vdx.models.tokenizer import FallbackBPETokenizer
from vdx.pipelines.base import PipelineOutput, VideoDiffusionPipeline, _to_uint8

CogVideoXOutput = PipelineOutput  # back-compat alias


class CogVideoXPipeline(VideoDiffusionPipeline):
    denoiser_cls = CogVideoXDiT
    denoiser_config_cls = CogVideoXConfig
    denoiser_param_key = "dit"
    guidance_always = True
    supports_frame_shards = False  # joint text+video attention (see module doc)
    #: joint attention entangles every frame with the text tokens — a frame
    #: window would silently change what the text attends over
    supports_context = False

    def __init__(
        self,
        dit_config: CogVideoXConfig = CogVideoXConfig(),
        vae_config: CausalVAEConfig = CausalVAEConfig(),
        t5_config: T5Config = T5Config(),
        params: Optional[dict] = None,
        tokenizer=None,
        policy: Policy = DEFAULT_POLICY,
        scheduler: str = "ddim",
        attn_impl: str = "auto",
        pab=None,  # PABConfig: joint-attention broadcast turbo mode
        skip=None,  # SkipConfig: adaptive step-skip turbo mode
        variable_steps: int = 0,
        frame_shards: int = 1,
        mesh=None,
        progress=None,
        offload_text_encoder: bool = False,
        guidance_rescale: float = 0.0,
        sampler_configs=None,
        freeu=None,
    ):
        if freeu is not None:
            # Same friendly rejection as VideoDiffusionPipeline.__init__:
            # a DiT has no backbone/skip split to re-weight.
            raise ValueError(
                "CogVideoXDiT has no skip-connection up path — FreeU "
                "does not apply"
            )
        self.dit = CogVideoXDiT(dit_config, policy=policy, attn_impl=attn_impl,
                                pab=pab is not None)
        self.unet = self.dit  # the core's denoiser handle
        self.vae_enc = CausalVAEEncoder(vae_config, policy=policy)
        self.vae_dec = CausalVAEDecoder(vae_config, policy=policy)
        self.vae_config = vae_config
        self.text_encoder = T5Encoder(t5_config, policy=policy)
        self.tokenizer = tokenizer or FallbackBPETokenizer()
        self.params = params
        # Single-chip HBM arithmetic at the headline shape: T5-XXL params
        # are 9.4 GB bf16, and text encoding is a separate pre-pass — with
        # DiT (3.4 GB) + VAEs + generate-program activations they don't
        # co-fit in 16 GB (measured ResourceExhausted). offload=True keeps
        # the T5 tree on the host, uploads it as ONE device_put per encode
        # (cache below amortises repeats), and frees the HBM before the
        # generate program runs — the TPU analogue of the reference's
        # enable_model_cpu_offload (reference 05:144).
        self.offload_text_encoder = offload_text_encoder
        self._t5_host = None
        self._text_cache: dict = {}
        if sampler_configs is None:
            # CogVideoX's published DDIM semantics (diffusers
            # CogVideoXDDIMScheduler): v-prediction on a scaled_linear beta
            # grid with the SNR shift (s=3) and the zero-terminal-SNR
            # rescale of Lin et al. — NOT the SD-1.5 epsilon defaults.
            # Trailing spacing is part of the zero-SNR recipe (the rescaled
            # t=999 node must actually be sampled first, Lin et al. §4).
            # Override per checkpoint via ``sampler_configs``.
            from vdx.schedulers.common import ScheduleConfig
            from vdx.schedulers.ddim import DDIMConfig
            from vdx.schedulers.dpm import DPMConfig

            _sched = ScheduleConfig(
                beta_schedule="scaled_linear",
                prediction_type="v_prediction",
                snr_shift_scale=3.0,
                rescale_zero_snr=True,
            )
            sampler_configs = {
                "ddim": DDIMConfig(
                    schedule=_sched,
                    steps_offset=0,
                    set_alpha_to_one=True,
                    timestep_spacing="trailing",
                ),
                # the family's published fast sampler (CogVideoXDPMScheduler
                # semantics: same schedule through DPM-Solver++(2M))
                "dpm": DPMConfig(schedule=_sched, steps_offset=0),
            }
        self._init_core(
            dit_config, policy=policy, scheduler=scheduler,
            attn_impl=attn_impl, pab=pab, skip=skip,
            frame_shards=frame_shards,
            mesh=mesh, variable_steps=variable_steps, progress=progress,
            guidance_rescale=guidance_rescale,
            sampler_configs=sampler_configs,
        )

    # ------------------------------------------------------------------
    # Core hooks
    # ------------------------------------------------------------------
    @property
    def latent_channels(self) -> int:
        return self.dit.config.in_channels

    def _init_calls(self, seed: int) -> dict:
        k = jax.random.PRNGKey(seed)
        cfg = self.dit.config
        sample = jnp.zeros((1, 2, 8, 8, cfg.in_channels))
        t = jnp.zeros((1,), jnp.int32)
        txt = jnp.zeros((1, cfg.max_text_len, cfg.text_dim))
        ids = jnp.zeros((1, 8), jnp.int32)
        vid = jnp.zeros((1, 5, 32, 32, 3))
        lat = jnp.zeros((1, 2, 4, 4, self.vae_config.latent_channels))
        return {
            "dit": (self.dit.init, (k, sample, t, txt)),
            "t5": (self.text_encoder.init, (k, ids)),
            "vae_enc": (self.vae_enc.init, (k, vid)),
            "vae_dec": (self.vae_dec.init, (k, lat)),
        }

    def _decode_raw(self, chunk: int, spatial_tile: int = 0,
                    tile_overlap: int = 8, trim: int = 0):
        """Causal 3D VAE decode — temporally causal over the WHOLE latent
        clip, so it is not chunkable over frames (chunk is ignored).

        ``trim``: keep only the first N decoded frames INSIDE the program
        (the causal decoder emits 1 + td*(f_lat-1) frames; the request asks
        for num_frames). In-program trimming keeps output_type="device"
        a single dispatch and shrinks the D2H readback.

        ``spatial_tile`` (latent px): overlap-blended spatial tiling —
        REQUIRED at the headline 49f @480x720 shape, where the untiled
        decoder's pre-output feature map is bf16[1,52,480,720,256] =
        18.4 GB > one chip's HBM (measured; the diffusers counterpart needs
        enable_tiling() there for the same reason). Peak memory becomes
        ONE tile column through the decoder."""
        cfg = self.vae_config
        vae_dec = self.vae_dec

        def decode(params, latents):  # [B, f_lat, h, w, C]
            z = latents / cfg.scaling_factor
            if spatial_tile:
                from vdx.models.vae import decode_spatial_tiled

                B, f_lat = z.shape[:2]

                def dec_flat(zt):  # [B*f_lat, t, t, C] -> [B*F_out, T, T, 3]
                    zz = zt.reshape(B, f_lat, *zt.shape[1:])
                    x = vae_dec.apply(params["vae_dec"], zz)
                    return x.reshape((B * x.shape[1],) + x.shape[2:])

                x = decode_spatial_tiled(
                    dec_flat, z.reshape((B * f_lat,) + z.shape[2:]),
                    cfg.spatial_downscale, tile=spatial_tile,
                    overlap=tile_overlap,
                )
                x = x.reshape((B, -1) + x.shape[1:])
                if trim:
                    x = x[:, :trim]
                return _to_uint8(x)
            x = vae_dec.apply(params["vae_dec"], z)
            if trim:
                x = x[:, :trim]
            return _to_uint8(x)

        return decode

    def _conversion_rules(self) -> dict:
        from vdx.core import convert as C

        return {
            "dit": (C.cogvideox_dit_rules(self.dit.config), ()),
            "t5": (C.t5_encoder_rules(self.text_encoder.config), ()),
            "vae_enc": (C.causal_vae_encoder_rules(self.vae_config), ()),
            "vae_dec": (C.causal_vae_decoder_rules(self.vae_config), ()),
        }

    def load_pretrained(self, sources: dict, strict: bool = True) -> dict:
        # Re-merge an already-offloaded T5 tree so the template is complete,
        # then drop the stale host copy + prompt cache — the next encode
        # re-offloads from the NEW weights.
        if self._t5_host is not None and "t5" not in (self.params or {}):
            self.params = {**(self.params or {}), "t5": self._t5_host}
        self._t5_host = None
        self._text_cache.clear()
        return super().load_pretrained(sources, strict=strict)

    def save_checkpoint(self, path) -> None:
        """Re-merge the host-offloaded T5 tree so checkpoints stay complete."""
        from vdx.core.checkpoint import save_params

        params = dict(self.params or {})
        if self._t5_host is not None and "t5" not in params:
            params["t5"] = self._t5_host
        save_params(params, path)

    def encode_prompt(
        self, prompt: Union[str, Sequence[str]], negative_prompt: str = ""
    ) -> jnp.ndarray:
        """T5 text states [2B, S, D], ordered (uncond x B, cond x B).

        With ``offload_text_encoder`` the T5 tree lives on the host; it is
        uploaded as one tree device_put per MISS of the prompt cache, and
        its device buffers are released before returning."""
        prompts = [prompt] if isinstance(prompt, str) else list(prompt)
        key = (tuple(prompts), negative_prompt or "")
        if self.offload_text_encoder and key in self._text_cache:
            return self._text_cache[key]
        ids = self.tokenizer(
            [negative_prompt or ""] * len(prompts) + prompts,
            context_length=self.dit.config.max_text_len,
        )
        ids = np.remainder(ids, self.text_encoder.config.vocab_size)
        if "t5" not in self._compiled:
            self._compiled["t5"] = jax.jit(self.text_encoder.apply)
        if not self.offload_text_encoder:
            return self._compiled["t5"](self.params["t5"], jnp.asarray(ids))
        if self._t5_host is None:
            # first use: pull the tree to the host and DROP the device copy
            # (self.params must stop referencing it or HBM never frees; the
            # generate program's jit also must not see it as an input)
            self._t5_host = jax.device_get(self.params["t5"])
            self.params = {k: v for k, v in self.params.items() if k != "t5"}
        t5_dev = jax.device_put(self._t5_host)  # ONE tree put (PERF.md)
        states = self._compiled["t5"](t5_dev, jnp.asarray(ids))
        states.block_until_ready()
        del t5_dev  # refs dropped -> 9.4 GB of HBM back before generate
        if len(self._text_cache) > 16:
            self._text_cache.clear()
        self._text_cache[key] = states
        return states

    # ------------------------------------------------------------------
    def __call__(
        self,
        prompt: Union[str, Sequence[str]],
        negative_prompt: str = "",
        num_frames: int = 49,
        height: int = 480,
        width: int = 720,
        num_inference_steps: int = 50,
        guidance_scale: float = 6.0,
        dynamic_cfg: bool = False,
        seed: Union[int, jax.Array, Sequence[int]] = 0,
        output_type: str = "np",
        scheduler: Optional[str] = None,
        decode_spatial_tile: int = 0,  # latent px; 0 = untiled
        decode_tile_overlap: int = 8,
        dispatch_steps: int = 0,  # chunked dispatch (tunnel ~55 s ceiling)
    ) -> PipelineOutput:
        assert self.params is not None
        scheduler = scheduler or self.scheduler
        if dynamic_cfg:
            # cosine^5 ramp 1 -> guidance_scale over the steps (the
            # published CogVideoX use_dynamic_cfg recipe; per-step
            # mechanism in the base denoise program)
            from vdx.schedulers.common import dynamic_cfg_schedule

            guidance_scale = dynamic_cfg_schedule(
                float(guidance_scale), num_inference_steps
            )
        cfg = self.vae_config
        f_lat = 1 + (num_frames - 1) // cfg.temporal_downscale
        B = 1 if isinstance(prompt, str) else len(prompt)
        latent_shape = (B, f_lat, height // cfg.spatial_downscale,
                        width // cfg.spatial_downscale, self.latent_channels)

        decode_opts = {"trim": num_frames}
        if decode_spatial_tile:
            decode_opts.update(spatial_tile=decode_spatial_tile,
                               tile_overlap=decode_tile_overlap)
        text_states = self.encode_prompt(prompt, negative_prompt)
        out = self._run_generate(
            cond=text_states, guidance_arr=jnp.float32(guidance_scale),
            guidance=True, latent_shape=latent_shape, scheduler=scheduler,
            num_inference_steps=num_inference_steps, seed=seed,
            decode_chunk=f_lat,
            output_type="device" if output_type == "device" else "np",
            decode_opts=decode_opts,
            latent_only=(output_type == "latent"),
            dispatch_steps=dispatch_steps,
        )
        if output_type in ("latent", "device"):
            return out
        # frame trim to the request count happens inside the decode program
        videos = out.frames
        if output_type == "pil":
            from PIL import Image

            return PipelineOutput(
                frames=[[Image.fromarray(f) for f in v] for v in videos],
                latents=out.latents,
            )
        return PipelineOutput(frames=videos, latents=out.latents)
