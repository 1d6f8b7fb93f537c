"""Stable Video Diffusion img2vid pipeline — jit-compiled end to end.

Target config BASELINE.json configs[2]: 25 frames @ 576x1024, EDM sampler,
temporal VAE decode. The north-star workload ("25-frame 576x1024 img2vid in
<10 s on v5e-8").

Flow (the SVD recipe, TPU-shaped — reference drives the diffusers
StableVideoDiffusionPipeline equivalent; capability surface SURVEY.md §2b):
  image -> CLIP-vision embedding [B, 1, 1024] (+ zero embedding for CFG)
        -> VAE-encode, noise-augment -> per-frame conditioning latents
  latents [B, F, h, w, 4] ~ N(0, sigma_max^2)
  per step: concat(noisy, cond) channels -> UNetSpatioTemporal
            CFG with PER-FRAME guidance scale linspace(min_g, max_g, F)
            EDM preconditioning + Euler update  (one lax.scan under jit)
  temporal VAE decode, frame-tiled.

Built on the shared ``VideoDiffusionPipeline`` compiled core, so the
north-star pipeline inherits the framework's best machinery:
  * single-program generate (conditioning towers + noise + denoise scan +
    temporal decode in ONE dispatch)
  * ``frame_shards=n`` — frame-axis sequence parallelism: Ulysses all_to_all
    temporal blocks (default; ``seq_impl="ring"`` for KV-rotation ring
    attention) + halo'd temporal convs + shard-local chunked temporal decode
    (exact vs unsharded; tests/test_frame_parallel.py; comm analysis
    PERF.md)
  * ``variable_steps=N`` — one compile for every EDM step count
  * PAB turbo mode (EDM's step is stateless, so broadcast applies)
  * ``scheduler="dpm_edm"`` — DPM-Solver++(2M) on the same Karras grid:
    second-order trajectory accuracy at one UNet eval per step
    (schedulers/dpm_edm.py; accuracy margin measured in
    tests/test_svd.py::test_dpm_edm_tracks_fine_reference)
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from vdx.core.dtypes import DEFAULT_POLICY, Policy
from vdx.models.clip_vision import CLIPVisionConfig, CLIPVisionModel
from vdx.models.svd_unet import SVDUNetConfig, UNetSpatioTemporal
from vdx.models.vae import AutoencoderKL, TemporalDecoder, VAEConfig
from vdx.pipelines.base import PipelineOutput, VideoDiffusionPipeline

SVDOutput = PipelineOutput  # back-compat alias


class SVDImg2VidPipeline(VideoDiffusionPipeline):
    denoiser_cls = UNetSpatioTemporal
    denoiser_config_cls = SVDUNetConfig
    n_denoiser_cond = 2  # image_embeds, added_time_ids
    guidance_always = True  # per-frame guidance vector mixes cond/uncond

    def __init__(
        self,
        unet_config: SVDUNetConfig = SVDUNetConfig(),
        vae_config: VAEConfig = VAEConfig(),
        vision_config: CLIPVisionConfig = CLIPVisionConfig(),
        params: Optional[dict] = None,
        policy: Policy = DEFAULT_POLICY,
        attn_impl: str = "auto",
        scheduler: str = "edm",
        pab=None,
        skip=None,
        context=None,
        frame_shards: int = 1,
        seq_impl: str = "ulysses",
        mesh=None,
        variable_steps: int = 0,
        progress=None,
        guidance_rescale: float = 0.0,
        sampler_configs=None,
        freeu=None,
    ):
        unet_kwargs = dict(policy=policy, attn_impl=attn_impl)
        if pab is not None:
            unet_kwargs["pab"] = True
        if freeu is not None:
            unet_kwargs["freeu"] = freeu
        self.unet = UNetSpatioTemporal(unet_config, **unet_kwargs)
        self.vae = AutoencoderKL(vae_config, policy=policy)
        self.temporal_decoder = TemporalDecoder(vae_config, policy=policy)
        self.vision = CLIPVisionModel(vision_config, policy=policy)
        self.params = params
        self._init_core(
            unet_config, policy=policy, scheduler=scheduler,
            attn_impl=attn_impl, pab=pab, skip=skip, context=context,
            frame_shards=frame_shards,
            seq_impl=seq_impl, mesh=mesh, variable_steps=variable_steps,
            progress=progress, guidance_rescale=guidance_rescale,
            sampler_configs=sampler_configs, freeu=freeu,
        )

    # ------------------------------------------------------------------
    # Core hooks
    # ------------------------------------------------------------------
    @property
    def latent_channels(self) -> int:
        # denoised latents are 4-channel; the UNet input is
        # concat(noisy, conditioning) = 8
        return self.unet.config.out_channels

    def _init_calls(self, seed: int) -> dict:
        k = jax.random.PRNGKey(seed)
        vs = self.vision.config.image_size
        sample = jnp.zeros((1, 2, 8, 8, self.unet.config.in_channels))
        t = jnp.zeros((1,))
        emb = jnp.zeros((1, 1, self.unet.config.cross_attention_dim))
        aids = jnp.zeros((1, 3))
        return {
            "unet": (self.unet.init, (k, sample, t, emb, aids)),
            "vae": (self.vae.init, (k, jnp.zeros((1, 64, 64, 3)))),
            "tdec": (
                lambda kk, z: self.temporal_decoder.init(kk, z, 2),
                (k, jnp.zeros((2, 8, 8, 4))),
            ),
            "vision": (self.vision.init, (k, jnp.zeros((1, vs, vs, 3)))),
        }

    def _conversion_rules(self) -> dict:
        from vdx.core import convert as C

        return {
            "unet": (C.svd_unet_rules(self.unet.config), ()),
            "vae": (C.vae_rules(self.vae.config), ()),
            "tdec": (C.temporal_decoder_rules(self.vae.config), ()),
            "vision": (C.clip_vision_rules(self.vision.config), ()),
        }

    def _prepare_cond(self, params, key, cond, latent_shape) -> dict:
        """Image conditioning INSIDE the program: VAE-encode + noise-augment
        the conditioning frame, CLIP-vision embed, micro-condition ids."""
        image, fps, motion_bucket_id, noise_aug = cond
        B, F = latent_shape[0], latent_shape[1]
        k_noise, k_aug = jax.random.split(key)
        moments = self.vae.apply(params["vae"], image, method=self.vae.encode_moments)
        cond_lat, _ = jnp.split(moments, 2, axis=-1)  # mean, no sampling
        cond_lat = cond_lat + noise_aug * jax.random.normal(
            k_aug, cond_lat.shape, dtype=cond_lat.dtype
        )
        # NOTE: SVD conditions on UNSCALED latents for the concat path
        cond_frames = jnp.broadcast_to(
            cond_lat[:, None], (B, F) + cond_lat.shape[1:]
        )

        image_embeds = self.vision.apply(
            params["vision"], _resize_to_vision(image, self.vision.config)
        )[:, None, :]
        embeds = jnp.concatenate(
            [jnp.zeros_like(image_embeds), image_embeds], axis=0
        )
        concat = jnp.concatenate(
            [jnp.zeros_like(cond_frames), cond_frames], axis=0
        )

        aids = jnp.stack([fps, motion_bucket_id, noise_aug])[None]
        aids = jnp.concatenate([aids, aids], axis=0)
        return {"den_args": (embeds, aids), "concat": concat, "key": k_noise}

    def _decode_raw(self, chunk: int, spatial_tile: int = 0,
                    tile_overlap: int = 8):
        """Temporal-VAE decode. Frame chunks decode independently, so this
        stage is chunk-local over frames — exactly what makes shard-local
        decode under ``frame_shards`` legal."""
        tdec = self.temporal_decoder
        upscale = self.vae.config.downscale

        def decode(params, latents):  # [B, F, h, w, 4]
            B, F = latents.shape[:2]
            z = latents.reshape(B * F // chunk, chunk, *latents.shape[2:])

            def dec(c):
                if spatial_tile:
                    # peak decoder memory = ONE spatial tile (models/vae.py)
                    from vdx.models.vae import decode_spatial_tiled

                    return decode_spatial_tiled(
                        lambda zz: tdec.apply(params["tdec"], zz, chunk),
                        c, upscale, tile=spatial_tile, overlap=tile_overlap,
                    )
                return tdec.apply(params["tdec"], c, chunk)

            imgs = jax.lax.map(dec, z)
            imgs = imgs.reshape(B, F, *imgs.shape[2:])
            from vdx.pipelines.base import _to_uint8

            return _to_uint8(imgs)

        return decode

    # ------------------------------------------------------------------
    def __call__(
        self,
        image: np.ndarray,  # [H, W, 3] float in [0,1]
        num_frames: int = 25,
        height: int = 576,
        width: int = 1024,
        num_inference_steps: int = 25,
        min_guidance_scale: float = 1.0,
        max_guidance_scale: float = 3.0,
        fps: int = 7,
        motion_bucket_id: int = 127,
        noise_aug_strength: float = 0.02,
        seed: Union[int, jax.Array, Sequence[int]] = 0,
        decode_chunk: int = 5,
        decode_spatial_tile: int = 0,  # latent px; 0 = untiled
        output_type: str = "np",
        scheduler: Optional[str] = None,
        dispatch_steps: int = 0,  # chunked dispatch (tunnel's ~55 s ceiling)
    ) -> PipelineOutput:
        assert self.params is not None
        scheduler = scheduler or self.scheduler
        ds = self.vae.config.downscale
        latent_shape = (1, num_frames, height // ds, width // ds,
                        self.latent_channels)

        img = jnp.asarray(image, jnp.float32)[None] * 2.0 - 1.0  # [-1,1] for VAE
        cond = (
            img,
            jnp.float32(fps - 1),
            jnp.float32(motion_bucket_id),
            jnp.float32(noise_aug_strength),
        )
        # per-frame CFG scale (the SVD recipe): linspace over the clip
        g = np.linspace(min_guidance_scale, max_guidance_scale, num_frames,
                        dtype=np.float32).reshape(1, num_frames, 1, 1, 1)

        decode_opts = {}
        if decode_spatial_tile:
            decode_opts = {"spatial_tile": decode_spatial_tile}
        return self._run_generate(
            cond=cond, guidance_arr=jnp.asarray(g), guidance=True,
            latent_shape=latent_shape, scheduler=scheduler,
            num_inference_steps=num_inference_steps, seed=seed,
            decode_chunk=decode_chunk, decode_opts=decode_opts,
            output_type=output_type, latent_only=(output_type == "latent"),
            dispatch_steps=dispatch_steps,
        )


def _resize_to_vision(image: jnp.ndarray, cfg: CLIPVisionConfig) -> jnp.ndarray:
    """[-1,1] image -> [0,1] resized to the vision tower's input size."""
    x = jnp.clip(image / 2 + 0.5, 0, 1)
    return jax.image.resize(
        x, (x.shape[0], cfg.image_size, cfg.image_size, x.shape[-1]), "bilinear"
    )
