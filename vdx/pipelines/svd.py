"""Stable Video Diffusion img2vid pipeline — jit-compiled end to end.

Target config BASELINE.json configs[2]: 25 frames @ 576x1024, EDM sampler,
temporal VAE decode. The north-star workload ("25-frame 576x1024 img2vid in
<10 s on v5e-8").

Flow (the SVD recipe, TPU-shaped):
  image -> CLIP-vision embedding [B, 1, 1024] (+ zero embedding for CFG)
        -> VAE-encode, noise-augment -> per-frame conditioning latents
  latents [B, F, h, w, 4] ~ N(0, sigma_max^2)
  per step: concat(noisy, cond) channels -> UNetSpatioTemporal
            CFG with PER-FRAME guidance scale linspace(min_g, max_g, F)
            EDM preconditioning + Euler update  (one lax.scan under jit)
  temporal VAE decode, frame-tiled.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vdx.core.dtypes import DEFAULT_POLICY, Policy
from vdx.core.rng import as_key
from vdx.models.clip_vision import CLIPVisionConfig, CLIPVisionModel
from vdx.models.svd_unet import SVDUNetConfig, UNetSpatioTemporal
from vdx.models.vae import AutoencoderKL, TemporalDecoder, VAEConfig
from vdx.schedulers import edm


@dataclasses.dataclass
class SVDOutput:
    frames: List[Any]


class SVDImg2VidPipeline:
    def __init__(
        self,
        unet_config: SVDUNetConfig = SVDUNetConfig(),
        vae_config: VAEConfig = VAEConfig(),
        vision_config: CLIPVisionConfig = CLIPVisionConfig(),
        params: Optional[dict] = None,
        policy: Policy = DEFAULT_POLICY,
        attn_impl: str = "auto",
    ):
        self.unet = UNetSpatioTemporal(unet_config, policy=policy, attn_impl=attn_impl)
        self.vae = AutoencoderKL(vae_config, policy=policy)
        self.temporal_decoder = TemporalDecoder(vae_config, policy=policy)
        self.vision = CLIPVisionModel(vision_config, policy=policy)
        self.params = params
        self.policy = policy
        self._compiled = {}

    @classmethod
    def with_random_params(cls, seed: int = 0, **kwargs) -> "SVDImg2VidPipeline":
        pipe = cls(**kwargs)
        pipe.params = pipe.init_params(seed)
        return pipe

    def init_params(self, seed: int = 0) -> dict:
        """Host-side fast init (see base pipeline rationale)."""
        k = jax.random.PRNGKey(seed)
        vs = self.vision.config.image_size
        sample = jnp.zeros((1, 2, 8, 8, self.unet.config.in_channels))
        t = jnp.zeros((1,))
        emb = jnp.zeros((1, 1, self.unet.config.cross_attention_dim))
        aids = jnp.zeros((1, 3))
        shapes = {
            "unet": jax.eval_shape(self.unet.init, k, sample, t, emb, aids),
            "vae": jax.eval_shape(self.vae.init, k, jnp.zeros((1, 64, 64, 3))),
            "tdec": jax.eval_shape(
                lambda kk, z: self.temporal_decoder.init(kk, z, 2),
                k, jnp.zeros((2, 8, 8, 4)),
            ),
            "vision": jax.eval_shape(
                self.vision.init, k, jnp.zeros((1, vs, vs, 3))
            ),
        }
        rng = np.random.default_rng(seed)

        def build(tree):
            flat = jax.tree_util.tree_flatten_with_path(tree)
            out = []
            for path, leaf in flat[0]:
                name = str(getattr(path[-1], "key", path[-1])).lower()
                if len(leaf.shape) >= 2:
                    fan_in = int(np.prod(leaf.shape[:-1]))
                    a = rng.standard_normal(leaf.shape) * (1.0 / max(fan_in, 1)) ** 0.5
                elif "scale" in name or "mix_factor" in name:
                    a = np.ones(leaf.shape) * (0.5 if "mix" in name else 1.0)
                else:
                    a = np.zeros(leaf.shape)
                out.append(jnp.asarray(a.astype(np.float32), dtype=leaf.dtype))
            return jax.tree.unflatten(flat[1], out)

        return {k_: build(v) for k_, v in shapes.items()}

    # ------------------------------------------------------------------
    def _sample_fn(self, num_steps, latent_shape, min_g, max_g):
        unet = self.unet
        vae = self.vae
        tables = edm.make_tables(num_steps)
        F = latent_shape[1]
        g_scales = jnp.linspace(min_g, max_g, F)[None, :, None, None, None]

        def run(params, key, image, fps, motion_bucket_id, noise_aug):
            # conditioning: VAE-encode the image, noise-augment
            k_noise, k_aug = jax.random.split(key)
            moments = vae.apply(params["vae"], image, method=vae.encode_moments)
            cond_lat, _ = jnp.split(moments, 2, axis=-1)  # mean, no sampling
            cond_lat = cond_lat + noise_aug * jax.random.normal(
                k_aug, cond_lat.shape, dtype=cond_lat.dtype
            )
            # NOTE: SVD conditions on UNSCALED latents for the concat path
            cond = jnp.broadcast_to(
                cond_lat[:, None], (latent_shape[0],) + (F,) + cond_lat.shape[1:]
            )

            image_embeds = self.vision.apply(
                params["vision"], _resize_to_vision(image, self.vision.config)
            )[:, None, :]
            zero_embeds = jnp.zeros_like(image_embeds)
            embeds = jnp.concatenate([zero_embeds, image_embeds], axis=0)
            conds = jnp.concatenate([jnp.zeros_like(cond), cond], axis=0)

            aids = jnp.stack([fps, motion_bucket_id, noise_aug])[None]
            aids = jnp.concatenate([aids, aids], axis=0)

            latents = (
                jax.random.normal(k_noise, latent_shape, jnp.float32)
                * tables.init_noise_sigma
            )

            def body(lat, i):
                sigma = tables.sigmas[i]
                t = tables.timesteps[i]
                model_in = jnp.concatenate([lat, lat], axis=0)
                model_in = model_in / jnp.sqrt(sigma**2 + 1.0)  # c_in
                model_in = jnp.concatenate([model_in, conds], axis=-1)
                t_b = jnp.broadcast_to(t, (model_in.shape[0],))
                out = unet.apply(params["unet"], model_in, t_b, embeds, aids)
                out_uncond, out_cond = jnp.split(out, 2, axis=0)
                out = out_uncond + g_scales * (out_cond - out_uncond)
                lat = edm.step(lat, out, i, tables)
                return lat, None

            latents, _ = jax.lax.scan(body, latents, jnp.arange(num_steps))
            return latents

        return jax.jit(run)

    def _decode_fn(self, chunk, num_frames, spatial_tile: int = 0,
                   tile_overlap: int = 8):
        tdec = self.temporal_decoder
        upscale = self.vae.config.downscale

        def decode(params, latents):  # [F, h, w, 4]
            z = latents.reshape(-1, chunk, *latents.shape[1:])

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
            imgs = imgs.reshape(-1, *imgs.shape[2:])
            imgs = jnp.clip(imgs.astype(jnp.float32) / 2 + 0.5, 0, 1)
            return jnp.round(imgs * 255).astype(jnp.uint8)

        return jax.jit(decode)

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
        seed=0,
        decode_chunk: int = 5,
        decode_spatial_tile: int = 0,  # latent px; 0 = untiled
        output_type: str = "np",
    ) -> SVDOutput:
        assert self.params is not None
        ds = self.vae.config.downscale
        latent_shape = (1, num_frames, height // ds, width // ds,
                        self.unet.config.out_channels)

        img = jnp.asarray(image, jnp.float32)[None] * 2.0 - 1.0  # [-1,1] for VAE
        key = ("svd", num_inference_steps, latent_shape,
               float(min_guidance_scale), float(max_guidance_scale))
        if key not in self._compiled:
            self._compiled[key] = self._sample_fn(
                num_inference_steps, latent_shape,
                min_guidance_scale, max_guidance_scale,
            )
        latents = self._compiled[key](
            self.params, as_key(seed), img,
            jnp.float32(fps - 1), jnp.float32(motion_bucket_id),
            jnp.float32(noise_aug_strength),
        )

        chunk = max(1, min(decode_chunk, num_frames))
        while num_frames % chunk:
            chunk -= 1
        dkey = ("svd_dec", chunk, latents.shape, decode_spatial_tile)
        if dkey not in self._compiled:
            self._compiled[dkey] = self._decode_fn(
                chunk, num_frames, spatial_tile=decode_spatial_tile)
        # temporal decoder expects pre-scaled latents (it divides internally)
        frames = np.asarray(self._compiled[dkey](self.params, latents[0]))

        if output_type == "pil":
            from PIL import Image

            return SVDOutput(frames=[[Image.fromarray(f) for f in frames]])
        return SVDOutput(frames=[frames])


def _resize_to_vision(image: jnp.ndarray, cfg: CLIPVisionConfig) -> jnp.ndarray:
    """[-1,1] image -> [0,1] resized to the vision tower's input size."""
    x = jnp.clip(image / 2 + 0.5, 0, 1)
    return jax.image.resize(
        x, (x.shape[0], cfg.image_size, cfg.image_size, x.shape[-1]), "bilinear"
    )
