"""CogVideoX text-to-video pipeline (joint-attention DiT + 3D causal VAE).

Target config BASELINE.json configs[3]: 49 frames @ 480x720. T5 text states
-> DDIM denoise over the 3D DiT with CFG batched -> causal VAE decode
(temporal 4x + spatial 8x upsampling; frame count = 1 + 4*(F_latent-1)).
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vdx.core.dtypes import DEFAULT_POLICY, Policy
from vdx.core.rng import as_key
from vdx.models.cogvideox import (
    CausalVAEConfig,
    CausalVAEDecoder,
    CausalVAEEncoder,
    CogVideoXConfig,
    CogVideoXDiT,
)
from vdx.models.t5 import T5Config, T5Encoder
from vdx.models.tokenizer import FallbackBPETokenizer
from vdx.schedulers import get_sampler


@dataclasses.dataclass
class CogVideoXOutput:
    frames: List[Any]


class CogVideoXPipeline:
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
    ):
        self.dit = CogVideoXDiT(dit_config, policy=policy, attn_impl=attn_impl)
        self.vae_enc = CausalVAEEncoder(vae_config, policy=policy)
        self.vae_dec = CausalVAEDecoder(vae_config, policy=policy)
        self.vae_config = vae_config
        self.text_encoder = T5Encoder(t5_config, policy=policy)
        self.tokenizer = tokenizer or FallbackBPETokenizer()
        self.params = params
        self.policy = policy
        self.scheduler = scheduler
        self._compiled = {}

    @classmethod
    def with_random_params(cls, seed: int = 0, **kwargs):
        pipe = cls(**kwargs)
        pipe.params = pipe.init_params(seed)
        return pipe

    def init_params(self, seed: int = 0) -> dict:
        k = jax.random.PRNGKey(seed)
        cfg = self.dit.config
        sample = jnp.zeros((1, 2, 8, 8, cfg.in_channels))
        t = jnp.zeros((1,), jnp.int32)
        txt = jnp.zeros((1, cfg.max_text_len, cfg.text_dim))
        ids = jnp.zeros((1, 8), jnp.int32)
        vid = jnp.zeros((1, 5, 32, 32, 3))
        lat = jnp.zeros((1, 2, 4, 4, self.vae_config.latent_channels))
        shapes = {
            "dit": jax.eval_shape(self.dit.init, k, sample, t, txt),
            "t5": jax.eval_shape(self.text_encoder.init, k, ids),
            "vae_enc": jax.eval_shape(self.vae_enc.init, k, vid),
            "vae_dec": jax.eval_shape(self.vae_dec.init, k, lat),
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
                elif "scale" in name:
                    a = np.ones(leaf.shape)
                else:
                    a = np.zeros(leaf.shape)
                out.append(jnp.asarray(a.astype(np.float32), dtype=leaf.dtype))
            return jax.tree.unflatten(flat[1], out)

        return {k_: build(v) for k_, v in shapes.items()}

    def _sample_fn(self, num_steps, scheduler, latent_shape):
        sampler = get_sampler(scheduler)
        tables = sampler.make_tables(num_steps)
        dit = self.dit

        def run(params, key, text_states, guidance_scale):
            latents = (
                jax.random.normal(key, latent_shape, jnp.float32)
                * tables.init_noise_sigma
            )

            def body(lat, i):
                t = tables.timesteps[i]
                model_in = jnp.concatenate([lat, lat], axis=0)
                model_in = sampler.scale_model_input(model_in, i, tables)
                t_b = jnp.broadcast_to(t, (model_in.shape[0],))
                out = dit.apply(params["dit"], model_in, t_b, text_states)
                u, c = jnp.split(out, 2, axis=0)
                eps = u + guidance_scale * (c - u)
                return sampler.step(lat, eps, i, tables), None

            latents, _ = jax.lax.scan(body, latents, jnp.arange(num_steps))
            return latents

        return jax.jit(run)

    def __call__(
        self,
        prompt: str,
        negative_prompt: str = "",
        num_frames: int = 49,
        height: int = 480,
        width: int = 720,
        num_inference_steps: int = 50,
        guidance_scale: float = 6.0,
        seed=0,
        output_type: str = "np",
    ) -> CogVideoXOutput:
        assert self.params is not None
        cfg = self.vae_config
        sd = cfg.spatial_downscale
        td = cfg.temporal_downscale
        f_lat = 1 + (num_frames - 1) // td
        latent_shape = (1, f_lat, height // sd, width // sd,
                        self.dit.config.in_channels)

        ids = self.tokenizer([negative_prompt or "", prompt],
                             context_length=self.dit.config.max_text_len)
        ids = np.remainder(ids, self.text_encoder.config.vocab_size)
        if "t5" not in self._compiled:
            self._compiled["t5"] = jax.jit(self.text_encoder.apply)
        text_states = self._compiled["t5"](self.params["t5"], jnp.asarray(ids))

        key = ("sample", num_inference_steps, self.scheduler, latent_shape)
        if key not in self._compiled:
            self._compiled[key] = self._sample_fn(
                num_inference_steps, self.scheduler, latent_shape
            )
        latents = self._compiled[key](
            self.params, as_key(seed), text_states, jnp.float32(guidance_scale)
        )

        if "decode" not in self._compiled or self._compiled.get("decode_shape") != latents.shape:
            def dec(params, z):
                x = self.vae_dec.apply(params["vae_dec"], z / cfg.scaling_factor)
                x = jnp.clip(x.astype(jnp.float32) / 2 + 0.5, 0, 1)
                return jnp.round(x * 255).astype(jnp.uint8)

            self._compiled["decode"] = jax.jit(dec)
            self._compiled["decode_shape"] = latents.shape
        video = np.asarray(self._compiled["decode"](self.params, latents))[0]
        video = video[: num_frames]

        if output_type == "pil":
            from PIL import Image

            return CogVideoXOutput(frames=[[Image.fromarray(f) for f in video]])
        return CogVideoXOutput(frames=[video])
