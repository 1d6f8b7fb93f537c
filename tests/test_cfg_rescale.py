"""CFG std-rescale (guidance_rescale) — the Lin et al. overexposure fix.

Unit contract on ``schedulers.common.cfg_combine`` plus the pipeline-level
surface (``guidance_rescale=phi`` at construction, baked into the compiled
denoise program).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vdx.schedulers.common import cfg_combine


class TestCFGCombine:
    def _uc(self, seed=0, shape=(2, 3, 4, 4, 4)):
        rng = np.random.default_rng(seed)
        u = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        c = jnp.asarray(2.5 * rng.standard_normal(shape) + 0.3, jnp.float32)
        return u, c

    def test_phi_zero_is_plain_cfg(self):
        u, c = self._uc()
        out = cfg_combine(u, c, 7.5, 0.0)
        np.testing.assert_allclose(out, u + 7.5 * (c - u), rtol=1e-6)

    def test_phi_one_matches_cond_std(self):
        u, c = self._uc()
        out = np.asarray(cfg_combine(u, c, 7.5, 1.0), np.float64)
        cond = np.asarray(c, np.float64)
        for b in range(out.shape[0]):
            np.testing.assert_allclose(
                out[b].std(), cond[b].std(), rtol=1e-4
            )

    def test_phi_blend_is_linear(self):
        u, c = self._uc()
        g0 = np.asarray(cfg_combine(u, c, 7.5, 0.0), np.float64)
        g1 = np.asarray(cfg_combine(u, c, 7.5, 1.0), np.float64)
        gh = np.asarray(cfg_combine(u, c, 7.5, 0.5), np.float64)
        np.testing.assert_allclose(gh, 0.5 * g1 + 0.5 * g0, rtol=1e-5)

    def test_broadcast_guidance_vector(self):
        """SVD passes a per-frame guidance vector — cfg_combine must accept
        any scale that broadcasts against the latents."""
        u, c = self._uc(shape=(1, 4, 4, 4, 4))
        scale = jnp.linspace(1.0, 3.0, 4).reshape(1, 4, 1, 1, 1)
        out = cfg_combine(u, c, scale, 0.7)
        assert out.shape == u.shape and bool(jnp.isfinite(out).all())

    def test_dtype_preserved(self):
        u, c = self._uc()
        out = cfg_combine(u.astype(jnp.bfloat16), c.astype(jnp.bfloat16),
                          7.5, 0.7)
        assert out.dtype == jnp.bfloat16


class TestPipelineSurface:
    def test_rescale_changes_output_and_is_keyed(self):
        from vdx.core.dtypes import FP32_POLICY
        from vdx.models.clip_text import CLIPTextConfig
        from vdx.models.unet_motion import UNetMotionConfig
        from vdx.models.vae import VAEConfig
        from vdx.pipelines import AnimateDiffPipeline

        kw = dict(
            unet_config=UNetMotionConfig.tiny(),
            vae_config=VAEConfig.tiny(),
            text_config=CLIPTextConfig.tiny(),
            policy=FP32_POLICY,
            scheduler="ddim",
        )
        gen = dict(num_frames=2, height=64, width=64, num_inference_steps=4,
                   seed=3, output_type="np")
        plain = AnimateDiffPipeline.with_random_params(seed=0, **kw)
        fixed = AnimateDiffPipeline(guidance_rescale=0.7, **kw)
        fixed.params = plain.params
        a = plain("a corgi", **gen).frames[0]
        b = fixed("a corgi", **gen).frames[0]
        assert a.shape == b.shape
        assert not np.array_equal(a, b)
        # phi=0 pipeline is the plain program
        zero = AnimateDiffPipeline(guidance_rescale=0.0, **kw)
        zero.params = plain.params
        np.testing.assert_array_equal(a, zero("a corgi", **gen).frames[0])
