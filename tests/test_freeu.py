"""FreeU (training-free backbone/skip re-weighting) — nn/freeu.py.

Weight-independent mechanics, so everything here is exactly testable on
random tiny params: the filter algebra, the identity configs, the effect
on the UNet forward, the pipeline surface, and the DiT rejection.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vdx.core.dtypes import FP32_POLICY
from vdx.core.init import fast_init
from vdx.models.unet_motion import UNetMotion, UNetMotionConfig
from vdx.nn.freeu import FreeUConfig, apply_freeu, fourier_filter

IDENTITY = FreeUConfig(b1=1.0, b2=1.0, s1=1.0, s2=1.0)


class TestFourierFilter:
    def test_scale_one_is_identity(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3))
        # scale == 1.0 short-circuits before the FFT: bit-exact identity
        np.testing.assert_array_equal(
            np.asarray(fourier_filter(x, 1, 1.0)), np.asarray(x)
        )

    def test_scales_only_the_dc_band(self):
        """threshold=1 touches exactly the zero-frequency bin row/col box:
        a constant map is scaled by s; a pure high-frequency map is not."""
        const = jnp.ones((1, 8, 8, 1))
        out = fourier_filter(const, 1, 0.25)
        np.testing.assert_allclose(np.asarray(out), 0.25, atol=1e-5)

        # Nyquist checkerboard lives far from the centered DC box
        ii, jj = jnp.meshgrid(jnp.arange(8), jnp.arange(8), indexing="ij")
        checker = ((-1.0) ** (ii + jj))[None, :, :, None]
        out = fourier_filter(checker, 1, 0.25)
        np.testing.assert_allclose(np.asarray(out), np.asarray(checker), atol=1e-5)

    def test_preserves_dtype(self):
        x = jnp.ones((1, 4, 4, 2), dtype=jnp.bfloat16)
        assert fourier_filter(x, 1, 0.5).dtype == jnp.bfloat16


class TestApplyFreeU:
    def test_identity_config(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 6))
        skip = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
        x2, s2 = apply_freeu(0, x, skip, IDENTITY)
        np.testing.assert_array_equal(np.asarray(x2), np.asarray(x))
        np.testing.assert_array_equal(np.asarray(s2), np.asarray(skip))

    def test_late_stages_untouched(self):
        x = jnp.ones((1, 4, 4, 4))
        skip = jnp.ones((1, 4, 4, 2))
        for stage in (2, 3):
            x2, s2 = apply_freeu(stage, x, skip, FreeUConfig())
            assert x2 is x and s2 is skip

    def test_backbone_half_scaled(self):
        x = jnp.ones((1, 4, 4, 4))
        skip = jnp.ones((1, 4, 4, 2))
        x2, _ = apply_freeu(1, x, skip, FreeUConfig(b2=2.0, s2=1.0))
        np.testing.assert_allclose(np.asarray(x2[..., :2]), 2.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(x2[..., 2:]), 1.0, atol=1e-6)


@pytest.fixture(scope="module")
def tiny_inputs():
    cfg = UNetMotionConfig.tiny()
    sample = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 8, 8, 4))
    t = jnp.asarray([500])
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 7, cfg.cross_attention_dim))
    params = fast_init(UNetMotion(cfg, policy=FP32_POLICY), sample, t, ctx, seed=2)
    return cfg, params, sample, t, ctx


class TestUNetFreeU:
    def test_identity_config_matches_baseline_exactly(self, tiny_inputs):
        """b=1, s=1 must reproduce the plain program bit-for-bit (the
        identity filter short-circuits before the FFT)."""
        cfg, params, sample, t, ctx = tiny_inputs
        base = jax.jit(UNetMotion(cfg, policy=FP32_POLICY).apply)(
            params, sample, t, ctx
        )
        free = jax.jit(
            UNetMotion(cfg, policy=FP32_POLICY, freeu=IDENTITY).apply
        )(params, sample, t, ctx)
        np.testing.assert_array_equal(np.asarray(free), np.asarray(base))

    def test_default_config_changes_output(self, tiny_inputs):
        cfg, params, sample, t, ctx = tiny_inputs
        base = jax.jit(UNetMotion(cfg, policy=FP32_POLICY).apply)(
            params, sample, t, ctx
        )
        free = jax.jit(
            UNetMotion(cfg, policy=FP32_POLICY, freeu=FreeUConfig()).apply
        )(params, sample, t, ctx)
        assert free.shape == base.shape
        assert not np.allclose(np.asarray(free), np.asarray(base), atol=1e-3)


class TestPipelineSurface:
    def test_animatediff_accepts_freeu(self):
        from vdx.models.clip_text import CLIPTextConfig
        from vdx.models.vae import VAEConfig
        from vdx.pipelines import AnimateDiffPipeline

        pipe = AnimateDiffPipeline.with_random_params(
            seed=0,
            unet_config=UNetMotionConfig.tiny(),
            vae_config=VAEConfig.tiny(),
            text_config=CLIPTextConfig.tiny(),
            policy=FP32_POLICY,
            freeu=FreeUConfig(),
        )
        out = pipe("portrait", num_frames=2, height=64, width=64,
                   num_inference_steps=2, seed=1, output_type="np")
        assert out.frames[0].shape == (2, 64, 64, 3)

    def test_dit_family_rejects_freeu(self):
        from vdx.models.dit import LatteConfig
        from vdx.pipelines import LattePipeline

        with pytest.raises(ValueError, match="FreeU"):
            LattePipeline(unet_config=LatteConfig.tiny(), freeu=FreeUConfig())

    def test_cogvideox_rejects_freeu(self):
        """CogVideoXPipeline has its own __init__ (it doesn't forward
        **kwargs to the base check) — it must raise the same friendly
        ValueError, not a TypeError."""
        from vdx.models.cogvideox import CausalVAEConfig, CogVideoXConfig
        from vdx.models.t5 import T5Config
        from vdx.pipelines import CogVideoXPipeline

        with pytest.raises(ValueError, match="FreeU"):
            CogVideoXPipeline(
                dit_config=CogVideoXConfig.tiny(),
                vae_config=CausalVAEConfig.tiny(),
                t5_config=T5Config.tiny(),
                freeu=FreeUConfig(),
            )


class TestFrameShardedFreeU:
    def test_sharded_matches_local(self):
        """FreeU is frame-local (spatial FFT + channel scale), so the
        frame-sharded program with freeu must equal the local one."""
        from vdx.parallel.frame_parallel import make_frame_sharded_denoiser
        from vdx.parallel.mesh import make_mesh

        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        mesh = make_mesh(1, 4, 1)
        cfg = UNetMotionConfig.tiny()
        fu = FreeUConfig()
        local = UNetMotion(cfg, policy=FP32_POLICY, freeu=fu)
        sample = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 16, 16, 4))
        t = jnp.asarray([500])
        ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 7, cfg.cross_attention_dim))
        params = fast_init(local, sample, t, ctx, seed=2)
        expected = local.apply(params, sample, t, ctx)

        _, sharded_apply = make_frame_sharded_denoiser(
            UNetMotion, cfg, mesh, policy=FP32_POLICY, freeu=fu
        )
        got = jax.jit(sharded_apply)(params, sample, t, ctx)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(expected), atol=2e-4
        )
