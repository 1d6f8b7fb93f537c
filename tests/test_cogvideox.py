"""CogVideoX family tests (tiny configs, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vdx.core.dtypes import FP32_POLICY
from vdx.models.cogvideox import (
    CausalConv3d,
    CausalVAEConfig,
    CausalVAEDecoder,
    CausalVAEEncoder,
    CogVideoXConfig,
    CogVideoXDiT,
)
from vdx.models.t5 import T5Config, T5Encoder
from vdx.pipelines.cogvideox import CogVideoXPipeline
from vdx.core.init import fast_init


class TestT5:
    def test_forward(self):
        cfg = T5Config.tiny()
        model = T5Encoder(cfg, policy=FP32_POLICY)
        ids = jnp.ones((2, 10), jnp.int32)
        params = fast_init(model, ids, seed=0)
        out = model.apply(params, ids)
        assert out.shape == (2, 10, cfg.d_model)

    def test_bidirectional(self):
        """T5 encoder is bidirectional: later tokens DO affect earlier ones."""
        cfg = T5Config.tiny()
        model = T5Encoder(cfg, policy=FP32_POLICY)
        ids = jnp.ones((1, 8), jnp.int32)
        params = fast_init(model, ids, seed=0)
        o1 = model.apply(params, ids)
        o2 = model.apply(params, ids.at[0, 6].set(3))
        assert not np.allclose(np.asarray(o1[0, :6]), np.asarray(o2[0, :6]))


class TestCausalVAE:
    def test_compression_ratios(self):
        cfg = CausalVAEConfig.tiny()
        enc = CausalVAEEncoder(cfg, policy=FP32_POLICY)
        F, H, W = 9, 32, 32
        x = jnp.zeros((1, F, H, W, 3))
        params = fast_init(enc, x, seed=0)
        z = enc.apply(params, x)
        # temporal 4x (ceil-ish with causal convs), spatial 8x
        assert z.shape[2] == H // 8 and z.shape[3] == W // 8
        assert z.shape[-1] == 2 * cfg.latent_channels
        assert z.shape[1] == 3  # 9 frames -> ceil(9/4)

    def test_decoder_upsamples(self):
        cfg = CausalVAEConfig.tiny()
        dec = CausalVAEDecoder(cfg, policy=FP32_POLICY)
        z = jnp.zeros((1, 3, 4, 4, cfg.latent_channels))
        params = fast_init(dec, z, seed=0)
        x = dec.apply(params, z)
        assert x.shape == (1, 12, 32, 32, 3)

    def test_causality(self):
        """Causal conv: output at frame t must not depend on frames > t."""
        conv = CausalConv3d(4, policy=FP32_POLICY)
        x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 6, 4, 4, 3)),
                        jnp.float32)
        params = fast_init(conv, x, seed=0)
        o1 = conv.apply(params, x)
        x2 = x.at[:, 4:].add(1.0)  # change frames 4,5
        o2 = conv.apply(params, x2)
        np.testing.assert_allclose(np.asarray(o1[:, :4]), np.asarray(o2[:, :4]),
                                   atol=1e-6)


class TestDiT3D:
    def test_forward_and_joint_attention(self):
        cfg = CogVideoXConfig.tiny()
        model = CogVideoXDiT(cfg, policy=FP32_POLICY)
        sample = jnp.zeros((1, 2, 8, 8, cfg.in_channels))
        txt = jnp.asarray(
            np.random.default_rng(0).standard_normal((1, 4, cfg.text_dim)),
            jnp.float32,
        )
        params = fast_init(model, sample, jnp.asarray([10]), txt, seed=0)
        # adaLN-Zero zero-inits gates/final proj; fill them so signal flows
        leaves, treedef = jax.tree.flatten(params)
        key = jax.random.PRNGKey(99)
        leaves = [
            jax.random.normal(jax.random.fold_in(key, i), l.shape) * 0.02
            if hasattr(l, "shape") and l.size and float(jnp.abs(l).max()) == 0.0
            else l
            for i, l in enumerate(leaves)
        ]
        params = jax.tree.unflatten(treedef, leaves)
        x = jnp.asarray(np.random.default_rng(1).standard_normal(sample.shape),
                        jnp.float32)
        o1 = model.apply(params, x, jnp.asarray([10]), txt)
        assert o1.shape == sample.shape
        # text changes must propagate into video tokens (joint attention)
        o2 = model.apply(params, x, jnp.asarray([10]), txt + 1.0)
        assert not np.allclose(np.asarray(o1), np.asarray(o2), atol=1e-7)


class TestCogVideoXPipeline:
    def test_checkpoint_faithful_sampler_defaults(self):
        """CogVideoX samples with its published DDIM semantics, not the
        SD-1.5 defaults: v-prediction on scaled_linear betas with the SNR
        shift (s=3) and zero-terminal-SNR rescale (diffusers
        CogVideoXDDIMScheduler; Lin et al. 2023)."""
        from vdx.schedulers import ddim
        from vdx.schedulers.common import make_alphas_cumprod

        pipe = CogVideoXPipeline(
            dit_config=CogVideoXConfig.tiny(),
            vae_config=CausalVAEConfig.tiny(),
            t5_config=T5Config.tiny(),
            policy=FP32_POLICY,
        )
        cfg = pipe._sampler_cfg("ddim")
        assert cfg.schedule.prediction_type == "v_prediction"
        assert cfg.schedule.beta_schedule == "scaled_linear"
        assert cfg.schedule.snr_shift_scale == 3.0
        assert cfg.timestep_spacing == "trailing"  # zero-SNR recipe
        acp = make_alphas_cumprod(cfg.schedule)
        assert acp[-1] == 0.0  # zero terminal SNR
        # trailing spacing actually samples the zero-SNR node first
        t999 = pipe._get_tables("ddim", 4).timesteps[0]
        assert int(t999) == 999
        # the pipeline's device tables differ from the SD-1.5 defaults
        t = pipe._get_tables("ddim", 4)
        base = ddim.make_tables(4)
        assert not np.allclose(
            np.asarray(t.alpha_prod_t), np.asarray(base.alpha_prod_t)
        )
        # and a user override wins over the family default
        pipe2 = CogVideoXPipeline(
            dit_config=CogVideoXConfig.tiny(),
            vae_config=CausalVAEConfig.tiny(),
            t5_config=T5Config.tiny(),
            policy=FP32_POLICY,
            sampler_configs={"ddim": ddim.DDIMConfig()},
        )
        assert pipe2._sampler_cfg("ddim") == ddim.DDIMConfig()

    def test_dynamic_cfg(self):
        """use_dynamic_cfg analogue: the cosine^5 per-step guidance ramp
        runs through the compiled core and changes the output vs static."""
        pipe = CogVideoXPipeline.with_random_params(
            seed=0,
            dit_config=CogVideoXConfig.tiny(),
            vae_config=CausalVAEConfig.tiny(),
            t5_config=T5Config.tiny(),
            policy=FP32_POLICY,
        )
        kw = dict(num_frames=5, height=32, width=32, num_inference_steps=3,
                  seed=1)
        static = pipe("a corgi", guidance_scale=6.0, **kw).frames[0]
        dyn = pipe("a corgi", guidance_scale=6.0, dynamic_cfg=True,
                   **kw).frames[0]
        assert dyn.shape == static.shape and dyn.dtype == np.uint8
        assert not np.array_equal(static, dyn)

    def test_generates(self):
        pipe = CogVideoXPipeline.with_random_params(
            seed=0,
            dit_config=CogVideoXConfig.tiny(),
            vae_config=CausalVAEConfig.tiny(),
            t5_config=T5Config.tiny(),
            policy=FP32_POLICY,
        )
        out = pipe("a corgi", num_frames=5, height=32, width=32,
                   num_inference_steps=2, seed=1)
        frames = out.frames[0]
        assert frames.shape == (5, 32, 32, 3)
        assert frames.dtype == np.uint8

    def test_device_output_matches_np(self):
        """output_type="device": frames stay on device, trimmed to the
        requested count INSIDE the decode program (no host-side slice),
        and materialise equal to the np path."""
        pipe = CogVideoXPipeline.with_random_params(
            seed=0,
            dit_config=CogVideoXConfig.tiny(),
            vae_config=CausalVAEConfig.tiny(),
            t5_config=T5Config.tiny(),
            policy=FP32_POLICY,
        )
        gen = dict(num_frames=5, height=32, width=32,
                   num_inference_steps=2, seed=1)
        dev = pipe("a corgi", output_type="device", **gen)
        ref = pipe("a corgi", output_type="np", **gen)
        got = np.asarray(dev.frames)
        assert got.shape == (1, 5, 32, 32, 3) and got.dtype == np.uint8
        np.testing.assert_array_equal(got[0], ref.frames[0])

    def test_offloaded_text_encoder_matches_resident(self):
        """offload_text_encoder (the single-chip HBM fix for T5-XXL +
        generate co-residency, PERF.md): same video as the resident
        pipeline; the t5 tree leaves self.params after the first encode;
        checkpoints still contain it."""
        kw = dict(
            dit_config=CogVideoXConfig.tiny(),
            vae_config=CausalVAEConfig.tiny(),
            t5_config=T5Config.tiny(),
            policy=FP32_POLICY,
        )
        gen = dict(num_frames=5, height=32, width=32,
                   num_inference_steps=2, seed=1)
        resident = CogVideoXPipeline.with_random_params(seed=0, **kw)
        a = resident("a corgi", **gen).frames[0]
        off = CogVideoXPipeline(offload_text_encoder=True, **kw)
        off.params = dict(resident.params)
        b = off("a corgi", **gen).frames[0]
        np.testing.assert_array_equal(a, b)
        assert "t5" not in off.params and off._t5_host is not None
        # cache hit path returns the same states object
        c = off("a corgi", **gen).frames[0]
        np.testing.assert_array_equal(a, c)
        # checkpoint completeness
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            off.save_checkpoint(d + "/ckpt")
            from vdx.core.checkpoint import load_params

            loaded = load_params(d + "/ckpt")
            assert "t5" in loaded

    def test_spatial_tiled_decode(self):
        """decode_spatial_tile — the knob that fits the headline
        49f @480x720 decode on one chip (untiled peak activation is
        18.4 GB, PERF.md). Overlap-blended tiles of a conv+GN decoder are
        approximate at the seams (per-tile GN stats), so: (a) a tile
        spanning the full latent plane must reproduce the untiled video
        exactly through the whole pipeline program (pins the B*f_lat
        folding + F_out reshape plumbing); (b) the seam error must SHRINK
        as tiles grow (the regime the production shape lives in — at
        480x720 a 40-latent tile is thousands of GN positions)."""
        pipe = CogVideoXPipeline.with_random_params(
            seed=0,
            dit_config=CogVideoXConfig.tiny(),
            vae_config=CausalVAEConfig.tiny(),
            t5_config=T5Config.tiny(),
            policy=FP32_POLICY,
        )
        gen = dict(num_frames=5, height=64, width=64,
                   num_inference_steps=2, seed=1)
        a = pipe("a corgi", **gen).frames[0]
        full_tile = pipe("a corgi", decode_spatial_tile=8,
                         **gen).frames[0]  # tile == latent plane
        np.testing.assert_allclose(
            full_tile.astype(np.int32), a.astype(np.int32), atol=1
        )

        def err(tile, ov):
            b = pipe("a corgi", decode_spatial_tile=tile,
                     decode_tile_overlap=ov, **gen).frames[0]
            return ((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean()

        assert err(6, 2) < err(2, 1)
