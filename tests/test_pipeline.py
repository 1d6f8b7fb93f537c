"""End-to-end pipeline tests on tiny configs (CPU, fp32)."""

import numpy as np
import pytest

from vdx.core.dtypes import FP32_POLICY
from vdx.models.clip_text import CLIPTextConfig
from vdx.models.unet_motion import UNetMotionConfig
from vdx.models.vae import VAEConfig
from vdx.pipelines import AnimateDiffPipeline


@pytest.fixture(scope="module")
def tiny_pipe():
    return AnimateDiffPipeline.with_random_params(
        seed=0,
        unet_config=UNetMotionConfig.tiny(),
        vae_config=VAEConfig.tiny(),
        text_config=CLIPTextConfig.tiny(),
        policy=FP32_POLICY,
    )


GEN_KWARGS = dict(
    num_frames=4, height=64, width=64, num_inference_steps=3, seed=42
)


class TestPipeline:
    def test_generates_frames(self, tiny_pipe):
        out = tiny_pipe("a corgi walking on the beach", output_type="np", **GEN_KWARGS)
        frames = out.frames[0]
        assert frames.shape == (4, 64, 64, 3)
        assert frames.dtype == np.uint8

    def test_determinism_same_seed(self, tiny_pipe):
        a = tiny_pipe("portrait", output_type="np", **GEN_KWARGS).frames[0]
        b = tiny_pipe("portrait", output_type="np", **GEN_KWARGS).frames[0]
        np.testing.assert_array_equal(a, b)

    def test_seed_changes_output(self, tiny_pipe):
        kw = dict(GEN_KWARGS)
        kw["seed"] = 7
        a = tiny_pipe("portrait", output_type="np", **GEN_KWARGS).frames[0]
        b = tiny_pipe("portrait", output_type="np", **kw).frames[0]
        assert not np.array_equal(a, b)

    def test_guidance_scale_changes_output(self, tiny_pipe):
        a = tiny_pipe("portrait", guidance_scale=7.5, output_type="np", **GEN_KWARGS).frames[0]
        b = tiny_pipe("portrait", guidance_scale=2.0, output_type="np", **GEN_KWARGS).frames[0]
        assert not np.array_equal(a, b)

    def test_prompt_changes_output(self, tiny_pipe):
        a = tiny_pipe("portrait of a man", output_type="np", **GEN_KWARGS).frames[0]
        b = tiny_pipe("birds flying across a blue sky", output_type="np", **GEN_KWARGS).frames[0]
        assert not np.array_equal(a, b)

    def test_all_schedulers_run(self, tiny_pipe):
        for sched in ["euler", "ddim", "dpm", "unipc"]:
            out = tiny_pipe("portrait", scheduler=sched, output_type="np", **GEN_KWARGS)
            assert out.frames[0].shape == (4, 64, 64, 3)

    def test_device_output_matches_np(self, tiny_pipe):
        """output_type="device" leaves frames on device ([B,F,H,W,3] u8);
        materialising them matches the synchronous np path exactly."""
        dev = tiny_pipe("portrait", output_type="device", **GEN_KWARGS)
        ref = tiny_pipe("portrait", output_type="np", **GEN_KWARGS)
        got = np.asarray(dev.frames)
        assert got.shape == (1, 4, 64, 64, 3) and got.dtype == np.uint8
        np.testing.assert_array_equal(got[0], ref.frames[0])

    def test_pil_output(self, tiny_pipe):
        out = tiny_pipe("portrait", **GEN_KWARGS)
        frames = out.frames[0]
        assert len(frames) == 4
        assert frames[0].size == (64, 64)


class TestVariableSteps:
    def test_one_program_serves_multiple_step_counts(self):
        """variable_steps pipeline == per-step-count programs, numerically.

        The padded-tables + cond-skip program must reproduce the static
        program's output for every step count (and compile ONCE: the
        compiled-cache must hold a single var_generate entry afterwards)."""
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
        )
        static = AnimateDiffPipeline.with_random_params(seed=0, **kw)
        var = AnimateDiffPipeline.with_random_params(
            seed=0, variable_steps=4, **kw
        )
        gen = dict(num_frames=2, height=64, width=64, output_type="np")
        for scheduler in ("ddim", "euler"):
            for steps in (2, 3):
                a = static(
                    "portrait", num_inference_steps=steps, seed=9,
                    scheduler=scheduler, **gen,
                ).frames[0]
                b = var(
                    "portrait", num_inference_steps=steps, seed=9,
                    scheduler=scheduler, **gen,
                ).frames[0]
                diff = np.abs(a.astype(np.int16) - b.astype(np.int16))
                assert diff.max() <= 1, (scheduler, steps, diff.max())
        var_keys = [
            k for k in var._compiled
            if k[0] == "prog" and ("var", 4) in k
        ]
        assert len(var_keys) == 2  # one per scheduler, NOT per step count

    def test_per_step_guidance_schedule(self):
        """guidance_scale accepts an [N] per-step schedule (dynamic CFG):
        a constant schedule reproduces the scalar call exactly; a varying
        one changes the output; wrong length is rejected."""
        import pytest

        from vdx.core.dtypes import FP32_POLICY
        from vdx.models.clip_text import CLIPTextConfig
        from vdx.models.unet_motion import UNetMotionConfig
        from vdx.models.vae import VAEConfig
        from vdx.pipelines import AnimateDiffPipeline

        pipe = AnimateDiffPipeline.with_random_params(
            seed=0,
            unet_config=UNetMotionConfig.tiny(),
            vae_config=VAEConfig.tiny(),
            text_config=CLIPTextConfig.tiny(),
            policy=FP32_POLICY,
        )
        gen = dict(num_frames=2, height=64, width=64, output_type="np",
                   num_inference_steps=3, seed=4)
        scalar = pipe("portrait", guidance_scale=7.5, **gen).frames[0]
        const = pipe("portrait", guidance_scale=[7.5] * 3, **gen).frames[0]
        np.testing.assert_array_equal(scalar, const)
        ramp = pipe("portrait", guidance_scale=[1.0, 4.0, 7.5], **gen).frames[0]
        assert not np.array_equal(scalar, ramp)
        with pytest.raises(ValueError, match="per-step guidance"):
            pipe("portrait", guidance_scale=[7.5] * 4, **gen)

    def test_dpm_multistep_under_variable_steps(self):
        """The multistep carry — a sampler-owned pytree from init_state
        (dpm: prev_x0; unipc: (x0_prev, sample_prev)) — rides the padded
        cond-skip scan too: variable == static per step count, including
        the terminal lower_order_final step (detected by the padded
        table's sigma value, not a static index)."""
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
        )
        static = AnimateDiffPipeline.with_random_params(seed=0, **kw)
        var = AnimateDiffPipeline.with_random_params(
            seed=0, variable_steps=4, **kw
        )
        for sched in ("dpm", "unipc"):
            gen = dict(num_frames=2, height=64, width=64, output_type="np",
                       scheduler=sched)
            for steps in (2, 4):
                a = static("portrait", num_inference_steps=steps, seed=9,
                           **gen).frames[0]
                b = var("portrait", num_inference_steps=steps, seed=9,
                        **gen).frames[0]
                diff = np.abs(a.astype(np.int16) - b.astype(np.int16))
                assert diff.max() <= 1, (sched, steps, diff.max())


class TestVideoToVideo:
    """video2video (SDEdit) on the unified core: in-program VAE encode ->
    add_noise_at(t_start) -> truncated denoise scan -> decode."""

    def _video(self, frames=4, hw=64, seed=0):
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, (frames, hw, hw, 3), dtype=np.uint8)

    V2V = dict(num_inference_steps=4, seed=5, output_type="np",
               guidance_scale=7.5)

    def test_shapes_and_determinism(self, tiny_pipe):
        vid = self._video()
        out = tiny_pipe("portrait", video=vid, strength=0.5, **self.V2V)
        frames = out.frames[0]
        assert frames.shape == (4, 64, 64, 3) and frames.dtype == np.uint8
        again = tiny_pipe("portrait", video=vid, strength=0.5, **self.V2V)
        np.testing.assert_array_equal(frames, again.frames[0])

    def test_strength_and_video_change_output(self, tiny_pipe):
        vid = self._video()
        a = tiny_pipe("portrait", video=vid, strength=0.5, **self.V2V).frames[0]
        b = tiny_pipe("portrait", video=vid, strength=1.0, **self.V2V).frames[0]
        c = tiny_pipe("portrait", video=self._video(seed=9), strength=0.5,
                      **self.V2V).frames[0]
        assert not np.array_equal(a, b)
        assert not np.array_equal(a, c)

    def test_uint8_and_float_inputs_agree(self, tiny_pipe):
        vid = self._video()
        as_float = vid.astype(np.float32) / 127.5 - 1.0
        a = tiny_pipe("portrait", video=vid, strength=0.5, **self.V2V).frames[0]
        b = tiny_pipe("portrait", video=as_float, strength=0.5,
                      **self.V2V).frames[0]
        np.testing.assert_array_equal(a, b)

    def test_strength_truncates_the_scan(self):
        """strength=0.5 over 4 steps must run exactly steps {2, 3}."""
        from vdx.core.dtypes import FP32_POLICY
        from vdx.models.clip_text import CLIPTextConfig
        from vdx.models.unet_motion import UNetMotionConfig
        from vdx.models.vae import VAEConfig
        from vdx.pipelines import AnimateDiffPipeline

        seen = []
        pipe = AnimateDiffPipeline.with_random_params(
            seed=0, unet_config=UNetMotionConfig.tiny(),
            vae_config=VAEConfig.tiny(), text_config=CLIPTextConfig.tiny(),
            policy=FP32_POLICY, progress=lambda i, n: seen.append((i, n)),
        )
        import jax

        out = pipe("portrait", video=self._video(frames=2), strength=0.5,
                   **self.V2V)
        jax.effects_barrier()
        assert out.frames[0].shape == (2, 64, 64, 3)
        assert sorted(seen) == [(2, 4), (3, 4)], seen

    def test_matches_eager_reference_loop(self, tiny_pipe):
        """The fused v2v program == an eager python SDEdit loop (encode,
        add_noise_at, per-step apply/CFG/step, decode) to float noise."""
        import jax
        import jax.numpy as jnp

        from vdx.core.rng import as_key
        from vdx.schedulers import get_sampler

        pipe = tiny_pipe
        vid = self._video(frames=2)
        steps, seed, gs, strength = 4, 5, 7.5, 0.5
        out = pipe("portrait", video=vid, strength=strength,
                   num_inference_steps=steps, seed=seed, output_type="np",
                   guidance_scale=gs).frames[0]

        sampler = get_sampler(pipe.scheduler)
        tables = sampler.make_tables(steps)
        t_start = steps - max(int(steps * strength), 1)

        v = jnp.asarray(vid.astype(np.float32) / 127.5 - 1.0)[None]
        vae = pipe.vae
        z = jax.vmap(
            lambda f: vae.apply(pipe.params["vae"], f, method=vae.encode),
            in_axes=1, out_axes=1,
        )(v)
        noise = jax.random.normal(as_key(seed), z.shape, jnp.float32)
        lat = sampler.add_noise_at(z.astype(jnp.float32), noise, t_start,
                                   tables)
        context = pipe.encode_prompt("portrait", "")
        for i in range(t_start, steps):
            model_in = jnp.concatenate([lat, lat], axis=0)
            model_in = sampler.scale_model_input(model_in, i, tables)
            t_b = jnp.broadcast_to(tables.timesteps[i], (2,))
            eps = pipe.unet.apply(pipe.params["unet"], model_in, t_b, context)
            u, c = jnp.split(eps, 2, axis=0)
            eps = u + gs * (c - u)
            lat = sampler.step(lat, eps, i, tables)
        imgs = jax.vmap(
            lambda f: vae.apply(pipe.params["vae"], f, method=vae.decode),
            in_axes=1, out_axes=1,
        )(lat)
        want = np.asarray(
            jnp.round(jnp.clip(imgs.astype(jnp.float32) / 2 + 0.5, 0, 1)
                      * 255.0).astype(jnp.uint8)
        )[0]
        diff = np.abs(out.astype(np.int16) - want.astype(np.int16))
        assert diff.max() <= 1, diff.max()

    def test_rejections(self, tiny_pipe):
        vid = self._video()
        with pytest.raises(ValueError, match="strength"):
            tiny_pipe("portrait", video=vid, strength=0.0, **self.V2V)
        with pytest.raises(ValueError, match="multistep"):
            tiny_pipe("portrait", video=vid, scheduler="dpm", **self.V2V)
        with pytest.raises(ValueError, match="multistep"):
            tiny_pipe("portrait", video=vid, scheduler="unipc", **self.V2V)
        with pytest.raises(ValueError, match="video batch"):
            tiny_pipe(["a", "b"], video=vid, **self.V2V)

    def test_frame_sharded_v2v_matches_local(self, tiny_pipe):
        """v2v composes with frame sharding: encode + denoise + decode all
        shard over the frames axis and reproduce the local pipeline."""
        from vdx.core.dtypes import FP32_POLICY
        from vdx.models.clip_text import CLIPTextConfig
        from vdx.models.unet_motion import UNetMotionConfig
        from vdx.models.vae import VAEConfig
        from vdx.pipelines import AnimateDiffPipeline

        sharded = AnimateDiffPipeline.with_random_params(
            seed=0, unet_config=UNetMotionConfig.tiny(),
            vae_config=VAEConfig.tiny(), text_config=CLIPTextConfig.tiny(),
            policy=FP32_POLICY, frame_shards=2,
        )
        sharded.params = tiny_pipe.params  # identical weights
        vid = self._video(frames=4)
        kw = dict(num_inference_steps=3, seed=7, output_type="np",
                  guidance_scale=7.5, decode_chunk=2)
        local = tiny_pipe("portrait", video=vid, strength=0.75, **kw).frames[0]
        shard = sharded("portrait", video=vid, strength=0.75, **kw).frames[0]
        diff = np.abs(local.astype(np.int16) - shard.astype(np.int16))
        assert diff.max() <= 1, diff.max()


class TestSegmentedDispatch:
    """Chunked dispatch (``dispatch_steps=K``): the denoise runs as chained
    K-step programs with device-resident latents + sampler/skip carry —
    built for the tunneled backend's ~55 s single-dispatch worker ceiling
    (PERF.md methodology #0). Single-step samplers and the multistep carry
    chain BIT-IDENTICALLY to the monolithic program; the skip body's fp32
    fusion differs at the ulp level between segment and monolithic scans
    (eval decisions identical)."""

    GEN5 = dict(num_frames=4, height=64, width=64, num_inference_steps=5,
                seed=7, output_type="np")

    def test_euler_bit_exact(self, tiny_pipe):
        a = tiny_pipe("portrait", scheduler="euler", **self.GEN5)
        b = tiny_pipe("portrait", scheduler="euler", dispatch_steps=2,
                      **self.GEN5)
        np.testing.assert_array_equal(np.asarray(a.latents),
                                      np.asarray(b.latents))
        np.testing.assert_array_equal(a.frames[0], b.frames[0])

    def test_dpm_multistep_carry_bit_exact(self, tiny_pipe):
        """The multistep prev_x0 slot crosses the segment boundary."""
        a = tiny_pipe("portrait", scheduler="dpm", **self.GEN5)
        b = tiny_pipe("portrait", scheduler="dpm", dispatch_steps=2,
                      **self.GEN5)
        np.testing.assert_array_equal(np.asarray(a.latents),
                                      np.asarray(b.latents))

    def test_skip_carry_crosses_segments(self):
        """Skip's (prev_eps, prev_sig, accum) carry crosses segment
        boundaries: the eval decisions (n_evals) match the monolithic
        program exactly; latents to fp32 fusion tolerance."""
        from vdx.pipelines.base import SkipConfig

        pipe = AnimateDiffPipeline.with_random_params(
            seed=0,
            unet_config=UNetMotionConfig.tiny(),
            vae_config=VAEConfig.tiny(),
            text_config=CLIPTextConfig.tiny(),
            policy=FP32_POLICY,
            skip=SkipConfig(threshold=0.15, warmup_steps=1,
                            cooldown_steps=1),
        )
        a = pipe("portrait", **self.GEN5)
        b = pipe("portrait", dispatch_steps=2, **self.GEN5)
        assert int(a.n_evals) == int(b.n_evals)
        np.testing.assert_allclose(
            np.asarray(a.latents), np.asarray(b.latents), atol=1e-4
        )
        np.testing.assert_allclose(
            b.frames[0].astype(np.int32), a.frames[0].astype(np.int32),
            atol=1,
        )

    def test_context_composes(self):
        """Long-clip context windows segment bit-exactly (the use case:
        128f clips whose monolithic denoise would exceed the dispatch
        ceiling)."""
        from vdx.pipelines import ContextConfig

        pipe = AnimateDiffPipeline.with_random_params(
            seed=0,
            unet_config=UNetMotionConfig.tiny(),
            vae_config=VAEConfig.tiny(),
            text_config=CLIPTextConfig.tiny(),
            policy=FP32_POLICY,
            context=ContextConfig(frames=4, stride=2),
        )
        gen = dict(self.GEN5, num_frames=8)
        a = pipe("portrait", **gen)
        b = pipe("portrait", dispatch_steps=2, **gen)
        np.testing.assert_array_equal(np.asarray(a.latents),
                                      np.asarray(b.latents))

    def test_pab_cache_crosses_segments(self):
        """PAB composes with chunked dispatch: the attention cache rides
        the inter-segment carry, refresh flags use global step indices —
        bit-identical to the monolithic PAB program. (The composition
        exists for turbo modes at shapes whose full program exceeds the
        tunnel dispatch ceiling — CogVideoX 49f@480x720 is ~128 s exact.)"""
        from vdx.pipelines.base import PABConfig

        pipe = AnimateDiffPipeline.with_random_params(
            seed=0,
            unet_config=UNetMotionConfig.tiny(),
            vae_config=VAEConfig.tiny(),
            text_config=CLIPTextConfig.tiny(),
            policy=FP32_POLICY,
            pab=PABConfig(spatial_interval=2, temporal_interval=2,
                          cross_interval=3, warmup_steps=1, cooldown_steps=1),
        )
        a = pipe("portrait", **self.GEN5)
        b = pipe("portrait", dispatch_steps=2, **self.GEN5)
        # cache leaves enter segment programs as inputs instead of scan
        # carries, so XLA fuses the first cached matmuls differently —
        # ulp-class fp32 drift, same contract as the skip-carry case above
        np.testing.assert_allclose(
            np.asarray(a.latents), np.asarray(b.latents),
            rtol=2e-5, atol=1e-4,
        )
        np.testing.assert_allclose(
            b.frames[0].astype(np.int32), a.frames[0].astype(np.int32),
            atol=1,
        )

    def test_rejections(self, tiny_pipe):
        video = np.zeros((4, 64, 64, 3), np.uint8)
        with pytest.raises(ValueError, match="video2video"):
            tiny_pipe("portrait", video=video, dispatch_steps=2,
                      num_inference_steps=5, seed=1)
