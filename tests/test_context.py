"""Temporal context windows (long-clip generation) — pipelines/context.py.

Capability extension beyond the reference's fixed 16-frame ceiling
(reference experiments/05_grid_search_ablation.py:48): overlapping-window
denoising with blend + FreeNoise initial noise, inside the one jitted
generate program.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vdx.core.dtypes import FP32_POLICY
from vdx.models.clip_text import CLIPTextConfig
from vdx.models.unet_motion import UNetMotionConfig
from vdx.models.vae import VAEConfig
from vdx.pipelines import AnimateDiffPipeline, ContextConfig
from vdx.pipelines.base import PABConfig
from vdx.pipelines.context import (
    make_freenoise_maker,
    make_windowed_apply,
    window_starts,
    window_weights,
)

KW = dict(
    unet_config=UNetMotionConfig.tiny(),
    vae_config=VAEConfig.tiny(),
    text_config=CLIPTextConfig.tiny(),
    policy=FP32_POLICY,
    scheduler="ddim",
)
GEN = dict(height=64, width=64, num_inference_steps=2, output_type="np")
CTX = ContextConfig(frames=4, stride=2)


# ---------------------------------------------------------------------------
# unit: schedule + blend math
# ---------------------------------------------------------------------------
class TestWindowSchedule:
    def test_starts_cover_exactly(self):
        assert window_starts(16, 16, 8) == (0,)
        assert window_starts(24, 16, 8) == (0, 8)
        # overshoot: last window pinned to total - frames
        assert window_starts(20, 16, 8) == (0, 4)
        assert window_starts(64, 16, 8) == (0, 8, 16, 24, 32, 40, 48)
        for total, frames, stride in [(24, 16, 8), (20, 16, 8), (7, 4, 2)]:
            starts = window_starts(total, frames, stride)
            covered = sorted({f for s in starts for f in range(s, s + frames)})
            assert covered == list(range(total))

    def test_short_clip_rejected(self):
        with pytest.raises(ValueError, match="< context window"):
            window_starts(8, 16, 8)

    def test_weights_profiles(self):
        np.testing.assert_array_equal(window_weights(4, "uniform"),
                                      np.ones(4, np.float32))
        np.testing.assert_array_equal(window_weights(4, "pyramid"),
                                      [1.0, 2.0, 2.0, 1.0])
        np.testing.assert_array_equal(window_weights(5, "pyramid"),
                                      [1.0, 2.0, 3.0, 2.0, 1.0])

    def test_config_validation(self):
        with pytest.raises(ValueError, match="stride"):
            ContextConfig(frames=4, stride=4)  # no overlap
        with pytest.raises(ValueError, match="stride"):
            ContextConfig(frames=4, stride=0)
        with pytest.raises(ValueError, match="weights"):
            ContextConfig(frames=4, stride=2, weights="gauss")


class TestWindowedApply:
    def test_framewise_model_is_invariant(self):
        """For a per-frame pointwise denoiser the blend must be exact (the
        weights cancel) — pins the slice/scatter/normalise arithmetic."""
        fn = lambda p, x, t: x * 3.0 + t[0]  # noqa: E731
        wrapped = make_windowed_apply(
            fn, total_frames=7, out_channels=2,
            cfg=ContextConfig(frames=4, stride=2),
        )
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 7, 3, 3, 2)),
                        jnp.float32)
        t = jnp.full((2,), 5.0)
        np.testing.assert_allclose(wrapped(None, x, t), fn(None, x, t),
                                   rtol=1e-6)

    def test_window_dependent_model_blends_as_specified(self):
        """A denoiser that subtracts its window's frame-mean exposes the
        blend: compare against a straightforward numpy re-implementation."""
        cfg = ContextConfig(frames=4, stride=2, weights="pyramid")
        fn = lambda p, x, t: x - x.mean(axis=1, keepdims=True)  # noqa: E731
        total = 7
        wrapped = make_windowed_apply(fn, total_frames=total, out_channels=2,
                                      cfg=cfg)
        x = np.random.default_rng(1).normal(size=(1, total, 2, 2, 2))
        x = x.astype(np.float32)
        got = np.asarray(wrapped(None, jnp.asarray(x), jnp.zeros((1,))))

        w = window_weights(cfg.frames, cfg.weights)
        acc = np.zeros_like(x)
        cnt = np.zeros((1, total, 1, 1, 1), np.float32)
        for s in window_starts(total, cfg.frames, cfg.stride):
            win = x[:, s:s + cfg.frames]
            eps = win - win.mean(axis=1, keepdims=True)
            acc[:, s:s + cfg.frames] += eps * w[None, :, None, None, None]
            cnt[:, s:s + cfg.frames] += w[None, :, None, None, None]
        np.testing.assert_allclose(got, acc / cnt, rtol=1e-5, atol=1e-6)

    def test_single_window_is_identity(self):
        fn = lambda p, x, t: x  # noqa: E731
        assert make_windowed_apply(
            fn, total_frames=4, out_channels=4,
            cfg=ContextConfig(frames=4, stride=2),
        ) is fn


class TestFreeNoise:
    def test_blocks_are_shuffles_of_base(self):
        shape = (1, 10, 2, 2, 4)
        make = make_freenoise_maker(shape, ctx=4)
        noise = np.asarray(make(jax.random.PRNGKey(0)))
        assert noise.shape == shape
        base = noise[0, :4].reshape(4, -1)
        for block in (noise[0, 4:8].reshape(4, -1),):
            # each later block is a frame-permutation of the base block
            matches = (block[:, None, :] == base[None, :, :]).all(-1)
            assert (matches.sum(axis=1) == 1).all()
        tail = noise[0, 8:10].reshape(2, -1)
        assert ((tail[:, None, :] == base[None, :, :]).all(-1).sum(1) == 1).all()

    def test_batched_contract_matches_noise_maker(self):
        """B>1 takes stacked [B, 2] keys, each video drawn independently —
        same contract as the iid _noise_maker (multi-prompt batching)."""
        shape = (2, 6, 2, 2, 4)
        make = make_freenoise_maker(shape, ctx=4)
        keys = jnp.stack([jax.random.PRNGKey(3), jax.random.PRNGKey(9)])
        batched = np.asarray(make(keys))
        single = make_freenoise_maker((1,) + shape[1:], ctx=4)
        for i in range(2):
            np.testing.assert_array_equal(
                batched[i], np.asarray(single(keys[i]))[0]
            )


# ---------------------------------------------------------------------------
# pipeline surface
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def ctx_pipe():
    return AnimateDiffPipeline.with_random_params(seed=0, context=CTX, **KW)


class TestContextPipeline:
    def test_short_clip_bit_matches_plain_pipeline(self, ctx_pipe):
        """num_frames <= context.frames falls through to the exact
        context-free program (the exactness contract)."""
        plain = AnimateDiffPipeline.with_random_params(seed=0, **KW)
        a = ctx_pipe("a corgi", num_frames=4, seed=7, **GEN).frames[0]
        b = plain("a corgi", num_frames=4, seed=7, **GEN).frames[0]
        np.testing.assert_array_equal(a, b)

    def test_long_clip_runs_and_is_deterministic(self, ctx_pipe):
        out1 = ctx_pipe("a corgi", num_frames=7, seed=7, **GEN).frames[0]
        out2 = ctx_pipe("a corgi", num_frames=7, seed=7, **GEN).frames[0]
        assert out1.shape == (7, 64, 64, 3)
        np.testing.assert_array_equal(out1, out2)

    def test_iid_noise_option(self):
        pipe = AnimateDiffPipeline.with_random_params(
            seed=0, context=dataclasses.replace(CTX, freenoise=False), **KW
        )
        out = pipe("a corgi", num_frames=6, seed=7, **GEN).frames[0]
        assert out.shape == (6, 64, 64, 3)

    def test_composes_with_variable_steps(self):
        """The windowed eval rides the step-count-agnostic program: one
        compile serves several step counts, matching static programs."""
        var = AnimateDiffPipeline.with_random_params(
            seed=0, context=CTX, variable_steps=4, **KW
        )
        for steps in (2, 3):
            a = var("a corgi", num_frames=6, seed=7,
                    **{**GEN, "num_inference_steps": steps}).frames[0]
            stat = AnimateDiffPipeline.with_random_params(
                seed=0, context=CTX, **KW
            )("a corgi", num_frames=6, seed=7,
              **{**GEN, "num_inference_steps": steps}).frames[0]
            np.testing.assert_allclose(a.astype(np.int32),
                                       stat.astype(np.int32), atol=1)

    def test_composes_with_skip(self):
        """skip turbo at threshold 0 (eval every step) == plain context
        program, and n_evals is reported."""
        from vdx.pipelines.base import SkipConfig

        skip = AnimateDiffPipeline.with_random_params(
            seed=0, context=CTX,
            skip=SkipConfig(threshold=0.0, warmup_steps=1, cooldown_steps=1),
            **KW,
        )
        out = skip("a corgi", num_frames=6, seed=7, **GEN)
        ref = AnimateDiffPipeline.with_random_params(
            seed=0, context=CTX, **KW
        )("a corgi", num_frames=6, seed=7, **GEN).frames[0]
        # lax.cond changes fusion order: same tolerance as the established
        # skip exactness contract (test_skip.py::test_threshold_zero_is_exact)
        diff = np.abs(ref.astype(int) - out.frames[0].astype(int))
        assert diff.max() <= 1 and (diff > 0).mean() < 1e-3
        assert int(out.n_evals) == 2

    def test_pab_rejected(self):
        with pytest.raises(ValueError, match="PAB"):
            AnimateDiffPipeline.with_random_params(
                seed=0, context=CTX, pab=PABConfig(), **KW
            )

    def test_window_parallel_matches_local(self):
        """context + frame_shards = WINDOW parallelism: the per-step
        windows shard over the mesh (independent denoiser evaluations;
        weighted-psum blend) and the result matches the single-device
        context pipeline to the repo-wide sharded-vs-local contract
        (<=1 uint8 on frames; the blend's fp32 FMA fusion differs by
        <=1 ulp between the scan and shard_map programs)."""
        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        local = AnimateDiffPipeline.with_random_params(
            seed=0, context=CTX, **KW
        )
        a = local("portrait", num_frames=10, seed=7, **GEN)
        wp = AnimateDiffPipeline.with_random_params(
            seed=0, context=CTX, frame_shards=4, **KW
        )
        b = wp("portrait", num_frames=10, seed=7, **GEN)
        assert b.frames[0].shape == a.frames[0].shape
        np.testing.assert_allclose(
            b.frames[0].astype(np.int32), a.frames[0].astype(np.int32),
            atol=1,
        )
        np.testing.assert_allclose(
            np.asarray(b.latents), np.asarray(a.latents), atol=1e-3
        )

    def test_window_parallel_fall_through_ragged(self):
        """Short requests on a window-parallel pipeline fall through to
        the plain local program; a ragged frame count (3 frames on 4
        shards) exercises the decode-side pad/trim."""
        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        local = AnimateDiffPipeline.with_random_params(
            seed=0, context=CTX, **KW
        )
        wp = AnimateDiffPipeline.with_random_params(
            seed=0, context=CTX, frame_shards=4, **KW
        )
        a = local("portrait", num_frames=3, seed=3, **GEN)
        b = wp("portrait", num_frames=3, seed=3, **GEN)
        assert b.frames[0].shape == (3, 64, 64, 3)
        np.testing.assert_allclose(
            b.frames[0].astype(np.int32), a.frames[0].astype(np.int32),
            atol=1,
        )

    def test_unsupported_family_rejected(self):
        from vdx.pipelines import CogVideoXPipeline

        assert CogVideoXPipeline.supports_context is False

        class NoCtx(AnimateDiffPipeline):
            supports_context = False

        with pytest.raises(ValueError, match="context windows"):
            NoCtx.with_random_params(seed=0, context=CTX, **KW)


class TestSVDContext:
    def test_svd_long_img2vid(self):
        """SVD accepts context windows: the per-frame image-latent concat
        rides the model input and is windowed with it (img2vid beyond the
        trained 25-frame span)."""
        from vdx.models.clip_vision import CLIPVisionConfig
        from vdx.models.svd_unet import SVDUNetConfig
        from vdx.pipelines import SVDImg2VidPipeline

        pipe = SVDImg2VidPipeline.with_random_params(
            seed=0,
            unet_config=SVDUNetConfig.tiny(),
            vae_config=VAEConfig.tiny(),
            vision_config=CLIPVisionConfig.tiny(),
            policy=FP32_POLICY,
            context=ContextConfig(frames=4, stride=2),
        )
        image = np.random.default_rng(0).random((64, 64, 3)).astype(np.float32)
        out = pipe(image, num_frames=7, height=64, width=64,
                   num_inference_steps=2, seed=3, decode_chunk=2)
        assert len(out.frames[0]) == 7
