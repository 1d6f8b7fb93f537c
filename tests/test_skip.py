"""Adaptive step-skip (TeaCache-class turbo mode) tests.

Correctness contract: ``threshold=0`` forces a model evaluation every step
and must reproduce the plain pipeline (bit-close — the skip program
restructures the scan body, shifting fp32 fusion order by at most one uint8
level, same bound as the PAB interval-1 tests); with a real threshold the
output is an approximation that tracks the exact trajectory while provably
evaluating the model on fewer steps (counted through the per-step progress
callback, which fires only inside the evaluated branch of the ``lax.cond``).
"""

import numpy as np
import pytest

from vdx.core.dtypes import FP32_POLICY
from vdx.models.clip_text import CLIPTextConfig
from vdx.models.unet_motion import UNetMotionConfig
from vdx.models.vae import VAEConfig
from vdx.pipelines import AnimateDiffPipeline, SkipConfig

KW = dict(
    unet_config=UNetMotionConfig.tiny(),
    vae_config=VAEConfig.tiny(),
    text_config=CLIPTextConfig.tiny(),
    policy=FP32_POLICY,
    scheduler="ddim",
)
GEN = dict(num_frames=2, height=64, width=64, num_inference_steps=8, seed=3,
           output_type="np")
PROMPT = "a corgi on the beach"


@pytest.fixture(scope="module")
def exact_pipe():
    return AnimateDiffPipeline.with_random_params(seed=0, **KW)


class TestSkip:
    def test_threshold_zero_is_exact(self, exact_pipe):
        turbo = AnimateDiffPipeline(
            skip=SkipConfig(threshold=0.0, warmup_steps=1, cooldown_steps=0),
            **KW,
        )
        turbo.params = exact_pipe.params
        a = exact_pipe(PROMPT, **GEN).frames[0]
        out = turbo(PROMPT, **GEN)
        b = out.frames[0]
        diff = np.abs(a.astype(int) - b.astype(int))
        assert diff.max() <= 1 and (diff > 0).mean() < 1e-3
        # device-computed eval count: every step evaluated
        assert int(out.n_evals) == GEN["num_inference_steps"]

    def test_eval_count_is_adaptive_and_observable(self, exact_pipe):
        """threshold=inf => only the forced warm-up/cool-down steps evaluate;
        the progress callback (inside the evaluated branch) counts them, and
        the device-computed PipelineOutput.n_evals (the backend-portable
        counter — host callbacks don't exist on the axon tunnel) agrees."""
        evals = []
        turbo = AnimateDiffPipeline(
            skip=SkipConfig(threshold=1e30, warmup_steps=2, cooldown_steps=2),
            progress=lambda i, n: evals.append(i),
            **KW,
        )
        turbo.params = exact_pipe.params
        out = turbo(PROMPT, **GEN)
        assert sorted(evals) == [0, 1, 6, 7]
        assert int(out.n_evals) == len(evals)

    def test_skips_and_tracks_trajectory(self, exact_pipe):
        evals = []
        turbo = AnimateDiffPipeline(
            skip=SkipConfig(threshold=0.15, warmup_steps=2, cooldown_steps=1),
            progress=lambda i, n: evals.append(i),
            **KW,
        )
        turbo.params = exact_pipe.params
        a = exact_pipe(PROMPT, **GEN).frames[0].astype(np.float64)
        out = turbo(PROMPT, **GEN)
        b = out.frames[0].astype(np.float64)
        other = exact_pipe(PROMPT, **{**GEN, "seed": 99}).frames[0].astype(
            np.float64
        )
        # warm-up/cool-down always evaluate; between them the threshold
        # decides — with ANY threshold > 0 the approximation must evaluate
        # at most every step and track the exact trajectory far better than
        # an unrelated sample does
        n_evals = len(evals)
        assert int(out.n_evals) == n_evals
        assert 3 <= n_evals <= GEN["num_inference_steps"]
        err_turbo = ((a - b) ** 2).mean()
        err_other = ((a - other) ** 2).mean()
        if n_evals < GEN["num_inference_steps"]:
            assert not np.array_equal(a, b)  # it skipped work
            assert err_turbo < 0.25 * err_other, (err_turbo, err_other)

    def test_dpm_composes(self, exact_pipe):
        """skip + dpm multistep: the prev_x0 slot rides the skip carry. At
        threshold 0 every step evaluates and the output matches the plain
        dpm pipeline to cross-program fusion noise (the skip scan's extra
        carry reorders fp32 fusions — ±1 uint8 on <0.1% of pixels, same
        bound as the suite's other cross-program comparisons); at a high
        threshold steps are skipped (the reused model output still yields
        a consistent x0 at each node)."""
        plain = AnimateDiffPipeline(**{**KW, "scheduler": "dpm"})
        plain.params = exact_pipe.params
        ref = plain(PROMPT, **GEN).frames[0]

        turbo = AnimateDiffPipeline(
            skip=SkipConfig(threshold=0.0), **{**KW, "scheduler": "dpm"}
        )
        turbo.params = exact_pipe.params
        out = turbo(PROMPT, **GEN)
        assert int(out.n_evals) == GEN["num_inference_steps"]
        diff = np.abs(out.frames[0].astype(int) - ref.astype(int))
        assert diff.max() <= 1 and (diff > 0).mean() < 1e-3, (
            diff.max(), (diff > 0).mean())

        lazy = AnimateDiffPipeline(
            skip=SkipConfig(threshold=1e6), **{**KW, "scheduler": "dpm"}
        )
        lazy.params = exact_pipe.params
        out2 = lazy(PROMPT, **GEN)
        # only warmup + cooldown evaluate under an unreachable threshold
        assert int(out2.n_evals) < GEN["num_inference_steps"]
        assert np.isfinite(out2.frames[0].astype(np.float64)).all()

    def test_pab_and_skip_mutually_exclusive(self):
        from vdx.pipelines import PABConfig

        with pytest.raises(ValueError, match="turbo"):
            AnimateDiffPipeline(pab=PABConfig(), skip=SkipConfig(), **KW)

    def test_warmup_zero_rejected(self):
        with pytest.raises(ValueError, match="warmup"):
            SkipConfig(warmup_steps=0)

    def test_video2video_composes(self, exact_pipe):
        """SDEdit + skip: threshold=0 reproduces the exact v2v program."""
        rng = np.random.default_rng(5)
        clip = rng.integers(0, 256, (2, 64, 64, 3), np.uint8)
        turbo = AnimateDiffPipeline(
            skip=SkipConfig(threshold=0.0, warmup_steps=1, cooldown_steps=0),
            **KW,
        )
        turbo.params = exact_pipe.params
        kw = dict(GEN, video=clip, strength=0.75)
        a = exact_pipe(PROMPT, **kw).frames[0]
        b = turbo(PROMPT, **kw).frames[0]
        diff = np.abs(a.astype(int) - b.astype(int))
        # the in-program VAE encode adds fusion surface, so slightly more
        # pixels land on the other side of a rounding boundary than in the
        # t2v case — still at most ±1 uint8 level
        assert diff.max() <= 1 and (diff > 0).mean() < 1e-2

    def test_variable_steps_pipeline_falls_back_to_static(self, exact_pipe):
        """skip + variable_steps: the request must route to a static skip
        program (not the padded variable one) and still be exact at
        threshold 0."""
        turbo = AnimateDiffPipeline(
            skip=SkipConfig(threshold=0.0, warmup_steps=1, cooldown_steps=0),
            variable_steps=12,
            **KW,
        )
        turbo.params = exact_pipe.params
        a = exact_pipe(PROMPT, **GEN).frames[0]
        b = turbo(PROMPT, **GEN).frames[0]
        diff = np.abs(a.astype(int) - b.astype(int))
        assert diff.max() <= 1 and (diff > 0).mean() < 1e-3


class TestSVDSkip:
    """Skip on the north-star SVD pipeline (EDM sampler, CFG-always)."""

    GEN = dict(num_frames=4, height=64, width=64, num_inference_steps=8,
               seed=3, decode_chunk=2, output_type="np")

    @classmethod
    def _kw(cls):
        from vdx.models.clip_vision import CLIPVisionConfig
        from vdx.models.svd_unet import SVDUNetConfig

        return dict(
            unet_config=SVDUNetConfig.tiny(),
            vae_config=VAEConfig.tiny(),
            vision_config=CLIPVisionConfig.tiny(),
            policy=FP32_POLICY,
        )

    @pytest.fixture(scope="class")
    def svd_exact(self):
        from vdx.pipelines.svd import SVDImg2VidPipeline

        return SVDImg2VidPipeline.with_random_params(seed=0, **self._kw())

    @pytest.fixture(scope="class")
    def image(self):
        return np.random.default_rng(7).random((64, 64, 3)).astype(np.float32)

    def test_threshold_zero_is_exact(self, svd_exact, image):
        from vdx.pipelines.svd import SVDImg2VidPipeline

        turbo = SVDImg2VidPipeline(
            skip=SkipConfig(threshold=0.0, warmup_steps=1, cooldown_steps=0),
            **self._kw(),
        )
        turbo.params = svd_exact.params
        a = svd_exact(image, **self.GEN).frames[0]
        b = turbo(image, **self.GEN).frames[0]
        diff = np.abs(a.astype(int) - b.astype(int))
        assert diff.max() <= 1 and (diff > 0).mean() < 1e-3

    def test_forced_skip_pattern(self, svd_exact, image):
        evals = []
        from vdx.pipelines.svd import SVDImg2VidPipeline

        turbo = SVDImg2VidPipeline(
            skip=SkipConfig(threshold=1e30, warmup_steps=2, cooldown_steps=1),
            progress=lambda i, n: evals.append(i),
            **self._kw(),
        )
        turbo.params = svd_exact.params
        turbo(image, **self.GEN)
        assert sorted(evals) == [0, 1, 7]

    def test_composes_with_frame_shards(self, svd_exact, image):
        """The drift signal is a GLOBAL latent mean — under frame sharding
        GSPMD reduces it across shards, so the skip decisions (and hence the
        output) must match the local skip pipeline exactly."""
        import jax

        from vdx.pipelines.svd import SVDImg2VidPipeline

        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        gen = {**self.GEN, "num_frames": 8}
        cfg = SkipConfig(threshold=1e30, warmup_steps=2, cooldown_steps=1)
        local = SVDImg2VidPipeline(skip=cfg, **self._kw())
        local.params = svd_exact.params
        sharded = SVDImg2VidPipeline(skip=cfg, frame_shards=4,
                                     seq_impl="ulysses", **self._kw())
        sharded.params = svd_exact.params
        a = local(image, **gen).frames[0]
        b = sharded(image, **gen).frames[0]
        np.testing.assert_allclose(
            b.astype(np.int32), a.astype(np.int32), atol=1
        )


class TestTurboBatchingGuard:
    """The batched runner/serving compile their own denoise program — a
    turbo pipeline handed to them must be rejected loudly, not silently run
    without its turbo mode."""

    def test_batched_service_rejects_turbo_pipe(self, exact_pipe=None):
        import pytest as _pytest

        from vdx.harness.batched import _batched_denoise_fn
        from vdx.pipelines import AnimateDiffPipeline

        pipe = AnimateDiffPipeline(skip=SkipConfig(), **KW)
        with _pytest.raises(ValueError, match="turbo"):
            _batched_denoise_fn(pipe, 4, (1, 2, 8, 8, 4), "ddim")
        from vdx.pipelines import PABConfig

        pipe2 = AnimateDiffPipeline(pab=PABConfig(), **KW)
        with _pytest.raises(ValueError, match="turbo"):
            _batched_denoise_fn(pipe2, 4, (1, 2, 8, 8, 4), "ddim")


class TestSkipUniPC:
    def test_skip_composes_with_unipc(self, exact_pipe):
        """UniPC's pytree multistep state ((x0_prev, sample_prev)) rides
        the skip carry opaquely: threshold 0 == the plain unipc program
        (same ±1-uint8 fusion-noise bound as the dpm composition)."""
        plain = AnimateDiffPipeline(**{**KW, "scheduler": "unipc"})
        plain.params = exact_pipe.params
        ref = plain(PROMPT, **GEN).frames[0]

        turbo = AnimateDiffPipeline(
            skip=SkipConfig(threshold=0.0), **{**KW, "scheduler": "unipc"}
        )
        turbo.params = exact_pipe.params
        out = turbo(PROMPT, **GEN)
        assert int(out.n_evals) == GEN["num_inference_steps"]
        diff = np.abs(out.frames[0].astype(int) - ref.astype(int))
        assert diff.max() <= 1 and (diff > 0).mean() < 1e-3, (
            diff.max(), (diff > 0).mean())
