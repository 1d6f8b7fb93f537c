"""Pyramid Attention Broadcast (turbo mode) tests.

Correctness contract: with refresh intervals of 1 (refresh every step) PAB
must reproduce the non-PAB pipeline bit-for-bit; with broadcasting enabled
the output is an approximation that stays close to the exact trajectory.
"""

import numpy as np
import pytest

from vdx.core.dtypes import FP32_POLICY
from vdx.models.clip_text import CLIPTextConfig
from vdx.models.unet_motion import UNetMotionConfig
from vdx.models.vae import VAEConfig
from vdx.pipelines import AnimateDiffPipeline
from vdx.pipelines.base import PABConfig

KW = dict(
    unet_config=UNetMotionConfig.tiny(),
    vae_config=VAEConfig.tiny(),
    text_config=CLIPTextConfig.tiny(),
    policy=FP32_POLICY,
    scheduler="ddim",
)
GEN = dict(num_frames=2, height=64, width=64, num_inference_steps=6, seed=3,
           output_type="np")


@pytest.fixture(scope="module")
def exact_pipe():
    return AnimateDiffPipeline.with_random_params(seed=0, **KW)


class TestPAB:
    def test_refresh_every_step_is_exact(self, exact_pipe):
        pab = PABConfig(spatial_interval=1, temporal_interval=1,
                        cross_interval=1, warmup_steps=0, cooldown_steps=0)
        turbo = AnimateDiffPipeline(pab=pab, **KW)
        turbo.params = exact_pipe.params
        a = exact_pipe("a corgi on the beach", **GEN).frames[0]
        b = turbo("a corgi on the beach", **GEN).frames[0]
        # program restructuring (step 0 unrolled before the scan, cond
        # wrappers) shifts fp32 fusion order: at most ±1 uint8 level
        diff = np.abs(a.astype(int) - b.astype(int))
        assert diff.max() <= 1 and (diff > 0).mean() < 1e-3

    def test_broadcast_stays_close(self, exact_pipe):
        pab = PABConfig(spatial_interval=2, temporal_interval=3,
                        cross_interval=3, warmup_steps=1, cooldown_steps=1)
        turbo = AnimateDiffPipeline(pab=pab, **KW)
        turbo.params = exact_pipe.params
        a = exact_pipe("a corgi on the beach", **GEN).frames[0].astype(np.float64)
        b = turbo("a corgi on the beach", **GEN).frames[0].astype(np.float64)
        # approximation: bounded drift from the exact trajectory
        mse = ((a - b) / 255.0) ** 2
        psnr = 10 * np.log10(1.0 / max(mse.mean(), 1e-12))
        assert psnr > 20.0, psnr
        assert not np.array_equal(a, b)  # it IS skipping work

    def test_dpm_rejected(self, exact_pipe):
        turbo = AnimateDiffPipeline(pab=PABConfig(), **{**KW, "scheduler": "dpm"})
        turbo.params = exact_pipe.params
        with pytest.raises(ValueError, match="PAB"):
            turbo("x", **GEN)


class TestSVDPAB:
    """PAB on the north-star SVD pipeline (EDM sampler) via the unified
    compiled core: interval-1 refresh must reproduce exact; broadcasting
    must stay close while actually skipping work."""

    KW = None  # built lazily (clip-vision config import kept local)

    @classmethod
    def _kw(cls):
        if cls.KW is None:
            from vdx.models.clip_vision import CLIPVisionConfig
            from vdx.models.svd_unet import SVDUNetConfig

            cls.KW = dict(
                unet_config=SVDUNetConfig.tiny(),
                vae_config=VAEConfig.tiny(),
                vision_config=CLIPVisionConfig.tiny(),
                policy=FP32_POLICY,
            )
        return cls.KW

    GEN = dict(num_frames=4, height=64, width=64, num_inference_steps=6,
               seed=3, decode_chunk=2, output_type="np")

    @pytest.fixture(scope="class")
    def svd_exact(self):
        from vdx.pipelines.svd import SVDImg2VidPipeline

        return SVDImg2VidPipeline.with_random_params(seed=0, **self._kw())

    @pytest.fixture(scope="class")
    def image(self):
        return np.random.default_rng(7).random((64, 64, 3)).astype(np.float32)

    def test_refresh_every_step_is_exact(self, svd_exact, image):
        from vdx.pipelines.svd import SVDImg2VidPipeline

        pab = PABConfig(spatial_interval=1, temporal_interval=1,
                        cross_interval=1, warmup_steps=0, cooldown_steps=0)
        turbo = SVDImg2VidPipeline(pab=pab, **self._kw())
        turbo.params = svd_exact.params
        a = svd_exact(image, **self.GEN).frames[0]
        b = turbo(image, **self.GEN).frames[0]
        diff = np.abs(a.astype(int) - b.astype(int))
        assert diff.max() <= 1 and (diff > 0).mean() < 1e-3

    def test_broadcast_stays_close(self, svd_exact, image):
        from vdx.pipelines.svd import SVDImg2VidPipeline

        pab = PABConfig(spatial_interval=2, temporal_interval=3,
                        cross_interval=3, warmup_steps=1, cooldown_steps=1)
        turbo = SVDImg2VidPipeline(pab=pab, **self._kw())
        turbo.params = svd_exact.params
        a = svd_exact(image, **self.GEN).frames[0].astype(np.float64)
        b = turbo(image, **self.GEN).frames[0].astype(np.float64)
        mse = ((a - b) / 255.0) ** 2
        psnr = 10 * np.log10(1.0 / max(mse.mean(), 1e-12))
        assert psnr > 20.0, psnr
        assert not np.array_equal(a, b)

    def test_temporal_only_composes_with_frame_shards(self, svd_exact, image):
        """The 8-chip turbo configuration behind PERF.md's 5.6 s projection:
        temporal-only PAB (spatial/cross interval 1 -> NO cache allocated
        for those types) composed with frame sharding. The shard_map cache
        specs must handle the reduced cache tree; output matches the local
        pipeline with the same schedule."""
        import jax

        from vdx.pipelines.svd import SVDImg2VidPipeline

        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        gen = {**self.GEN, "num_frames": 8, "decode_chunk": 2}
        pab = PABConfig(spatial_interval=1, temporal_interval=3,
                        cross_interval=1, warmup_steps=1, cooldown_steps=1)
        local = SVDImg2VidPipeline(pab=pab, **self._kw())
        local.params = svd_exact.params
        sharded = SVDImg2VidPipeline(pab=pab, frame_shards=4,
                                     seq_impl="ring", **self._kw())
        sharded.params = svd_exact.params
        a = local(image, **gen).frames[0]
        b = sharded(image, **gen).frames[0]
        np.testing.assert_allclose(
            b.astype(np.int32), a.astype(np.int32), atol=1
        )
        # the schedule IS skipping work vs exact
        assert not np.array_equal(a, svd_exact(image, **gen).frames[0])

    def test_temporal_only_composes_with_ulysses(self, svd_exact, image):
        """Same composition through the Ulysses axis swap: the temporal
        cache's LOCAL layout differs ([P/n, F_global, C] instead of
        [P, F_local, C]) but the shard_map specs only need internal
        consistency — the cache never leaves its device between steps."""
        import jax

        from vdx.pipelines.svd import SVDImg2VidPipeline

        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        gen = {**self.GEN, "num_frames": 8, "decode_chunk": 2}
        pab = PABConfig(spatial_interval=1, temporal_interval=3,
                        cross_interval=1, warmup_steps=1, cooldown_steps=1)
        local = SVDImg2VidPipeline(pab=pab, **self._kw())
        local.params = svd_exact.params
        sharded = SVDImg2VidPipeline(pab=pab, frame_shards=4,
                                     seq_impl="ulysses", **self._kw())
        sharded.params = svd_exact.params
        a = local(image, **gen).frames[0]
        b = sharded(image, **gen).frames[0]
        np.testing.assert_allclose(
            b.astype(np.int32), a.astype(np.int32), atol=1
        )


class TestPABAllFamilies:
    """PAB plumbing on the remaining separable-site families (Latte DiT —
    the PAB paper's native architecture — and ModelScope UNet3D): interval-1
    refresh reproduces the exact pipeline; broadcasting stays close while
    skipping work. (CogVideoX broadcasts its joint attention instead —
    TestCogVideoXPAB.)"""

    GEN2 = dict(num_frames=4, height=64, width=64, num_inference_steps=6,
                seed=3, output_type="np")

    def _families(self):
        from vdx.models.dit import LatteConfig
        from vdx.models.unet3d import UNet3DConfig
        from vdx.pipelines import LattePipeline, TextToVideoMSPipeline

        common = dict(vae_config=VAEConfig.tiny(),
                      text_config=CLIPTextConfig.tiny(), policy=FP32_POLICY)
        return [
            (LattePipeline, dict(unet_config=LatteConfig.tiny(), **common)),
            (TextToVideoMSPipeline,
             dict(unet_config=UNet3DConfig.tiny(), **common)),
        ]

    def test_interval1_exact_and_broadcast_close(self):
        for cls, kw in self._families():
            exact = cls.with_random_params(seed=0, **kw)
            a = exact("birds flying", **self.GEN2).frames[0]

            pab1 = PABConfig(spatial_interval=1, temporal_interval=1,
                             cross_interval=1, warmup_steps=0,
                             cooldown_steps=0)
            turbo1 = cls(pab=pab1, **kw)
            turbo1.params = exact.params
            b = turbo1("birds flying", **self.GEN2).frames[0]
            diff = np.abs(a.astype(int) - b.astype(int))
            assert diff.max() <= 1 and (diff > 0).mean() < 1e-3, cls.__name__

            pab = PABConfig(spatial_interval=2, temporal_interval=3,
                            cross_interval=3, warmup_steps=1,
                            cooldown_steps=1)
            turbo = cls(pab=pab, **kw)
            turbo.params = exact.params
            c = turbo("birds flying", **self.GEN2).frames[0]
            mse = ((a.astype(np.float64) - c.astype(np.float64)) / 255.0) ** 2
            psnr = 10 * np.log10(1.0 / max(mse.mean(), 1e-12))
            assert psnr > 20.0, (cls.__name__, psnr)
            assert not np.array_equal(a, c), cls.__name__


class TestCogVideoXPAB:
    """PAB on the joint-attention family: the broadcast site is the ONE
    joint text+video attention output per block (PABConfig.joint_interval);
    the spatial/temporal/cross intervals have no sites in this model, so
    they must be inert regardless of their values."""

    GEN = dict(num_frames=5, height=32, width=32, num_inference_steps=6,
               seed=3, output_type="np")

    @classmethod
    def _kw(cls):
        from vdx.models.cogvideox import CausalVAEConfig, CogVideoXConfig
        from vdx.models.t5 import T5Config

        return dict(
            dit_config=CogVideoXConfig.tiny(),
            vae_config=CausalVAEConfig.tiny(),
            t5_config=T5Config.tiny(),
            policy=FP32_POLICY,
        )

    @pytest.fixture(scope="class")
    def cog_exact(self):
        from vdx.pipelines.cogvideox import CogVideoXPipeline

        return CogVideoXPipeline.with_random_params(seed=0, **self._kw())

    def test_joint_interval1_is_exact(self, cog_exact):
        from vdx.pipelines.cogvideox import CogVideoXPipeline

        # other intervals deliberately non-1: they have no sites here
        pab = PABConfig(spatial_interval=4, temporal_interval=4,
                        cross_interval=4, joint_interval=1,
                        warmup_steps=0, cooldown_steps=0)
        turbo = CogVideoXPipeline(pab=pab, **self._kw())
        turbo.params = cog_exact.params
        a = cog_exact("a corgi", **self.GEN).frames[0]
        b = turbo("a corgi", **self.GEN).frames[0]
        diff = np.abs(a.astype(int) - b.astype(int))
        assert diff.max() <= 1 and (diff > 0).mean() < 1e-3

    def test_joint_broadcast_stays_close(self, cog_exact):
        from vdx.pipelines.cogvideox import CogVideoXPipeline

        pab = PABConfig(joint_interval=2, warmup_steps=1, cooldown_steps=1)
        turbo = CogVideoXPipeline(pab=pab, **self._kw())
        turbo.params = cog_exact.params
        a = cog_exact("a corgi", **self.GEN).frames[0].astype(np.float64)
        b = turbo("a corgi", **self.GEN).frames[0].astype(np.float64)
        mse = ((a - b) / 255.0) ** 2
        psnr = 10 * np.log10(1.0 / max(mse.mean(), 1e-12))
        assert psnr > 20.0, psnr
        assert not np.array_equal(a, b)
