"""SVD img2vid stack tests (tiny configs, CPU)."""

import numpy as np
import pytest

from vdx.core.dtypes import FP32_POLICY
from vdx.models.clip_vision import CLIPVisionConfig
from vdx.models.svd_unet import SVDUNetConfig
from vdx.models.vae import VAEConfig
from vdx.pipelines.svd import SVDImg2VidPipeline
from vdx.schedulers import edm


class TestEDM:
    def test_karras_grid(self):
        t = edm.make_tables(10)
        sig = np.asarray(t.sigmas)
        assert sig[0] == pytest.approx(700.0, rel=1e-4)
        assert sig[-2] == pytest.approx(0.002, rel=1e-3)
        assert sig[-1] == 0.0
        assert np.all(np.diff(sig[:-1]) < 0)
        np.testing.assert_allclose(
            np.asarray(t.timesteps), 0.25 * np.log(sig[:-1]), rtol=1e-5
        )

    def test_last_step_returns_denoised(self):
        import jax
        import jax.numpy as jnp

        t = edm.make_tables(5)
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (1, 2, 4, 4, 4))
        F_out = jax.random.normal(jax.random.fold_in(key, 1), x.shape)
        i = 4
        out = edm.step(x, F_out, jnp.asarray(i), t)
        sigma = t.sigmas[i]
        expected = x / (sigma**2 + 1) + (-sigma / jnp.sqrt(sigma**2 + 1)) * F_out
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5)


@pytest.fixture(scope="module")
def tiny_svd():
    return SVDImg2VidPipeline.with_random_params(
        seed=0,
        unet_config=SVDUNetConfig.tiny(),
        vae_config=VAEConfig.tiny(),
        vision_config=CLIPVisionConfig.tiny(),
        policy=FP32_POLICY,
    )


class TestSVDPipeline:
    def test_generates(self, tiny_svd):
        rng = np.random.default_rng(0)
        image = rng.random((64, 64, 3)).astype(np.float32)
        out = tiny_svd(image, num_frames=4, height=64, width=64,
                       num_inference_steps=2, seed=3, decode_chunk=2)
        frames = out.frames[0]
        assert frames.shape == (4, 64, 64, 3)
        assert frames.dtype == np.uint8

    def test_device_output_matches_np(self, tiny_svd):
        """output_type="device" (the serving img2vid route reads back
        outside the device lock) materialises equal to the np path."""
        rng = np.random.default_rng(0)
        image = rng.random((64, 64, 3)).astype(np.float32)
        kw = dict(num_frames=4, height=64, width=64, num_inference_steps=2,
                  seed=3, decode_chunk=2)
        dev = tiny_svd(image, output_type="device", **kw)
        ref = tiny_svd(image, output_type="np", **kw)
        got = np.asarray(dev.frames)
        assert got.shape == (1, 4, 64, 64, 3) and got.dtype == np.uint8
        np.testing.assert_array_equal(got[0], ref.frames[0])

    def test_image_conditions_output(self, tiny_svd):
        rng = np.random.default_rng(0)
        im1 = rng.random((64, 64, 3)).astype(np.float32)
        im2 = rng.random((64, 64, 3)).astype(np.float32)
        # num_frames=4 matches test_generates -> ONE compiled program
        # serves the whole module (compile dominates on the CPU runner)
        kw = dict(num_frames=4, height=64, width=64, num_inference_steps=2,
                  seed=3, decode_chunk=2)
        f1 = tiny_svd(im1, **kw).frames[0]
        f2 = tiny_svd(im2, **kw).frames[0]
        assert not np.array_equal(f1, f2)

    def test_dpm_edm_tracks_fine_reference(self, tiny_svd):
        """DPM-Solver++(2M) on the EDM grid (scheduler="dpm_edm") tracks
        the fine-grid ODE solution markedly closer than Euler at the SAME
        step count — the whole point of the second-order sampler (each
        step costs one UNet eval in both).

        Measured on this fixture vs a 384-step Euler reference: euler@25
        rel-err 0.131, dpm_edm@25 0.075 — a 1.75x accuracy margin even on
        the rough random-weight trajectory; real checkpoints have smoother
        x0 paths where the multistep advantage grows (PERF.md). The test
        reference is dpm_edm@64 (self-err 0.017 vs the 384-step Euler run
        — an order of magnitude under both candidates, and unlike a
        coarse EULER reference its error is not correlated with the Euler
        candidate's, which artificially shrinks the gap)."""
        rng = np.random.default_rng(2)
        image = rng.random((64, 64, 3)).astype(np.float32)
        kw = dict(num_frames=4, height=64, width=64, seed=3,
                  output_type="latent")

        def lat(sched, n):
            out = tiny_svd(image, num_inference_steps=n, scheduler=sched, **kw)
            return np.asarray(out.latents, np.float64)

        ref = lat("dpm_edm", 64)
        scale = np.abs(ref).mean()
        e_euler = np.abs(lat("edm", 25) - ref).mean() / scale
        e_dpm = np.abs(lat("dpm_edm", 25) - ref).mean() / scale
        assert np.isfinite(e_dpm) and np.isfinite(e_euler)
        # measured 0.065 vs 0.142 (ratio 0.46; 0.57 vs the unbiased
        # 384-step reference) — 0.65 bounds both methodologies
        assert e_dpm < 0.65 * e_euler, (e_dpm, e_euler)

    def test_dpm_edm_frame_sharded_matches_local(self, tiny_svd):
        """The dpm multistep carry rides the frame-sharded (Ulysses) scan:
        SVDImg2VidPipeline(frame_shards=4) with scheduler="dpm_edm" matches
        the unsharded pipeline (the 8-chip headline path, PERF.md)."""
        from vdx.core.dtypes import FP32_POLICY
        from vdx.models.clip_vision import CLIPVisionConfig
        from vdx.models.svd_unet import SVDUNetConfig
        from vdx.models.vae import VAEConfig

        sharded = SVDImg2VidPipeline.with_random_params(
            seed=0,
            unet_config=SVDUNetConfig.tiny(),
            vae_config=VAEConfig.tiny(),
            vision_config=CLIPVisionConfig.tiny(),
            policy=FP32_POLICY,
            frame_shards=4,
        )
        rng = np.random.default_rng(5)
        image = rng.random((64, 64, 3)).astype(np.float32)
        kw = dict(num_frames=4, height=64, width=64, num_inference_steps=3,
                  seed=6, decode_chunk=1, scheduler="dpm_edm")
        a = tiny_svd(image, **kw).frames[0]
        b = sharded(image, **kw).frames[0]
        diff = np.abs(a.astype(int) - b.astype(int))
        assert diff.max() <= 1  # fp32 collective reduction order

    def test_deterministic(self, tiny_svd):
        rng = np.random.default_rng(1)
        image = rng.random((64, 64, 3)).astype(np.float32)
        kw = dict(num_frames=4, height=64, width=64, num_inference_steps=2,
                  seed=5, decode_chunk=2)
        f1 = tiny_svd(image, **kw).frames[0]
        f2 = tiny_svd(image, **kw).frames[0]
        np.testing.assert_array_equal(f1, f2)
