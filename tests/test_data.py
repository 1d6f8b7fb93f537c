"""Training data pipeline tests (host decode, batching, prefetch, encode)."""

import numpy as np
import pytest

from vdx.core.init import fast_init

from vdx.data import (
    FrameFolderDataset,
    VideoClipLoader,
    encode_clips_to_latents,
    prefetch_to_device,
)


@pytest.fixture(scope="module")
def frame_root(tmp_path_factory):
    """Two videos in the grid-search artifact layout, one bare-dir video."""
    from PIL import Image

    root = tmp_path_factory.mktemp("clips")
    rng = np.random.default_rng(0)
    for name, n in [("exp_a", 6), ("exp_b", 8)]:
        d = root / name / "frames"
        d.mkdir(parents=True)
        for i in range(n):
            arr = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"frame_{i:03d}.png")
    d = root / "bare_video"
    d.mkdir()
    for i in range(5):
        arr = (rng.random((20, 12, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"frame_{i:03d}.png")
    return root


class TestDataset:
    def test_discovery_and_clip_count(self, frame_root):
        ds = FrameFolderDataset(frame_root, clip_frames=4, size=(16, 16))
        assert len(ds) == 3
        # (6-4+1) + (8-4+1) + (5-4+1) = 3 + 5 + 2
        assert ds.num_clips() == 10

    def test_clip_shape_range(self, frame_root):
        ds = FrameFolderDataset(frame_root, clip_frames=4, size=(16, 16))
        clip = ds.load_clip(0, 1)
        assert clip.shape == (4, 16, 16, 3)
        assert clip.dtype == np.float32
        assert clip.min() >= -1.0 and clip.max() <= 1.0

    def test_too_short_videos_excluded(self, frame_root):
        ds = FrameFolderDataset(frame_root, clip_frames=6)
        assert len(ds) == 2  # bare_video (5 frames) drops out


class TestLoader:
    def test_batches_static_shape(self, frame_root):
        ds = FrameFolderDataset(frame_root, clip_frames=4, size=(16, 16))
        loader = VideoClipLoader(ds, batch_size=4, seed=0)
        batches = list(loader)
        assert len(batches) == 2  # 10 clips -> 2 full batches, drop last 2
        for b in batches:
            assert b["pixels"].shape == (4, 4, 16, 16, 3)

    def test_seed_determinism(self, frame_root):
        ds = FrameFolderDataset(frame_root, clip_frames=4, size=(16, 16))
        a = next(iter(VideoClipLoader(ds, batch_size=4, seed=7)))
        b = next(iter(VideoClipLoader(ds, batch_size=4, seed=7)))
        c = next(iter(VideoClipLoader(ds, batch_size=4, seed=8)))
        np.testing.assert_array_equal(a["pixels"], b["pixels"])
        assert not np.array_equal(a["pixels"], c["pixels"])

    def test_prefetch_to_device(self, frame_root):
        import jax

        ds = FrameFolderDataset(frame_root, clip_frames=4, size=(16, 16))
        loader = VideoClipLoader(ds, batch_size=4, seed=0)
        got = list(prefetch_to_device(iter(loader), size=2))
        assert len(got) == 2
        assert isinstance(got[0]["pixels"], jax.Array)

    def test_prefetch_sharded(self, frame_root):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from vdx.parallel.mesh import make_mesh

        if len(jax.devices()) < 4:
            pytest.skip("needs 4 devices")
        mesh = make_mesh(4, 1, 1)
        ds = FrameFolderDataset(frame_root, clip_frames=4, size=(16, 16))
        loader = VideoClipLoader(ds, batch_size=4, seed=0)
        sh = NamedSharding(mesh, P("data"))
        batch = next(prefetch_to_device(iter(loader), sharding=sh))
        assert batch["pixels"].sharding.spec == P("data")


class TestEncodeAndTrain:
    def test_encode_then_train_step(self, frame_root):
        """pixels -> latents -> one converging train step, end to end."""
        import jax
        import jax.numpy as jnp

        from vdx.core.dtypes import FP32_POLICY
        from vdx.models.unet_motion import UNetMotion, UNetMotionConfig
        from vdx.models.vae import AutoencoderKL, VAEConfig
        from vdx.parallel.train import init_train_state, make_train_step

        # 64x64 pixels -> 8x8 latents (the tiny UNet's own downsampling
        # chain needs >=8x8, same as the pipeline tests)
        ds = FrameFolderDataset(frame_root, clip_frames=4, size=(64, 64))
        batch = next(iter(VideoClipLoader(ds, batch_size=2, seed=0)))

        vae = AutoencoderKL(VAEConfig.tiny(), policy=FP32_POLICY)
        vparams = fast_init(vae, jnp.zeros((1, 64, 64, 3)), seed=0)
        latents = encode_clips_to_latents(vae, vparams, batch["pixels"])
        assert latents.shape == (2, 4, 8, 8, 4)

        cfg = UNetMotionConfig.tiny()
        model = UNetMotion(cfg, policy=FP32_POLICY)
        ctx = jnp.zeros((2, 7, cfg.cross_attention_dim))
        params = fast_init(model, latents, jnp.zeros((2,), jnp.int32), ctx,
                           seed=1)
        state, opt = init_train_state(model, params)
        step = jax.jit(make_train_step(model, opt))
        state2, m = step(state, {"latents": latents, "context": ctx},
                         jax.random.PRNGKey(2))
        assert np.isfinite(float(m["loss"]))
        assert int(state2.step) == 1

    def test_finetuned_params_drive_the_pipeline(self, frame_root, tmp_path):
        """Full production loop closure: clips -> VAE latents -> train step
        -> checkpoint -> reload into the PIPELINE -> generate. The trained
        UNet must change the output vs the init weights."""
        import jax
        import jax.numpy as jnp

        from vdx.core.dtypes import FP32_POLICY
        from vdx.models.clip_text import CLIPTextConfig
        from vdx.models.unet_motion import UNetMotionConfig
        from vdx.models.vae import VAEConfig
        from vdx.parallel.train import init_train_state, make_train_step
        from vdx.pipelines import AnimateDiffPipeline

        pipe = AnimateDiffPipeline.with_random_params(
            seed=0,
            unet_config=UNetMotionConfig.tiny(),
            vae_config=VAEConfig.tiny(),
            text_config=CLIPTextConfig.tiny(),
            policy=FP32_POLICY,
        )
        gen = dict(num_frames=4, height=64, width=64, num_inference_steps=2,
                   seed=5, output_type="np")
        before = pipe("portrait", **gen).frames[0]

        ds = FrameFolderDataset(frame_root, clip_frames=4, size=(64, 64))
        batch = next(iter(VideoClipLoader(ds, batch_size=2, seed=0)))
        latents = encode_clips_to_latents(
            pipe.vae, pipe.params["vae"], batch["pixels"])
        ctx = jnp.zeros((2, 7, pipe.unet.config.cross_attention_dim))
        state, opt = init_train_state(
            pipe.unet, pipe.params["unet"], learning_rate=1e-2)
        step = jax.jit(make_train_step(pipe.unet, opt))
        state, _ = step(state, {"latents": latents, "context": ctx},
                        jax.random.PRNGKey(2))

        pipe.params = {**pipe.params, "unet": state.params}
        ckpt = tmp_path / "finetuned"
        pipe.save_checkpoint(ckpt)

        fresh = AnimateDiffPipeline(
            unet_config=UNetMotionConfig.tiny(),
            vae_config=VAEConfig.tiny(),
            text_config=CLIPTextConfig.tiny(),
            policy=FP32_POLICY,
        )
        fresh.load_checkpoint(ckpt)
        after = fresh("portrait", **gen).frames[0]
        assert after.shape == before.shape
        assert not np.array_equal(after, before)
