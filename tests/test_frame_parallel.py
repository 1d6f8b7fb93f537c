"""Frame-sharded UNet vs local UNet — same params, same output."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vdx.core.dtypes import FP32_POLICY
from vdx.models.unet_motion import UNetMotion, UNetMotionConfig
from vdx.parallel.frame_parallel import make_frame_sharded_unet
from vdx.parallel.mesh import make_mesh
from vdx.core.init import fast_init


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = make_mesh(1, 4, 1)
    cfg = UNetMotionConfig.tiny()
    local = UNetMotion(cfg, policy=FP32_POLICY)
    B, F, H, W = 1, 8, 16, 16  # F=8 sharded 2-per-device
    sample = jax.random.normal(jax.random.PRNGKey(0), (B, F, H, W, 4))
    t = jnp.asarray([500])
    ctx = jax.random.normal(jax.random.PRNGKey(1), (B, 7, cfg.cross_attention_dim))
    params = fast_init(local, sample, t, ctx, seed=2)
    return mesh, cfg, local, params, sample, t, ctx


class TestFrameSharded:
    def test_matches_local(self, setup):
        mesh, cfg, local, params, sample, t, ctx = setup
        expected = local.apply(params, sample, t, ctx)

        _, sharded_apply = make_frame_sharded_unet(
            cfg, mesh, policy=FP32_POLICY, seq_impl="ring"
        )
        got = jax.jit(sharded_apply)(params, sample, t, ctx)

        np.testing.assert_allclose(
            np.asarray(got), np.asarray(expected), atol=2e-4
        )

    def test_svd_matches_local(self):
        """Frame-sharded UNetSpatioTemporal == local: ring attention, halo'd
        temporal convs, pmean'd GN stats all exact."""
        from vdx.models.svd_unet import SVDUNetConfig, UNetSpatioTemporal
        from vdx.parallel.frame_parallel import make_frame_sharded_svd_unet

        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        mesh = make_mesh(1, 4, 1)
        cfg = SVDUNetConfig.tiny()
        local = UNetSpatioTemporal(cfg, policy=FP32_POLICY)
        B, F, H, W = 1, 8, 16, 16
        sample = jax.random.normal(
            jax.random.PRNGKey(0), (B, F, H, W, cfg.in_channels)
        )
        t = jnp.asarray([0.5])
        emb = jax.random.normal(
            jax.random.PRNGKey(1), (B, 1, cfg.cross_attention_dim)
        )
        aids = jnp.asarray([[6.0, 127.0, 0.02]])
        params = fast_init(local, sample, t, emb, aids, seed=2)
        expected = local.apply(params, sample, t, emb, aids)

        _, sharded_apply = make_frame_sharded_svd_unet(
            cfg, mesh, policy=FP32_POLICY, seq_impl="ring"
        )
        got = jax.jit(sharded_apply)(params, sample, t, emb, aids)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(expected), atol=2e-4
        )

    def test_pipeline_surface_matches_unsharded(self):
        """AnimateDiffPipeline(frame_shards=4) == the plain pipeline: same
        params (same init seed), same generation seed, same frames."""
        from vdx.models.clip_text import CLIPTextConfig
        from vdx.models.vae import VAEConfig
        from vdx.pipelines import AnimateDiffPipeline

        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        kwargs = dict(
            seed=0,
            unet_config=UNetMotionConfig.tiny(),
            vae_config=VAEConfig.tiny(),
            text_config=CLIPTextConfig.tiny(),
            policy=FP32_POLICY,
        )
        gen = dict(num_frames=8, height=64, width=64, num_inference_steps=3,
                   seed=7, output_type="np")
        local = AnimateDiffPipeline.with_random_params(**kwargs)
        a = local("portrait", **gen).frames[0]
        sharded = AnimateDiffPipeline.with_random_params(
            frame_shards=4, **kwargs
        )
        b = sharded("portrait", **gen).frames[0]
        assert b.shape == a.shape
        # uint8 frames; ring-attention reduction order may flip the odd LSB
        np.testing.assert_allclose(
            b.astype(np.int32), a.astype(np.int32), atol=1
        )

        # variable-steps program composed with frame sharding: the padded
        # cond-skip scan + shard_map decode must still match the local
        # pipeline for a step count below the program's max.
        sharded_var = AnimateDiffPipeline.with_random_params(
            frame_shards=4, variable_steps=4, **kwargs
        )
        c = sharded_var("portrait", **gen).frames[0]
        np.testing.assert_allclose(
            c.astype(np.int32), a.astype(np.int32), atol=1
        )

        # device output composes with frame sharding: the frames array is
        # sharded over the mesh; np.asarray gathers it to the host equal
        # to the sharded np path.
        d = sharded("portrait", **{**gen, "output_type": "device"})
        np.testing.assert_array_equal(np.asarray(d.frames)[0], b)

    def test_output_shape_sharding(self, setup):
        """Output keeps the input's frame sharding over the mesh axis."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh, cfg, local, params, sample, t, ctx = setup
        _, sharded_apply = make_frame_sharded_unet(cfg, mesh, policy=FP32_POLICY)
        sample_sharded = jax.device_put(sample, NamedSharding(mesh, P(None, "frames")))
        out = jax.jit(sharded_apply)(params, sample_sharded, t, ctx)
        assert out.shape == sample.shape
        assert out.sharding.spec == P(None, "frames")


class TestUlysses:
    """seq_impl="ulysses" — the all-to-all axis swap (SURVEY §5's Ulysses
    option) must be exact vs local execution, like the ring."""

    def test_unet_matches_local(self, setup):
        mesh, cfg, local, params, sample, t, ctx = setup
        expected = local.apply(params, sample, t, ctx)
        _, sharded_apply = make_frame_sharded_unet(
            cfg, mesh, policy=FP32_POLICY, seq_impl="ulysses"
        )
        got = jax.jit(sharded_apply)(params, sample, t, ctx)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(expected), atol=2e-4
        )

    def test_svd_matches_local(self):
        """Ulysses on the SVD denoiser: all-to-all temporal transformers
        compose with halo'd temporal convs + pmean'd GN stats."""
        from vdx.models.svd_unet import SVDUNetConfig, UNetSpatioTemporal
        from vdx.parallel.frame_parallel import make_frame_sharded_svd_unet

        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        mesh = make_mesh(1, 4, 1)
        cfg = SVDUNetConfig.tiny()
        local = UNetSpatioTemporal(cfg, policy=FP32_POLICY)
        B, F, H, W = 1, 8, 16, 16
        sample = jax.random.normal(
            jax.random.PRNGKey(0), (B, F, H, W, cfg.in_channels)
        )
        t = jnp.asarray([0.5])
        emb = jax.random.normal(
            jax.random.PRNGKey(1), (B, 1, cfg.cross_attention_dim)
        )
        aids = jnp.asarray([[6.0, 127.0, 0.02]])
        params = fast_init(local, sample, t, emb, aids, seed=2)
        expected = local.apply(params, sample, t, emb, aids)
        _, sharded_apply = make_frame_sharded_svd_unet(
            cfg, mesh, policy=FP32_POLICY, seq_impl="ulysses"
        )
        got = jax.jit(sharded_apply)(params, sample, t, emb, aids)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(expected), atol=2e-4
        )

    def test_svd_pipeline_ulysses_flocal_1(self):
        """Pipeline surface with seq_impl="ulysses" at F_local=1 — the shape
        that broke the ring fast path. Ulysses reshards to the full frame
        axis so S=F_global locally; mid-block sites whose positions don't
        divide the mesh axis statically fall back to the ring (mixed modes,
        still exact)."""
        from vdx.models.clip_vision import CLIPVisionConfig
        from vdx.models.svd_unet import SVDUNetConfig
        from vdx.models.vae import VAEConfig
        from vdx.pipelines.svd import SVDImg2VidPipeline

        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        kw = dict(unet_config=SVDUNetConfig.tiny(), vae_config=VAEConfig.tiny(),
                  vision_config=CLIPVisionConfig.tiny(), policy=FP32_POLICY)
        gen = dict(num_frames=4, height=64, width=64, num_inference_steps=3,
                   seed=3, decode_chunk=1, output_type="np")
        img = np.random.default_rng(7).random((64, 64, 3)).astype(np.float32)
        exact = SVDImg2VidPipeline.with_random_params(seed=0, **kw)
        a = exact(img, **gen).frames[0]
        sharded = SVDImg2VidPipeline(frame_shards=4, seq_impl="ulysses", **kw)
        sharded.params = exact.params
        b = sharded(img, **gen).frames[0]
        np.testing.assert_allclose(
            b.astype(np.int32), a.astype(np.int32), atol=1
        )

    def test_rejects_unknown_seq_impl(self):
        from vdx.parallel.frame_parallel import make_frame_sharded_denoiser

        mesh = make_mesh(1, 2, 1)
        with pytest.raises(ValueError, match="seq_impl"):
            make_frame_sharded_denoiser(
                UNetMotion, UNetMotionConfig.tiny(), mesh, seq_impl="ulises"
            )


class TestModelScopeAndLatteSharding:
    """Frame sharding on the remaining shardable families (BASELINE
    configs[0] ModelScope UNet3D, configs[4] Latte DiT — the latter names
    "frame-parallel sharding over ICI" explicitly). Both seq_impls exact;
    UNet3D adds halo'd TemporalConv stacks + cross-shard GN stats, Latte
    adds global-index frame PE + ring/ulysses on the odd (temporal) DiT
    blocks only."""

    @pytest.mark.parametrize("seq_impl", ["ulysses", "ring"])
    def test_unet3d_matches_local(self, seq_impl):
        from vdx.models.unet3d import UNet3D, UNet3DConfig
        from vdx.parallel.frame_parallel import make_frame_sharded_denoiser

        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        mesh = make_mesh(1, 4, 1)
        cfg = UNet3DConfig.tiny()
        local = UNet3D(cfg, policy=FP32_POLICY)
        B, F, H, W = 1, 8, 16, 16
        sample = jax.random.normal(jax.random.PRNGKey(0), (B, F, H, W, 4))
        t = jnp.asarray([500])
        ctx = jax.random.normal(
            jax.random.PRNGKey(1), (B, 7, cfg.cross_attention_dim)
        )
        params = fast_init(local, sample, t, ctx, seed=2)
        expected = local.apply(params, sample, t, ctx)
        _, sharded = make_frame_sharded_denoiser(
            UNet3D, cfg, mesh, policy=FP32_POLICY, seq_impl=seq_impl
        )
        got = jax.jit(sharded)(params, sample, t, ctx)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(expected), atol=2e-4
        )

    @pytest.mark.parametrize("seq_impl", ["ulysses", "ring"])
    def test_latte_matches_local(self, seq_impl):
        from vdx.models.dit import LatteConfig, LatteDiT
        from vdx.parallel.frame_parallel import make_frame_sharded_denoiser

        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        mesh = make_mesh(1, 4, 1)
        cfg = LatteConfig.tiny()
        local = LatteDiT(cfg, policy=FP32_POLICY)
        B, F, H, W = 1, 8, 16, 16
        sample = jax.random.normal(jax.random.PRNGKey(3), (B, F, H, W, 4))
        t = jnp.asarray([500])
        ctx = jax.random.normal(
            jax.random.PRNGKey(4), (B, 7, cfg.cross_attention_dim)
        )
        params = fast_init(local, sample, t, ctx, seed=5)
        expected = local.apply(params, sample, t, ctx)
        _, sharded = make_frame_sharded_denoiser(
            LatteDiT, cfg, mesh, policy=FP32_POLICY, seq_impl=seq_impl
        )
        got = jax.jit(sharded)(params, sample, t, ctx)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(expected), atol=2e-4
        )

    def test_latte_pipeline_surface(self):
        """LattePipeline(frame_shards=4) == the plain pipeline end to end."""
        from vdx.models.clip_text import CLIPTextConfig
        from vdx.models.dit import LatteConfig
        from vdx.models.vae import VAEConfig
        from vdx.pipelines import LattePipeline

        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        kwargs = dict(
            seed=0,
            unet_config=LatteConfig.tiny(),
            vae_config=VAEConfig.tiny(),
            text_config=CLIPTextConfig.tiny(),
            policy=FP32_POLICY,
        )
        gen = dict(num_frames=8, height=64, width=64, num_inference_steps=3,
                   seed=7, output_type="np")
        local = LattePipeline.with_random_params(**kwargs)
        a = local("portrait", **gen).frames[0]
        sharded = LattePipeline.with_random_params(frame_shards=4, **kwargs)
        b = sharded("portrait", **gen).frames[0]
        np.testing.assert_allclose(
            b.astype(np.int32), a.astype(np.int32), atol=1
        )


class TestSingleFramePerShard:
    def test_svd_pipeline_flocal_1_exact(self):
        """REGRESSION: with num_frames == frame_shards every shard holds ONE
        frame, so temporal self-attention's local sequence length is 1 —
        which used to trigger the single-KV cross-attention fast path and
        silently attend locally instead of ring-attending across the global
        frame axis (96% of output pixels wrong). The fast path is now gated
        off ring impls (nn/attention.py)."""
        import jax

        from vdx.models.clip_vision import CLIPVisionConfig
        from vdx.models.svd_unet import SVDUNetConfig
        from vdx.models.vae import VAEConfig
        from vdx.pipelines.svd import SVDImg2VidPipeline

        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        kw = dict(unet_config=SVDUNetConfig.tiny(), vae_config=VAEConfig.tiny(),
                  vision_config=CLIPVisionConfig.tiny(), policy=FP32_POLICY)
        gen = dict(num_frames=4, height=64, width=64, num_inference_steps=3,
                   seed=3, decode_chunk=1, output_type="np")
        img = np.random.default_rng(7).random((64, 64, 3)).astype(np.float32)
        exact = SVDImg2VidPipeline.with_random_params(seed=0, **kw)
        a = exact(img, **gen).frames[0]
        sharded = SVDImg2VidPipeline(frame_shards=4, seq_impl="ring", **kw)
        sharded.params = exact.params
        b = sharded(img, **gen).frames[0]
        np.testing.assert_allclose(
            b.astype(np.int32), a.astype(np.int32), atol=1
        )


class TestRaggedFrameSharding:
    """num_frames that do NOT divide the shard count.

    The reference treats num_frames as a FREE parameter (reference
    experiments/05_grid_search_ablation.py:154-169, 01:100-105); the
    BASELINE.json north-star workload is exactly 25 frames over 8 chips.
    The pipeline zero-pads the frame axis to the next shard multiple
    in-program, masks padded slots out of every cross-frame op (temporal
    attention in both seq impls, GN statistics, halo'd temporal convs)
    via ``frames_valid``, and trims the output. These tests feed GARBAGE
    (not zeros) into the pad slots at the model level to prove
    containment, and compare full pipelines against the unpadded local
    program.
    """

    def _mesh(self, n):
        if len(jax.devices()) < n:
            pytest.skip(f"needs {n} virtual devices")
        return make_mesh(1, n, 1)

    @pytest.mark.parametrize("seq_impl", ["ulysses", "ring"])
    @pytest.mark.parametrize("F,n", [(5, 4), (25, 8)])
    def test_unet_motion_matches_local(self, seq_impl, F, n):
        mesh = self._mesh(n)
        cfg = UNetMotionConfig.tiny()
        local = UNetMotion(cfg, policy=FP32_POLICY)
        B, H, W = 1, 16, 16
        sample = jax.random.normal(jax.random.PRNGKey(0), (B, F, H, W, 4))
        t = jnp.asarray([500])
        ctx = jax.random.normal(
            jax.random.PRNGKey(1), (B, 7, cfg.cross_attention_dim)
        )
        params = fast_init(local, sample, t, ctx, seed=2)
        expected = local.apply(params, sample, t, ctx)

        from vdx.parallel.frame_parallel import make_frame_sharded_denoiser

        _, sharded = make_frame_sharded_denoiser(
            UNetMotion, cfg, mesh, policy=FP32_POLICY, seq_impl=seq_impl
        )
        pad = (-F) % n
        garbage = 50.0 * jax.random.normal(
            jax.random.PRNGKey(9), (B, pad, H, W, 4)
        )
        sample_p = jnp.concatenate([sample, garbage], axis=1)
        got = jax.jit(
            lambda p, s, tt, c: sharded(p, s, tt, c, frames_valid=F)
        )(params, sample_p, t, ctx)
        assert bool(jnp.all(jnp.isfinite(got)))
        np.testing.assert_allclose(
            np.asarray(got[:, :F]), np.asarray(expected), atol=2e-4
        )

    @pytest.mark.parametrize("seq_impl", ["ulysses", "ring"])
    @pytest.mark.parametrize("F,n", [(5, 4), (25, 8)])
    def test_svd_unet_matches_local(self, seq_impl, F, n):
        """The north-star denoiser program: F=25 over 8 shards includes a
        shard holding ZERO real frames (frames 28..31) — its garbage must
        not leak into any real frame through ring rotation, Ulysses
        all_to_all, psum'd GN stats, or the temporal-conv halo."""
        from vdx.models.svd_unet import SVDUNetConfig, UNetSpatioTemporal
        from vdx.parallel.frame_parallel import make_frame_sharded_svd_unet

        mesh = self._mesh(n)
        cfg = SVDUNetConfig.tiny()
        local = UNetSpatioTemporal(cfg, policy=FP32_POLICY)
        B, H, W = 1, 16, 16
        sample = jax.random.normal(
            jax.random.PRNGKey(0), (B, F, H, W, cfg.in_channels)
        )
        t = jnp.asarray([0.5])
        emb = jax.random.normal(
            jax.random.PRNGKey(1), (B, 1, cfg.cross_attention_dim)
        )
        aids = jnp.asarray([[6.0, 127.0, 0.02]])
        params = fast_init(local, sample, t, emb, aids, seed=2)
        expected = local.apply(params, sample, t, emb, aids)

        _, sharded = make_frame_sharded_svd_unet(
            cfg, mesh, policy=FP32_POLICY, seq_impl=seq_impl
        )
        pad = (-F) % n
        garbage = 50.0 * jax.random.normal(
            jax.random.PRNGKey(9), (B, pad, H, W, cfg.in_channels)
        )
        sample_p = jnp.concatenate([sample, garbage], axis=1)
        got = jax.jit(
            lambda p, s, tt, e, a: sharded(p, s, tt, e, a, frames_valid=F)
        )(params, sample_p, t, emb, aids)
        assert bool(jnp.all(jnp.isfinite(got)))
        np.testing.assert_allclose(
            np.asarray(got[:, :F]), np.asarray(expected), atol=2e-4
        )

    def test_animatediff_pipeline_f5_n4(self):
        """Full pipeline at a ragged frame count: frames match the local
        program (2D VAE decode is frame-local, so the trim is exact)."""
        from vdx.models.clip_text import CLIPTextConfig
        from vdx.models.vae import VAEConfig
        from vdx.pipelines import AnimateDiffPipeline

        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        kwargs = dict(
            seed=0,
            unet_config=UNetMotionConfig.tiny(),
            vae_config=VAEConfig.tiny(),
            text_config=CLIPTextConfig.tiny(),
            policy=FP32_POLICY,
        )
        gen = dict(num_frames=5, height=64, width=64, num_inference_steps=3,
                   seed=7, output_type="np")
        local = AnimateDiffPipeline.with_random_params(**kwargs)
        a = local("portrait", **gen)
        sharded = AnimateDiffPipeline.with_random_params(
            frame_shards=4, **kwargs
        )
        b = sharded("portrait", **gen)
        assert b.frames[0].shape == (5, 64, 64, 3)
        assert b.latents.shape == a.latents.shape
        np.testing.assert_allclose(
            b.frames[0].astype(np.int32), a.frames[0].astype(np.int32),
            atol=1,
        )

    def test_svd_pipeline_f6_n4(self):
        """SVD full pipeline, ragged: with decode_chunk dividing the local
        frame count the pad frames isolate into their own decode chunk, so
        the temporal-VAE decode of every REAL chunk is bit-identical to the
        local program's — the whole ragged path (masked denoise + zeroed
        pad latents + trim) proves out end to end."""
        from vdx.models.clip_vision import CLIPVisionConfig
        from vdx.models.svd_unet import SVDUNetConfig
        from vdx.models.vae import VAEConfig
        from vdx.pipelines.svd import SVDImg2VidPipeline

        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        kw = dict(unet_config=SVDUNetConfig.tiny(), vae_config=VAEConfig.tiny(),
                  vision_config=CLIPVisionConfig.tiny(), policy=FP32_POLICY)
        gen = dict(num_frames=6, height=64, width=64, num_inference_steps=3,
                   seed=3, decode_chunk=2, output_type="np")
        img = np.random.default_rng(7).random((64, 64, 3)).astype(np.float32)
        local = SVDImg2VidPipeline.with_random_params(seed=0, **kw)
        a = local(img, **gen)
        sharded = SVDImg2VidPipeline(frame_shards=4, **kw)
        sharded.params = local.params
        b = sharded(img, **gen)
        assert b.frames[0].shape == (6, 64, 64, 3)
        np.testing.assert_allclose(
            b.frames[0].astype(np.int32), a.frames[0].astype(np.int32),
            atol=1,
        )

    def test_skip_turbo_composes_ragged(self):
        """Skip turbo mode's drift signal excludes the pad slots: the eval
        decisions (and n_evals) match the local skip pipeline exactly."""
        from vdx.models.clip_text import CLIPTextConfig
        from vdx.models.vae import VAEConfig
        from vdx.pipelines import AnimateDiffPipeline
        from vdx.pipelines.base import SkipConfig

        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        kwargs = dict(
            seed=0,
            unet_config=UNetMotionConfig.tiny(),
            vae_config=VAEConfig.tiny(),
            text_config=CLIPTextConfig.tiny(),
            policy=FP32_POLICY,
            skip=SkipConfig(threshold=0.15, warmup_steps=1,
                            cooldown_steps=1),
        )
        gen = dict(num_frames=5, height=64, width=64, num_inference_steps=4,
                   seed=7, output_type="np")
        local = AnimateDiffPipeline.with_random_params(**kwargs)
        a = local("portrait", **gen)
        sharded = AnimateDiffPipeline.with_random_params(
            frame_shards=4, **kwargs
        )
        b = sharded("portrait", **gen)
        assert int(b.n_evals) == int(a.n_evals)
        np.testing.assert_allclose(
            b.frames[0].astype(np.int32), a.frames[0].astype(np.int32),
            atol=1,
        )

    def test_pab_composes_ragged(self):
        """PAB turbo mode composes with ragged sharding: same schedule,
        caches carry the padded shapes, result matches the local PAB
        pipeline."""
        from vdx.models.clip_text import CLIPTextConfig
        from vdx.models.vae import VAEConfig
        from vdx.pipelines import AnimateDiffPipeline
        from vdx.pipelines.base import PABConfig

        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        kwargs = dict(
            seed=0,
            unet_config=UNetMotionConfig.tiny(),
            vae_config=VAEConfig.tiny(),
            text_config=CLIPTextConfig.tiny(),
            policy=FP32_POLICY,
            pab=PABConfig(spatial_interval=2, temporal_interval=2,
                          cross_interval=2, warmup_steps=1,
                          cooldown_steps=1),
        )
        gen = dict(num_frames=5, height=64, width=64, num_inference_steps=4,
                   seed=7, output_type="np")
        local = AnimateDiffPipeline.with_random_params(**kwargs)
        a = local("portrait", **gen)
        sharded = AnimateDiffPipeline.with_random_params(
            frame_shards=4, **kwargs
        )
        b = sharded("portrait", **gen)
        np.testing.assert_allclose(
            b.frames[0].astype(np.int32), a.frames[0].astype(np.int32),
            atol=1,
        )
