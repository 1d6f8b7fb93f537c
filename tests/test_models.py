"""Model shape/contract tests on tiny configs (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vdx.core.dtypes import FP32_POLICY
from vdx.models.clip_text import CLIPTextConfig, CLIPTextModel
from vdx.models.tokenizer import BOS_ID, CONTEXT_LENGTH, EOS_ID, FallbackBPETokenizer
from vdx.models.unet_motion import UNetMotion, UNetMotionConfig
from vdx.models.vae import AutoencoderKL, VAEConfig
from vdx.nn.temporal import TemporalTransformer3D
from vdx.ops.groupnorm import group_norm
from vdx.core.init import fast_init


class TestGroupNorm:
    def test_matches_torch(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 5, 7, 32)).astype(np.float32)
        scale = rng.standard_normal(32).astype(np.float32)
        bias = rng.standard_normal(32).astype(np.float32)

        ours = group_norm(jnp.asarray(x), 8, jnp.asarray(scale), jnp.asarray(bias))

        gn = torch.nn.GroupNorm(8, 32, eps=1e-5)
        with torch.no_grad():
            gn.weight.copy_(torch.from_numpy(scale))
            gn.bias.copy_(torch.from_numpy(bias))
            # torch is channels-first
            xt = torch.from_numpy(x).permute(0, 3, 1, 2)
            expected = gn(xt).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(ours), expected, atol=2e-5)

    def test_5d_stats_span_frames(self):
        """GN over [B,F,H,W,C] must differ from per-frame GN when frames differ."""
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((1, 4, 3, 3, 8)).astype(np.float32))
        joint = group_norm(x, 2, None, None)
        per_frame = jnp.stack(
            [group_norm(x[:, f], 2, None, None) for f in range(4)], axis=1
        )
        assert not np.allclose(np.asarray(joint), np.asarray(per_frame), atol=1e-3)


class TestTokenizer:
    def test_shapes_and_special_tokens(self):
        tok = FallbackBPETokenizer()
        ids = tok(["a corgi walking on the beach", ""])
        assert ids.shape == (2, CONTEXT_LENGTH)
        assert ids[0, 0] == BOS_ID
        assert EOS_ID in ids[0]
        assert ids[1, 0] == BOS_ID and ids[1, 1] == EOS_ID

    def test_determinism(self):
        tok = FallbackBPETokenizer()
        a = tok("portrait of a man with glasses")
        b = tok("portrait of a man with glasses")
        np.testing.assert_array_equal(a, b)


class TestCLIPText:
    def test_forward_shape(self):
        cfg = CLIPTextConfig.tiny()
        model = CLIPTextModel(cfg, policy=FP32_POLICY)
        ids = jnp.zeros((2, 77), dtype=jnp.int32)
        params = fast_init(model, ids, seed=0)
        out = model.apply(params, ids)
        assert out.shape == (2, 77, cfg.hidden_size)
        assert out.dtype == jnp.float32

    def test_causality(self):
        """Changing a later token must not affect earlier positions."""
        cfg = CLIPTextConfig.tiny()
        model = CLIPTextModel(cfg, policy=FP32_POLICY)
        ids = jnp.ones((1, 10), dtype=jnp.int32)
        params = fast_init(model, ids, seed=0)
        out1 = model.apply(params, ids)
        ids2 = ids.at[0, 7].set(5)
        out2 = model.apply(params, ids2)
        np.testing.assert_allclose(out1[0, :7], out2[0, :7], atol=1e-5)
        assert not np.allclose(out1[0, 7:], out2[0, 7:], atol=1e-5)


class TestVAE:
    def test_roundtrip_shapes(self):
        cfg = VAEConfig.tiny()
        vae = AutoencoderKL(cfg, policy=FP32_POLICY)
        x = jnp.zeros((1, 32, 32, 3))
        params = fast_init(vae, x, seed=0)
        z = vae.apply(params, x, method=vae.encode)
        assert z.shape == (1, 4, 4, 4)  # 8x spatial down
        y = vae.apply(params, z, method=vae.decode)
        assert y.shape == (1, 32, 32, 3)


class TestTemporalModule:
    def test_identity_batch_mixing(self):
        """Motion module must mix ONLY across frames, never across batch/space."""
        model = TemporalTransformer3D(heads=2, policy=FP32_POLICY)
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((4, 3, 3, 16)).astype(np.float32)
        )  # B=2, F=2
        params = fast_init(model, x, 2, seed=0)
        out1 = model.apply(params, x, 2)
        assert out1.shape == x.shape
        # Perturb batch element 1's frames; batch element 0 output unchanged.
        x2 = x.at[2:].add(1.0)
        out2 = model.apply(params, x2, 2)
        np.testing.assert_allclose(out1[:2], out2[:2], atol=1e-5)

    def test_frames_do_mix(self):
        model = TemporalTransformer3D(heads=2, policy=FP32_POLICY)
        x = jnp.asarray(
            np.random.default_rng(1).standard_normal((4, 3, 3, 16)).astype(np.float32)
        )
        params = fast_init(model, x, 2, seed=0)
        out1 = model.apply(params, x, 2)
        x2 = x.at[1].add(1.0)  # frame 1 of batch element 0
        out2 = model.apply(params, x2, 2)
        # frame 0 of the same batch element must change (attends to frame 1)
        assert not np.allclose(out1[0], out2[0], atol=1e-6)


@pytest.fixture(scope="module")
def tiny_unet_motion():
    """ONE jitted tiny UNetMotion shared by the forward tests (each eager
    apply costs ~45 s on the 1-core CPU runner; one jit compile serves all)."""
    cfg = UNetMotionConfig.tiny()
    model = UNetMotion(cfg, policy=FP32_POLICY)
    B, F, H, W = 1, 4, 16, 16
    sample = jnp.zeros((B, F, H, W, 4))
    ctx = jnp.zeros((B, 7, cfg.cross_attention_dim))
    params = fast_init(model, sample, jnp.asarray([500]), ctx, seed=0)
    japply = jax.jit(model.apply)
    return model, params, japply, sample, ctx


class TestUNetMotion:
    def test_forward_shape_and_determinism(self, tiny_unet_motion):
        model, params, japply, sample, ctx = tiny_unet_motion
        out = japply(params, sample, jnp.asarray([500]), ctx)
        assert out.shape == sample.shape
        out2 = japply(params, sample, jnp.asarray([500]), ctx)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))

    def test_timestep_changes_output(self, tiny_unet_motion):
        model, params, japply, _, ctx = tiny_unet_motion
        sample = jnp.ones((1, 4, 16, 16, 4))
        o1 = japply(params, sample, jnp.asarray([1]), ctx)
        o2 = japply(params, sample, jnp.asarray([900]), ctx)
        assert not np.allclose(np.asarray(o1), np.asarray(o2), atol=1e-4)

    def test_sd15_param_count(self):
        """Full SD-1.5 + motion config lands near the reference's 1312.7M.

        (docs/02_video_diffusion_architecture.md:85-94: UNet ~860M + motion
        ~450M. Structural choices that can't be verified without weights —
        e.g. per-block motion depth — make a ±15% band the honest check.)
        """
        cfg = UNetMotionConfig.sd15()
        model = UNetMotion(cfg)
        sample = jax.ShapeDtypeStruct((1, 2, 8, 8, 4), jnp.float32)
        t = jax.ShapeDtypeStruct((1,), jnp.int32)
        ctx = jax.ShapeDtypeStruct((1, 77, 768), jnp.float32)
        params = jax.eval_shape(model.init, jax.random.PRNGKey(0), sample, t, ctx)
        n = sum(np.prod(x.shape) for x in jax.tree.leaves(params))
        assert 0.85e9 < n < 1.55e9, f"param count {n/1e6:.1f}M"


class TestSpatialTiledDecode:
    def _vae(self):
        import jax

        from vdx.models.vae import AutoencoderKL, VAEConfig

        cfg = VAEConfig.tiny()
        vae = AutoencoderKL(cfg)
        params = fast_init(vae, jnp.zeros((1, 32, 32, 3)), seed=0)
        return cfg, vae, params

    def test_blend_exact_for_local_decoder(self):
        """With a purely local shift-invariant decode_fn, tiling + overlap
        blending must reproduce the untiled result EXACTLY — this pins the
        window/ramp/normalisation arithmetic in isolation (a real conv+GN
        decoder couples tiles globally, so only closeness holds there)."""
        import jax
        import numpy as np

        from vdx.models.vae import decode_spatial_tiled

        u = 8
        dec = lambda z: jnp.repeat(  # noqa: E731
            jnp.repeat(z[..., :3], u, axis=1), u, axis=2)
        z = jax.random.normal(jax.random.PRNGKey(0), (2, 20, 24, 4))
        full = dec(z)
        tiled = decode_spatial_tiled(dec, z, u, tile=8, overlap=4)
        np.testing.assert_allclose(
            np.asarray(tiled), np.asarray(full), atol=1e-5)

    def test_random_field_close_and_shape(self):
        import jax
        import numpy as np

        from vdx.models.vae import decode_spatial_tiled

        cfg, vae, params = self._vae()
        z = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, cfg.latent_channels))
        dec = lambda zz: vae.apply(params, zz, method=vae.decode)  # noqa: E731
        full = np.asarray(dec(z))
        tiled = np.asarray(
            decode_spatial_tiled(dec, z, cfg.downscale, tile=12, overlap=6))
        assert tiled.shape == full.shape
        # tiles see truncated receptive fields: close, not identical
        diff = np.abs(tiled - full).mean()
        assert diff < 0.15 * np.abs(full).std(), diff


class TestSingleKVAttention:
    """The Skv==1 cross-attention fast path (nn/attention.py): softmax over
    one key is identically 1, so output == to_out(v) broadcast. Reference:
    the SAME params over the token DUPLICATED to Skv=2 take the general
    path and are mathematically equal (0.5/0.5 probs of identical v)."""

    def test_exact_vs_duplicated_kv(self):
        from vdx.nn.attention import Attention

        attn = Attention(query_dim=32, heads=2, head_dim=16, context_dim=24,
                         policy=FP32_POLICY)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, 9, 32)), jnp.float32)
        ctx1 = jnp.asarray(rng.standard_normal((2, 1, 24)), jnp.float32)
        params = attn.init(jax.random.PRNGKey(0), x, ctx1)
        # param tree identical to the general path's (to_q/to_k still exist)
        assert {"to_q", "to_k", "to_v", "to_out"} <= set(
            params["params"].keys())
        fast = attn.apply(params, x, ctx1)
        ref = attn.apply(params, x, jnp.concatenate([ctx1, ctx1], axis=1))
        np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


class TestFrameConv3:
    """FrameConv3 (temporal 3x1x1 conv as three shifted matmuls) must be
    numerically equal to nn.Conv((3,1,1)) ON THE SAME PARAMS — the param
    tree is declared identical so checkpoints/conversion are unaffected."""

    def _ref_conv(self, C):
        import flax.linen as nn

        return nn.Conv(C, (3, 1, 1), padding=[(1, 1), (0, 0), (0, 0)],
                       dtype=jnp.float32, param_dtype=jnp.float32)

    def test_same_padding_matches_conv(self):
        from vdx.nn.temporal import FrameConv3

        C = 8
        mm = FrameConv3(C, padding="same", policy=FP32_POLICY)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, 5, 3, 4, C)), jnp.float32)
        params = mm.init(jax.random.PRNGKey(0), x)
        assert params["params"]["kernel"].shape == (3, 1, 1, C, C)
        ref = self._ref_conv(C).apply(params, x)
        got = mm.apply(params, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_valid_padding_matches_conv(self):
        from vdx.nn.temporal import FrameConv3

        C = 8
        mm = FrameConv3(C, padding="valid", policy=FP32_POLICY)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((2, 7, 3, 4, C)), jnp.float32)
        params = mm.init(jax.random.PRNGKey(0), x)
        import flax.linen as nn

        ref = nn.Conv(C, (3, 1, 1), padding="VALID", dtype=jnp.float32,
                      param_dtype=jnp.float32).apply(params, x)
        got = mm.apply(params, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


class TestSpatialConv3x3:
    """SpatialConv3x3 (3x3 conv as nine shifted matmuls) must equal
    nn.Conv((3,3), SAME) on the same params — identical param tree."""

    def test_matches_conv(self):
        import flax.linen as nn

        from vdx.nn.resnet import SpatialConv3x3

        C = 8
        mm = SpatialConv3x3(C, policy=FP32_POLICY)
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((2, 5, 6, C)), jnp.float32)
        params = mm.init(jax.random.PRNGKey(0), x)
        assert params["params"]["kernel"].shape == (3, 3, C, C)
        ref = nn.Conv(C, (3, 3), padding=[(1, 1), (1, 1)], dtype=jnp.float32,
                      param_dtype=jnp.float32).apply(params, x)
        got = mm.apply(params, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
