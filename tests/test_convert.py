"""Weight-conversion tests.

No real checkpoints exist in the build environment, so the oracle is
structural: every leaf of our UNetMotion param tree must be covered by a
mapping rule, and a synthetic torch-shaped state dict built from the rules
must round-trip through the converter with exact layout transforms.
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vdx.core.convert import (
    convert_checkpoint,
    flatten_params,
    t_conv,
    t_dense,
    unet_motion_rules,
    unflatten_params,
)
from vdx.models.unet_motion import UNetMotion, UNetMotionConfig


@pytest.fixture(scope="module")
def tiny_template():
    cfg = UNetMotionConfig.tiny()
    model = UNetMotion(cfg)
    sample = jax.ShapeDtypeStruct((1, 2, 16, 16, 4), jnp.float32)
    t = jax.ShapeDtypeStruct((1,), jnp.int32)
    ctx = jax.ShapeDtypeStruct((1, 7, cfg.cross_attention_dim), jnp.float32)
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0), sample, t, ctx)
    return cfg, params


class TestRuleCoverage:
    def test_every_param_has_a_rule(self, tiny_template):
        cfg, params = tiny_template
        rules = unet_motion_rules(cfg)
        flat = flatten_params(params)
        uncovered = [
            p for p in flat
            if p not in rules
            # conv_shortcut only exists when channels change; rules always
            # include it, but params may not — the reverse (param without
            # rule) is the bug we're hunting.
        ]
        assert not uncovered, f"{len(uncovered)} uncovered: {uncovered[:10]}"

    def test_sd15_full_coverage(self):
        cfg = UNetMotionConfig.sd15()
        model = UNetMotion(cfg)
        sample = jax.ShapeDtypeStruct((1, 2, 8, 8, 4), jnp.float32)
        t = jax.ShapeDtypeStruct((1,), jnp.int32)
        ctx = jax.ShapeDtypeStruct((1, 77, 768), jnp.float32)
        params = jax.eval_shape(model.init, jax.random.PRNGKey(0), sample, t, ctx)
        rules = unet_motion_rules(cfg)
        flat = flatten_params(params)
        uncovered = [p for p in flat if p not in rules]
        assert not uncovered, f"{len(uncovered)} uncovered: {uncovered[:10]}"


class TestVAEAndCLIPCoverage:
    def test_vae_full_coverage(self):
        from vdx.core.convert import vae_rules
        from vdx.models.vae import AutoencoderKL, VAEConfig

        cfg = VAEConfig.sd15()
        vae = AutoencoderKL(cfg)
        params = jax.eval_shape(
            vae.init, jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
        )
        rules = vae_rules(cfg)
        uncovered = [p for p in flatten_params(params) if p not in rules]
        assert not uncovered, uncovered[:10]

    def test_clip_text_full_coverage(self):
        from vdx.core.convert import clip_text_rules
        from vdx.models.clip_text import CLIPTextConfig, CLIPTextModel

        cfg = CLIPTextConfig.sd15()
        model = CLIPTextModel(cfg)
        params = jax.eval_shape(
            model.init, jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32)
        )
        rules = clip_text_rules(cfg)
        uncovered = [p for p in flatten_params(params) if p not in rules]
        assert not uncovered, uncovered[:10]


class TestT5Coverage:
    def test_t5_full_coverage(self):
        from vdx.core.convert import t5_encoder_rules
        from vdx.models.t5 import T5Config, T5Encoder

        cfg = T5Config.tiny()
        model = T5Encoder(cfg)
        params = jax.eval_shape(
            model.init, jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32)
        )
        rules = t5_encoder_rules(cfg)
        uncovered = [p for p in flatten_params(params) if p not in rules]
        assert not uncovered, uncovered[:10]


class TestTransforms:
    def test_conv_transform(self):
        w = np.arange(2 * 3 * 4 * 5).reshape(2, 3, 4, 5).astype(np.float32)  # OIHW
        out = t_conv(w)
        assert out.shape == (4, 5, 3, 2)  # HWIO
        assert out[1, 2, 0, 1] == w[1, 0, 1, 2]

    def test_dense_transform(self):
        w = np.arange(6).reshape(2, 3).astype(np.float32)
        np.testing.assert_array_equal(t_dense(w), w.T)


class TestRoundTrip:
    def test_synthetic_checkpoint_roundtrip(self, tiny_template):
        """Build a torch-shaped state dict from the rules; convert; verify."""
        cfg, params = tiny_template
        rules = unet_motion_rules(cfg)
        flat = flatten_params(params)

        rng = np.random.default_rng(0)
        state_dict = {}
        inverse = {}
        for path, leaf in flat.items():
            hf_key, transform = rules[path]
            target_shape = tuple(leaf.shape)
            if transform is t_conv:
                h, w_, i, o = target_shape
                src = rng.standard_normal((o, i, h, w_)).astype(np.float32)
            elif transform is t_dense:
                i, o = target_shape
                src = rng.standard_normal((o, i)).astype(np.float32)
            else:
                src = rng.standard_normal(target_shape).astype(np.float32)
            state_dict[hf_key] = src
            inverse[path] = transform(src)

        converted, report = convert_checkpoint(state_dict, params, rules)
        assert not report["missing"] and not report["shape_errors"]
        flat_out = flatten_params(converted)
        for path, expected in inverse.items():
            np.testing.assert_array_equal(flat_out[path], expected)

    def test_unflatten_inverts_flatten(self, tiny_template):
        _, params = tiny_template
        flat = flatten_params(params)
        rebuilt = unflatten_params(
            {k: np.zeros(v.shape, np.float32) for k, v in flat.items()}
        )
        assert set(flatten_params(rebuilt)) == set(flat)

    def test_strict_raises_on_missing(self, tiny_template):
        cfg, params = tiny_template
        rules = unet_motion_rules(cfg)
        with pytest.raises(ValueError, match="conversion failed"):
            convert_checkpoint({}, params, rules, strict=True)


# ----------------------------------------------------------------------
# round-2 families: SVD UNet, temporal decoder, CLIP-vision, CogVideoX
# ----------------------------------------------------------------------

from vdx.core.convert import (  # noqa: E402
    causal_vae_decoder_rules,
    causal_vae_encoder_rules,
    clip_vision_rules,
    cogvideox_dit_rules,
    svd_unet_rules,
    t_conv3d,
    t_conv3d_1x1_dense,
    t_patch_conv,
    temporal_decoder_rules,
)


def _src_for(transform, target_shape, rng):
    """Torch-layout source array whose transform lands on target_shape."""
    if transform is t_conv:
        h, w, i, o = target_shape
        return rng.standard_normal((o, i, h, w)).astype(np.float32)
    if transform is t_conv3d:
        t, h, w, i, o = target_shape
        return rng.standard_normal((o, i, t, h, w)).astype(np.float32)
    if transform is t_dense:
        i, o = target_shape
        return rng.standard_normal((o, i)).astype(np.float32)
    if transform is t_conv3d_1x1_dense:
        i, o = target_shape
        return rng.standard_normal((o, i, 1, 1, 1)).astype(np.float32)
    return rng.standard_normal(target_shape).astype(np.float32)


def _assert_coverage_and_roundtrip(params, rules, special=None):
    flat = flatten_params(params)
    uncovered = [p for p in flat if p not in rules]
    assert not uncovered, f"{len(uncovered)} uncovered: {uncovered[:10]}"

    rng = np.random.default_rng(0)
    state_dict, inverse = {}, {}
    for path, leaf in flat.items():
        hf_key, transform = rules[path]
        if special and transform in special:
            src = special[transform](tuple(leaf.shape), rng)
        else:
            src = _src_for(transform, tuple(leaf.shape), rng)
        state_dict[hf_key] = src
        inverse[path] = transform(src)
    converted, report = convert_checkpoint(state_dict, params, rules)
    assert not report["missing"] and not report["shape_errors"]
    out = flatten_params(converted)
    for path, expected in inverse.items():
        np.testing.assert_array_equal(out[path], expected)


class TestRound2FamilyRules:
    def test_svd_unet_full_coverage_roundtrip(self):
        from vdx.models.svd_unet import SVDUNetConfig, UNetSpatioTemporal

        for cfg, roundtrip in ((SVDUNetConfig.tiny(), True),
                               (SVDUNetConfig.svd(), False)):
            model = UNetSpatioTemporal(cfg)
            params = jax.eval_shape(
                model.init, jax.random.PRNGKey(0),
                jax.ShapeDtypeStruct((1, 2, 16, 16, cfg.in_channels), jnp.float32),
                jax.ShapeDtypeStruct((1,), jnp.float32),
                jax.ShapeDtypeStruct((1, 1, cfg.cross_attention_dim), jnp.float32),
                jax.ShapeDtypeStruct((1, 3), jnp.float32),
            )
            rules = svd_unet_rules(cfg)
            if roundtrip:
                # value roundtrip on the tiny tree only; the production tree
                # is coverage-checked (materialising 1.5B params is minutes)
                _assert_coverage_and_roundtrip(params, rules)
            else:
                flat = flatten_params(params)
                uncovered = [p for p in flat if p not in rules]
                assert not uncovered, uncovered[:10]

    def test_temporal_decoder_full_coverage_roundtrip(self):
        from vdx.models.vae import TemporalDecoder, VAEConfig

        cfg = VAEConfig.tiny()
        dec = TemporalDecoder(cfg)
        params = jax.eval_shape(
            lambda k: dec.init(k, jnp.zeros((2, 8, 8, cfg.latent_channels)), 2),
            jax.random.PRNGKey(0),
        )
        _assert_coverage_and_roundtrip(params, temporal_decoder_rules(cfg))

    def test_clip_vision_full_coverage_roundtrip(self):
        from vdx.models.clip_vision import CLIPVisionConfig, CLIPVisionModel

        cfg = CLIPVisionConfig.tiny()
        model = CLIPVisionModel(cfg)
        params = jax.eval_shape(
            model.init, jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.image_size, cfg.image_size, 3)),
        )
        _assert_coverage_and_roundtrip(params, clip_vision_rules(cfg))

    def test_cogvideox_dit_full_coverage_roundtrip(self):
        from vdx.models.cogvideox import CogVideoXConfig, CogVideoXDiT

        cfg = CogVideoXConfig.tiny()
        model = CogVideoXDiT(cfg)
        params = jax.eval_shape(
            model.init, jax.random.PRNGKey(0),
            jnp.zeros((1, 3, 8, 8, cfg.in_channels)), jnp.zeros((1,)),
            jnp.zeros((1, cfg.max_text_len, cfg.text_dim)),
        )

        def patch_src(target_shape, rng):
            pc, d = target_shape  # p*p*C, D
            p = cfg.patch_size
            c = pc // (p * p)
            return rng.standard_normal((d, c, p, p)).astype(np.float32)

        _assert_coverage_and_roundtrip(
            params, cogvideox_dit_rules(cfg), special={t_patch_conv: patch_src}
        )

    def test_causal_vae_full_coverage_roundtrip(self):
        from vdx.models.cogvideox import (
            CausalVAEConfig,
            CausalVAEDecoder,
            CausalVAEEncoder,
        )

        cfg = CausalVAEConfig.tiny()
        enc, dec = CausalVAEEncoder(cfg), CausalVAEDecoder(cfg)
        pe = jax.eval_shape(
            enc.init, jax.random.PRNGKey(0), jnp.zeros((1, 5, 32, 32, 3)))
        pd = jax.eval_shape(
            dec.init, jax.random.PRNGKey(0),
            jnp.zeros((1, 2, 4, 4, cfg.latent_channels)))
        _assert_coverage_and_roundtrip(pe, causal_vae_encoder_rules(cfg))
        _assert_coverage_and_roundtrip(pd, causal_vae_decoder_rules(cfg))


class TestUNet3DAndLatteRules:
    def test_unet3d_full_coverage_roundtrip(self):
        from vdx.core.convert import unet3d_rules
        from vdx.models.unet3d import UNet3D, UNet3DConfig

        cfg = UNet3DConfig.tiny()
        model = UNet3D(cfg)
        params = jax.eval_shape(
            model.init, jax.random.PRNGKey(0),
            jax.ShapeDtypeStruct((1, 2, 16, 16, cfg.in_channels), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
            jax.ShapeDtypeStruct((1, 7, cfg.cross_attention_dim), jnp.float32),
        )
        _assert_coverage_and_roundtrip(params, unet3d_rules(cfg))

    def test_latte_coverage(self):
        """Every Latte leaf except the documented unconvertible ones."""
        from vdx.core.convert import LATTE_UNCOVERED, latte_dit_rules
        from vdx.models.dit import LatteConfig, LatteDiT

        cfg = LatteConfig.tiny()
        model = LatteDiT(cfg)
        params = jax.eval_shape(
            model.init, jax.random.PRNGKey(0),
            jax.ShapeDtypeStruct((1, 2, 8, 8, cfg.in_channels), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
            jax.ShapeDtypeStruct((1, 7, cfg.cross_attention_dim), jnp.float32),
        )
        rules = latte_dit_rules(cfg)
        uncovered = [
            p for p in flatten_params(params)
            if p not in rules and p not in LATTE_UNCOVERED
        ]
        assert not uncovered, uncovered[:10]

    def test_latte_scale_shift_table_flatten(self):
        from vdx.core.convert import t_flatten

        w = np.arange(12).reshape(6, 2).astype(np.float32)
        np.testing.assert_array_equal(t_flatten(w), np.arange(12))


class TestLoadPretrained:
    """The from_pretrained surface: safetensors files -> pipeline params
    through the per-family rules, plus the CLI wrapper."""

    def _synth_sources(self, pipe, tmp_path):
        """Synthesise torch-shaped .safetensors files for every component
        from the pipeline's own conversion rules; returns (sources,
        expected {component: {path: converted leaf}})."""
        from safetensors.numpy import save_file

        rng = np.random.default_rng(0)
        sources, expected = {}, {}
        for comp, (rules, allowed) in pipe._conversion_rules().items():
            flat = flatten_params(pipe.params[comp])
            sd, inv = {}, {}
            for path, leaf in flat.items():
                if any(a in path for a in allowed):
                    continue
                hf_key, transform = rules[path]
                src = _src_for(transform, tuple(leaf.shape), rng)
                sd[hf_key] = src
                inv[path] = transform(src)
            f = tmp_path / f"{comp}.safetensors"
            save_file(sd, str(f))
            sources[comp] = str(f)
            expected[comp] = inv
        return sources, expected

    def test_animatediff_two_file_merge_and_generate(self, tmp_path):
        """AnimateDiff's hub layout: separate UNet + motion-adapter files
        merged into one state dict (reference 01:60-73); loaded pipeline
        generates and its leaves equal the transformed torch tensors."""
        from safetensors.numpy import load_file, save_file

        from vdx.core.dtypes import FP32_POLICY
        from vdx.models.clip_text import CLIPTextConfig
        from vdx.models.vae import VAEConfig
        from vdx.pipelines import AnimateDiffPipeline

        kw = dict(
            unet_config=UNetMotionConfig.tiny(),
            vae_config=VAEConfig.tiny(),
            text_config=CLIPTextConfig.tiny(),
            policy=FP32_POLICY,
        )
        pipe = AnimateDiffPipeline.with_random_params(seed=0, **kw)
        sources, expected = self._synth_sources(pipe, tmp_path)

        # split the unet file into (unet, motion) like the hub ships it
        unet_sd = load_file(sources["unet"])
        motion = {k: v for k, v in unet_sd.items() if "motion_modules" in k}
        assert motion, "tiny config should still have motion modules"
        rest = {k: v for k, v in unet_sd.items() if k not in motion}
        save_file(rest, str(tmp_path / "unet_only.safetensors"))
        save_file(motion, str(tmp_path / "motion.safetensors"))
        sources["unet"] = [str(tmp_path / "unet_only.safetensors"),
                           str(tmp_path / "motion.safetensors")]

        loaded = AnimateDiffPipeline.from_pretrained(sources, **kw)
        for comp, inv in expected.items():
            got = flatten_params(loaded.params[comp])
            for path, want in inv.items():
                np.testing.assert_allclose(
                    np.asarray(got[path]), want, rtol=0, atol=0,
                    err_msg=f"{comp}/{path}")
        out = loaded("a corgi", num_frames=4, height=64, width=64,
                     num_inference_steps=2, seed=3, output_type="np")
        assert out.frames[0].shape == (4, 64, 64, 3)

    def test_strict_contract(self, tmp_path):
        from vdx.core.dtypes import FP32_POLICY
        from vdx.models.clip_text import CLIPTextConfig
        from vdx.models.vae import VAEConfig
        from vdx.pipelines import AnimateDiffPipeline

        kw = dict(
            unet_config=UNetMotionConfig.tiny(),
            vae_config=VAEConfig.tiny(),
            text_config=CLIPTextConfig.tiny(),
            policy=FP32_POLICY,
        )
        pipe = AnimateDiffPipeline.with_random_params(seed=0, **kw)
        sources, _ = self._synth_sources(pipe, tmp_path)
        with pytest.raises(ValueError, match="unknown components"):
            pipe.load_pretrained({"nope": sources["vae"]})
        with pytest.raises(ValueError, match="missing components"):
            pipe.load_pretrained({"vae": sources["vae"]})
        # non-strict partial load keeps the other components' values
        before = np.asarray(
            flatten_params(pipe.params["text"])["token_embedding/embedding"])
        pipe.load_pretrained({"vae": sources["vae"]}, strict=False)
        after = np.asarray(
            flatten_params(pipe.params["text"])["token_embedding/embedding"])
        np.testing.assert_array_equal(before, after)

    def test_cli_roundtrip(self, tmp_path):
        """scripts/convert_checkpoint.py end to end on tiny SVD: convert,
        save Orbax, load back, generate."""
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "convert_checkpoint",
            Path(__file__).resolve().parents[1]
            / "scripts" / "convert_checkpoint.py",
        )
        cli = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(cli)

        from vdx.core.dtypes import FP32_POLICY
        from vdx.models.clip_vision import CLIPVisionConfig
        from vdx.models.svd_unet import SVDUNetConfig
        from vdx.models.vae import VAEConfig
        from vdx.pipelines import SVDImg2VidPipeline

        kw = dict(
            unet_config=SVDUNetConfig.tiny(),
            vae_config=VAEConfig.tiny(),
            vision_config=CLIPVisionConfig.tiny(),
            policy=FP32_POLICY,
        )
        pipe = SVDImg2VidPipeline.with_random_params(seed=0, **kw)
        sources, expected = self._synth_sources(pipe, tmp_path)

        assert cli.main(["--family", "svd", "--list-components",
                         "--tiny", "--dtype", "fp32"]) == 0
        out_dir = tmp_path / "ckpt"
        argv = ["--family", "svd", "--tiny", "--dtype", "fp32",
                "--out", str(out_dir)]
        for comp, path in sources.items():
            argv += ["--src", f"{comp}={path}"]
        assert cli.main(argv) == 0

        loaded = SVDImg2VidPipeline(**kw)
        loaded.load_checkpoint(out_dir)
        got = flatten_params(loaded.params["unet"])
        some = list(expected["unet"].items())[:5]
        for path, want in some:
            np.testing.assert_allclose(np.asarray(got[path]), want,
                                       rtol=0, atol=0, err_msg=path)
        image = np.zeros((64, 64, 3), np.float32)
        out = loaded(image, num_frames=4, height=64, width=64,
                     num_inference_steps=2, seed=1, decode_chunk=2)
        assert out.frames[0].shape == (4, 64, 64, 3)
