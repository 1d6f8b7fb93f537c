"""Weight-conversion tests.

No real checkpoints exist in the build environment, so the oracle is
structural: every leaf of our UNetMotion param tree must be covered by a
mapping rule, and a synthetic torch-shaped state dict built from the rules
must round-trip through the converter with exact layout transforms.
"""

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
