"""Numerical parity vs REAL torch modules (transformers, random-init).

The build environment has no hub access, so real checkpoints cannot be
downloaded — but torch + transformers ARE installed. That lets us validate
both halves of the conversion story with genuine torch weight tensors:

  1. the layout rules in core/convert.py (torch state_dict -> our tree), and
  2. our model math itself,

by instantiating the transformers implementation of each text/vision tower
with a tiny random-init config, converting its state_dict through our rules,
and comparing fp32 forward outputs end to end. This covers every conditioning
encoder the reference stack loads from the hub
(reference experiments/01_baseline_generation.py:55-73 — SD-1.5's CLIP text
tower; SVD's CLIP-vision tower and CogVideoX's T5 tower per BASELINE.json
configs[2], configs[3]).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from vdx.core.convert import (  # noqa: E402
    clip_text_rules,
    clip_vision_rules,
    convert_checkpoint,
    t5_encoder_rules,
)
from vdx.core.dtypes import FP32_POLICY  # noqa: E402


def _to_numpy_state_dict(model):
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


def test_clip_text_matches_transformers():
    from vdx.models.clip_text import CLIPTextConfig, CLIPTextModel

    cfg = CLIPTextConfig.tiny()
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_act="quick_gelu",
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = transformers.CLIPTextModel(hf_cfg).eval()

    ids = np.array([[49406, 320, 1125, 539, 12, 49407, 0, 0],
                    [49406, 777, 49407, 0, 0, 0, 0, 0]], np.int64)
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).last_hidden_state.numpy()

    model = CLIPTextModel(cfg, policy=FP32_POLICY)
    template = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.zeros_like(jnp.asarray(ids))
    )
    params, report = convert_checkpoint(
        _to_numpy_state_dict(hf), template, clip_text_rules(cfg)
    )
    assert not report["missing"] and not report["shape_errors"]
    got = np.asarray(model.apply(params, jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_t5_encoder_matches_transformers():
    from vdx.models.t5 import T5Config, T5Encoder

    cfg = T5Config.tiny()
    hf_cfg = transformers.T5Config(
        vocab_size=cfg.vocab_size,
        d_model=cfg.d_model,
        d_kv=cfg.d_kv,
        d_ff=cfg.d_ff,
        num_layers=cfg.num_layers,
        num_heads=cfg.num_heads,
        relative_attention_num_buckets=cfg.relative_attention_num_buckets,
        relative_attention_max_distance=cfg.relative_attention_max_distance,
        feed_forward_proj="gated-gelu",  # T5 v1.1 (CogVideoX's tower)
        dropout_rate=0.0,
    )
    torch.manual_seed(1)
    hf = transformers.T5EncoderModel(hf_cfg).eval()

    rng = np.random.default_rng(2)
    ids = rng.integers(0, cfg.vocab_size, (2, 19), dtype=np.int64)
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).last_hidden_state.numpy()

    model = T5Encoder(cfg, policy=FP32_POLICY)
    template = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.zeros_like(jnp.asarray(ids))
    )
    params, report = convert_checkpoint(
        _to_numpy_state_dict(hf), template, t5_encoder_rules(cfg)
    )
    assert not report["missing"] and not report["shape_errors"]
    got = np.asarray(model.apply(params, jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_clip_vision_matches_transformers():
    from vdx.models.clip_vision import (
        IMAGE_MEAN,
        IMAGE_STD,
        CLIPVisionConfig,
        CLIPVisionModel,
    )

    cfg = CLIPVisionConfig.tiny()
    hf_cfg = transformers.CLIPVisionConfig(
        image_size=cfg.image_size,
        patch_size=cfg.patch_size,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        projection_dim=cfg.projection_dim,
        hidden_act="quick_gelu",
        attn_implementation="eager",
    )
    torch.manual_seed(3)
    hf = transformers.CLIPVisionModelWithProjection(hf_cfg).eval()

    rng = np.random.default_rng(4)
    pixels = rng.uniform(0, 1, (2, cfg.image_size, cfg.image_size, 3)).astype(
        np.float32
    )
    # Our model normalises [0,1] input internally; transformers expects
    # already-normalised NCHW pixel_values.
    normed = (pixels - np.asarray(IMAGE_MEAN, np.float32)) / np.asarray(
        IMAGE_STD, np.float32
    )
    with torch.no_grad():
        want = hf(torch.from_numpy(normed.transpose(0, 3, 1, 2))).image_embeds.numpy()

    model = CLIPVisionModel(cfg, policy=FP32_POLICY)
    template = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.asarray(pixels)
    )
    params, report = convert_checkpoint(
        _to_numpy_state_dict(hf), template, clip_vision_rules(cfg)
    )
    assert not report["missing"] and not report["shape_errors"]
    got = np.asarray(model.apply(params, jnp.asarray(pixels)))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)
