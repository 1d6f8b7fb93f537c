"""LPIPS torch-checkpoint conversion test (synthetic state dict)."""

import jax
import jax.numpy as jnp
import numpy as np

from vdx.metrics.lpips import LPIPS, LPIPSMetric, load_torch_weights
from vdx.core.init import fast_init


def _synthetic_state_dict(rng):
    # torchvision AlexNet features conv layers (OIHW) + lpips lin heads
    convs = {
        0: (64, 3, 11, 11),
        3: (192, 64, 5, 5),
        6: (384, 192, 3, 3),
        8: (256, 384, 3, 3),
        10: (256, 256, 3, 3),
    }
    sd = {}
    for cid, shape in convs.items():
        sd[f"features.{cid}.weight"] = rng.standard_normal(shape).astype(np.float32) * 0.05
        sd[f"features.{cid}.bias"] = rng.standard_normal(shape[0]).astype(np.float32) * 0.05
    for i, ch in enumerate([64, 192, 384, 256, 256]):
        sd[f"lin{i}.model.1.weight"] = np.abs(
            rng.standard_normal((1, ch, 1, 1)).astype(np.float32)
        )
    return sd


class TestLPIPSConversion:
    def test_loads_and_runs(self):
        rng = np.random.default_rng(0)
        sd = _synthetic_state_dict(rng)
        params = load_torch_weights(sd)

        m = LPIPSMetric(params=params)
        a = rng.random((64, 64, 3)).astype(np.float32)
        b = rng.random((64, 64, 3)).astype(np.float32)
        assert m.compute(a, a) < 1e-5
        assert m.compute(a, b) > 0

    def test_param_shapes_match_model(self):
        rng = np.random.default_rng(1)
        params = load_torch_weights(_synthetic_state_dict(rng))
        model = LPIPS()
        dummy = jnp.zeros((1, 64, 64, 3))
        ref = fast_init(model, dummy, dummy, seed=0)

        ref_flat = jax.tree_util.tree_flatten_with_path(ref)[0]
        got_flat = jax.tree_util.tree_flatten_with_path(params)[0]
        ref_shapes = {tuple(str(k) for k in p): v.shape for p, v in ref_flat}
        got_shapes = {tuple(str(k) for k in p): v.shape for p, v in got_flat}
        assert ref_shapes == got_shapes

    def test_conv_weight_transposed_correctly(self):
        rng = np.random.default_rng(2)
        sd = _synthetic_state_dict(rng)
        params = load_torch_weights(sd)
        w_torch = sd["features.0.weight"]  # [64, 3, 11, 11] OIHW
        w_flax = np.asarray(params["params"]["alex"]["conv0"]["kernel"])
        assert w_flax.shape == (11, 11, 3, 64)
        assert w_flax[2, 3, 1, 5] == w_torch[5, 1, 2, 3]
