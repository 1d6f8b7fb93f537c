"""LPIPS architecture-level parity vs a REAL torch graph (random weights).

The env has no lpips/torchvision packages and no hub (so the published
weight VALUES stay unreachable — VERDICT #2/#5), but torch itself is
installed. This pins everything except the numbers: we build torch's
AlexNet-features + ScalingLayer + lin-head graph from the published LPIPS
structure (lpips package net='alex'; reference
experiments/06_measure_grid_search.py:122-154), random-init it, export a
state_dict under the published key names, convert through
``vdx.metrics.lpips.load_torch_weights``, and assert our Flax forward
matches the torch forward end to end at fp32 tolerance.

When hub access appears, the same path loads the real checkpoint and only
golden VALUES remain to verify.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from vdx.metrics.lpips import (  # noqa: E402
    _ALEX_STAGES,
    _SCALE,
    _SHIFT,
    LPIPS,
    load_torch_weights,
)


def _build_torch_alex_features():
    """torchvision.models.alexnet().features, reconstructed from the
    published structure (conv ids 0,3,6,8,10; ReLU; MaxPool(3,2) after
    stages 0, 1 and 4 — LPIPS taps the relu outputs, so the final pool
    never affects the taps)."""
    layers = []
    in_ch = 3
    conv_ids = {}
    for i, (ch, k, s, p) in enumerate(_ALEX_STAGES):
        conv_ids[i] = len(layers)
        layers.append(torch.nn.Conv2d(in_ch, ch, k, stride=s, padding=p))
        layers.append(torch.nn.ReLU(inplace=False))
        if i in (0, 1):
            layers.append(torch.nn.MaxPool2d(3, stride=2))
        in_ch = ch
    assert list(conv_ids.values()) == [0, 3, 6, 8, 10]  # published indices
    return torch.nn.Sequential(*layers), conv_ids


def _torch_lpips_forward(features, lins, x, y):
    """The published LPIPS forward: scale -> features -> unit-normalise ->
    squared diff -> 1x1 lin head -> spatial mean -> sum over stages."""
    shift = torch.tensor(_SHIFT).view(1, 3, 1, 1)
    scale = torch.tensor(_SCALE).view(1, 3, 1, 1)

    def taps(z):
        z = (z - shift) / scale
        outs = []
        for layer in features:
            z = layer(z)
            if isinstance(layer, torch.nn.ReLU):
                outs.append(z)
        return outs

    fx, fy = taps(x), taps(y)
    total = torch.zeros(x.shape[0])
    for i, (a, b) in enumerate(zip(fx, fy)):
        a = a / torch.sqrt((a * a).sum(dim=1, keepdim=True) + 1e-10)
        b = b / torch.sqrt((b * b).sum(dim=1, keepdim=True) + 1e-10)
        d = (a - b) ** 2
        total = total + lins[i](d).mean(dim=(2, 3)).squeeze(1)
    return total


class TestLPIPSTorchParity:
    def test_flax_matches_torch_graph(self):
        torch.manual_seed(0)
        features, conv_ids = _build_torch_alex_features()
        # lin heads: published lpips weights are non-negative (trained with
        # a clamp); our Flax model enforces that with abs(), so random
        # NON-NEGATIVE heads make abs() the identity for exact parity.
        lins = [
            torch.nn.Conv2d(ch, 1, 1, bias=False)
            for (ch, *_rest) in _ALEX_STAGES
        ]
        with torch.no_grad():
            for lin in lins:
                lin.weight.abs_()

        # state_dict under the lpips package's published key names
        state_dict = {}
        for i, cid in enumerate(conv_ids.values()):
            conv = features[cid]
            state_dict[f"features.{cid}.weight"] = conv.weight.detach().numpy()
            state_dict[f"features.{cid}.bias"] = conv.bias.detach().numpy()
        for i, lin in enumerate(lins):
            state_dict[f"lin{i}.model.1.weight"] = lin.weight.detach().numpy()

        params = load_torch_weights(state_dict)

        rng = np.random.default_rng(0)
        x = (rng.random((2, 64, 64, 3), np.float32) * 2 - 1).astype(np.float32)
        y = (rng.random((2, 64, 64, 3), np.float32) * 2 - 1).astype(np.float32)

        with torch.no_grad():
            want = _torch_lpips_forward(
                features, lins,
                torch.from_numpy(x.transpose(0, 3, 1, 2)),
                torch.from_numpy(y.transpose(0, 3, 1, 2)),
            ).numpy()

        got = np.asarray(LPIPS().apply(params, x, y))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_conversion_covers_all_params(self):
        """Every leaf of the Flax LPIPS tree must be produced by the
        converter (the repo's target-driven conversion contract)."""
        import jax

        torch.manual_seed(1)
        features, conv_ids = _build_torch_alex_features()
        lins = [
            torch.nn.Conv2d(ch, 1, 1, bias=False)
            for (ch, *_r) in _ALEX_STAGES
        ]
        state_dict = {}
        for i, cid in enumerate(conv_ids.values()):
            state_dict[f"features.{cid}.weight"] = features[cid].weight.detach().numpy()
            state_dict[f"features.{cid}.bias"] = features[cid].bias.detach().numpy()
        for i, lin in enumerate(lins):
            state_dict[f"lin{i}.model.1.weight"] = lin.weight.detach().numpy()
        params = load_torch_weights(state_dict)

        dummy = np.zeros((1, 64, 64, 3), np.float32)
        want_tree = jax.eval_shape(
            lambda: LPIPS().init(jax.random.PRNGKey(0), dummy, dummy)
        )
        want_paths = {
            jax.tree_util.keystr(p)
            for p, _ in jax.tree_util.tree_flatten_with_path(want_tree)[0]
        }
        got_paths = {
            jax.tree_util.keystr(p)
            for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]
        }
        assert got_paths == want_paths
        # shapes must match the model's expectations too
        want_shapes = {
            jax.tree_util.keystr(p): v.shape
            for p, v in jax.tree_util.tree_flatten_with_path(want_tree)[0]
        }
        got_shapes = {
            jax.tree_util.keystr(p): v.shape
            for p, v in jax.tree_util.tree_flatten_with_path(params)[0]
        }
        assert got_shapes == want_shapes
