"""LPIPS perceptual metric (AlexNet backbone) in Flax.

Rebuilds the ``lpips.LPIPS(net='alex')`` CUDA stack the reference uses
(reference experiments/06_measure_grid_search.py:122-154): inputs in [0,1]
are shifted to [-1,1] (06:143-144), pushed through the 5 AlexNet conv stages,
unit-normalised per channel, squared-differenced, 1x1-conv weighted ("lin"
heads) and spatially averaged, summed over stages.

Weights: the published LPIPS linear heads + torchvision AlexNet features are
hub artifacts; :func:`load_torch_weights` converts them (OIHW->HWIO) when a
checkpoint file is available. In the zero-egress build environment tests run
with seeded random weights — the metric *contract* (shape, symmetry,
zero-on-identical, jit-batchability) is what is verified there; numerical
golden values require the real weights (SURVEY.md §4).
"""

from __future__ import annotations

from typing import List

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# ImageNet normalisation baked into LPIPS's ScalingLayer.
_SHIFT = np.array([-0.030, -0.088, -0.188], dtype=np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], dtype=np.float32)

# AlexNet 'features' stages: (out_ch, kernel, stride, pad); maxpool between.
_ALEX_STAGES = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
_POOL_AFTER = {0, 1}  # maxpool(3, stride 2) after stages 0 and 1 (and 4, unused)


class AlexNetFeatures(nn.Module):
    """torchvision AlexNet ``features``, channels-last, relu outputs per stage."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        outs = []
        for i, (ch, k, s, p) in enumerate(_ALEX_STAGES):
            x = nn.Conv(
                ch, (k, k), strides=(s, s), padding=[(p, p), (p, p)], name=f"conv{i}"
            )(x)
            x = nn.relu(x)
            outs.append(x)
            if i in _POOL_AFTER:
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
        return outs


class LPIPS(nn.Module):
    """Perceptual distance between two [B, H, W, 3] images in [-1, 1]."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        net = AlexNetFeatures(name="alex")
        fx = net((x - shift) / scale)
        fy = net((y - shift) / scale)

        total = jnp.zeros((x.shape[0],), jnp.float32)
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a / jnp.sqrt(jnp.sum(a * a, axis=-1, keepdims=True) + 1e-10)
            b = b / jnp.sqrt(jnp.sum(b * b, axis=-1, keepdims=True) + 1e-10)
            d = (a - b) ** 2
            w = self.param(
                f"lin{i}", nn.initializers.ones, (d.shape[-1],), jnp.float32
            )
            # lin head = 1x1 conv with non-negative weights; spatial mean
            contrib = jnp.mean(jnp.sum(d * jnp.abs(w), axis=-1), axis=(1, 2))
            total = total + contrib
        return total


class LPIPSMetric:
    """Stateful wrapper mirroring the reference's LPIPSMetric (06:122-154)."""

    def __init__(self, params=None, seed: int = 0):
        self.model = LPIPS()
        if params is None:
            dummy = jnp.zeros((1, 64, 64, 3))
            params = self.model.init(jax.random.PRNGKey(seed), dummy, dummy)
        self.params = params
        self._apply = jax.jit(self.model.apply)

    def compute(self, frame1: np.ndarray, frame2: np.ndarray) -> float:
        """Frames [H, W, C] in [0,1] (reference feeds [0,1] -> [-1,1])."""
        f1 = jnp.asarray(frame1)[None] * 2.0 - 1.0
        f2 = jnp.asarray(frame2)[None] * 2.0 - 1.0
        return float(self._apply(self.params, f1, f2)[0])

    def compute_pairs(self, frames) -> np.ndarray:
        """All consecutive pairs of [F, H, W, C] in one jitted call."""
        f = jnp.asarray(frames) * 2.0 - 1.0
        return np.asarray(self._apply(self.params, f[:-1], f[1:]))


def load_torch_weights(state_dict) -> dict:
    """Convert a torch LPIPS(alex) state_dict to our Flax param tree.

    Expects torchvision AlexNet features conv weights (OIHW) under
    ``net.slice*`` or ``features.*`` naming plus ``lin{i}.model.1.weight``
    1x1 heads, as published by the lpips package.
    """
    flat = {}
    conv_ids = [0, 3, 6, 8, 10]  # torchvision features indices of the convs
    for i, cid in enumerate(conv_ids):
        for key in (f"features.{cid}.weight", f"net.features.{cid}.weight"):
            if key in state_dict:
                w = np.asarray(state_dict[key])  # OIHW
                flat[f"alex/conv{i}/kernel"] = np.transpose(w, (2, 3, 1, 0))
                flat[f"alex/conv{i}/bias"] = np.asarray(
                    state_dict[key.replace("weight", "bias")]
                )
    for i in range(5):
        for key in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if key in state_dict:
                w = np.asarray(state_dict[key])  # [1, C, 1, 1]
                flat[f"lin{i}"] = w.reshape(-1)

    params = {"params": {}}
    for path, val in flat.items():
        parts = path.split("/")
        node = params["params"]
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)
    return params
