"""Latte-style DiT tests (tiny config, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from vdx.core.dtypes import FP32_POLICY
from vdx.models.dit import LatteConfig, LatteDiT
from vdx.core.init import fast_init


def _denonzero(params, scale=0.02):
    """Replace adaLN-Zero's zero-init kernels with small noise so block
    outputs actually flow (needed to observe mixing/conditioning)."""
    leaves, treedef = jax.tree.flatten(params)
    key = jax.random.PRNGKey(99)
    out = []
    for i, leaf in enumerate(leaves):
        if hasattr(leaf, "shape") and leaf.size and float(jnp.abs(leaf).max()) == 0.0:
            leaf = jax.random.normal(jax.random.fold_in(key, i), leaf.shape) * scale
        out.append(leaf)
    return jax.tree.unflatten(treedef, out)


def _make(B=1, F=4, H=8, W=8, fast=True):
    cfg = LatteConfig.tiny()
    model = LatteDiT(cfg, policy=FP32_POLICY)
    sample = jnp.zeros((B, F, H, W, 4))
    t = jnp.asarray([500])
    ctx = jnp.zeros((B, 7, cfg.cross_attention_dim))
    if fast:
        params = fast_init(model, sample, t, ctx, seed=0)
    else:
        # exact flax initializers — the adaLN-Zero test asserts on them
        params = model.init(jax.random.PRNGKey(0), sample, t, ctx)
    return cfg, model, params, sample, t, ctx


class TestLatteDiT:
    def test_shapes(self):
        cfg, model, params, sample, t, ctx = _make()
        out = model.apply(params, sample, t, ctx)
        assert out.shape == sample.shape

    def test_adaln_zero_init_outputs_zero(self):
        """adaLN-Zero: with zero-init final proj, output at init must be 0."""
        cfg, model, params, sample, t, ctx = _make(fast=False)
        key = jax.random.PRNGKey(1)
        x = jax.random.normal(key, sample.shape)
        out = model.apply(params, x, t, ctx)
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)

    def test_temporal_mixing(self):
        """Temporal blocks mix frames: perturbing frame 3 changes frame 0."""
        cfg, model, params, sample, t, ctx = _make()
        params = _denonzero(params)
        key = jax.random.PRNGKey(2)
        x = jax.random.normal(key, sample.shape)
        o1 = model.apply(params, x, t, ctx)
        x2 = x.at[:, 3].add(1.0)
        o2 = model.apply(params, x2, t, ctx)
        assert not np.allclose(np.asarray(o1[:, 0]), np.asarray(o2[:, 0]), atol=1e-7)

    def test_timestep_and_context_condition(self):
        cfg, model, params, sample, t, ctx = _make()
        params = _denonzero(params)
        x = jax.random.normal(jax.random.PRNGKey(3), sample.shape)
        o1 = model.apply(params, x, jnp.asarray([1]), ctx)
        o2 = model.apply(params, x, jnp.asarray([900]), ctx)
        assert not np.allclose(np.asarray(o1), np.asarray(o2), atol=1e-7)
        ctx2 = ctx + 1.0
        o3 = model.apply(params, x, jnp.asarray([1]), ctx2)
        assert not np.allclose(np.asarray(o1), np.asarray(o3), atol=1e-7)
