"""Parallelism tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vdx.ops.attention import _xla_attention
from vdx.parallel.mesh import make_mesh, param_sharding_rules
from vdx.parallel.ring_attention import make_sharded_temporal_attention


@pytest.fixture(scope="module")
def devices8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()[:8]


class TestMesh:
    def test_make_mesh_shapes(self, devices8):
        mesh = make_mesh(2, 2, 2)
        assert dict(mesh.shape) == {"data": 2, "frames": 2, "tensor": 2}

    def test_param_sharding_rules(self, devices8):
        mesh = make_mesh(1, 1, 8)
        params = {
            "big_kernel": jnp.zeros((512, 512)),
            "small_bias": jnp.zeros((64,)),
            "odd_kernel": jnp.zeros((512, 333)),  # not divisible by 8
        }
        shardings = param_sharding_rules(params, mesh, min_size=2**10)
        assert shardings["big_kernel"].spec == jax.sharding.PartitionSpec(None, "tensor")
        assert shardings["small_bias"].spec == jax.sharding.PartitionSpec()
        assert shardings["odd_kernel"].spec == jax.sharding.PartitionSpec()


class TestRingAttention:
    def test_matches_full_attention(self, devices8):
        """Frame-sharded ring attention == dense attention, exactly."""
        mesh = make_mesh(1, 8, 1)
        B, F, H, D = 4, 32, 2, 64  # F=32 sharded 4-per-device
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (B, F, H, D), jnp.float32)
        k = jax.random.normal(jax.random.fold_in(key, 1), (B, F, H, D), jnp.float32)
        v = jax.random.normal(jax.random.fold_in(key, 2), (B, F, H, D), jnp.float32)

        expected = _xla_attention(q, k, v, D**-0.5, None)

        attn = make_sharded_temporal_attention(mesh, "frames")
        got = jax.jit(attn)(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5)

    def test_uneven_heads_and_batch(self, devices8):
        mesh = make_mesh(1, 4, 1)
        B, F, H, D = 2, 16, 3, 32
        key = jax.random.PRNGKey(3)
        q = jax.random.normal(key, (B, F, H, D))
        k = jax.random.normal(jax.random.fold_in(key, 1), (B, F, H, D))
        v = jax.random.normal(jax.random.fold_in(key, 2), (B, F, H, D))
        expected = _xla_attention(q, k, v, D**-0.5, None)
        attn = make_sharded_temporal_attention(mesh, "frames")
        got = jax.jit(attn)(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5)


class TestDryrun:
    def test_graft_entry_dryrun(self, devices8):
        import sys

        sys.path.insert(0, "/root/repo")
        from __graft_entry__ import dryrun_multichip

        dryrun_multichip(8)
