"""Frame-sharded UNet vs local UNet — same params, same output."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vdx.core.dtypes import FP32_POLICY
from vdx.models.unet_motion import UNetMotion, UNetMotionConfig
from vdx.parallel.frame_parallel import make_frame_sharded_unet
from vdx.parallel.mesh import make_mesh


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
    params = local.init(jax.random.PRNGKey(2), sample, t, ctx)
    return mesh, cfg, local, params, sample, t, ctx


class TestFrameSharded:
    def test_matches_local(self, setup):
        mesh, cfg, local, params, sample, t, ctx = setup
        expected = local.apply(params, sample, t, ctx)

        _, sharded_apply = make_frame_sharded_unet(cfg, mesh, policy=FP32_POLICY)
        got = jax.jit(sharded_apply)(params, sample, t, ctx)

        np.testing.assert_allclose(
            np.asarray(got), np.asarray(expected), atol=2e-4
        )

    def test_output_shape_sharding(self, setup):
        """Output keeps the input's frame sharding over the mesh axis."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh, cfg, local, params, sample, t, ctx = setup
        _, sharded_apply = make_frame_sharded_unet(cfg, mesh, policy=FP32_POLICY)
        sample_sharded = jax.device_put(sample, NamedSharding(mesh, P(None, "frames")))
        out = jax.jit(sharded_apply)(params, sample_sharded, t, ctx)
        assert out.shape == sample.shape
        assert out.sharding.spec == P(None, "frames")
