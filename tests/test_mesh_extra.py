"""Mesh helper edge cases."""

import jax
import pytest

from vdx.parallel.mesh import auto_mesh, make_mesh
from vdx.core.init import fast_init


class TestAutoMesh:
    def test_8_devices(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 devices")
        mesh = auto_mesh(8)
        assert dict(mesh.shape) == {"data": 2, "frames": 2, "tensor": 2}

    def test_4_devices(self):
        if len(jax.devices()) < 4:
            pytest.skip("needs 4 devices")
        mesh = auto_mesh(4)
        assert dict(mesh.shape) == {"data": 2, "frames": 2, "tensor": 1}

    def test_1_device(self):
        mesh = auto_mesh(1)
        assert dict(mesh.shape) == {"data": 1, "frames": 1, "tensor": 1}

    def test_make_mesh_rejects_oversubscription(self):
        with pytest.raises(AssertionError):
            make_mesh(100, 100, 100)


class TestTensorParallelParity:
    def test_tp_sharded_unet_matches_replicated(self):
        """Megatron col/row-split UNetMotion == replicated, numerically.

        XLA SPMD propagates the param shardings through the forward; the
        output must match the single-device result (reduction-order tol).
        """
        import jax.numpy as jnp
        import numpy as np

        from vdx.core.dtypes import FP32_POLICY
        from vdx.models.unet_motion import UNetMotion, UNetMotionConfig
        from vdx.parallel.mesh import param_sharding_rules

        if len(jax.devices()) < 2:
            pytest.skip("needs 2 devices")
        mesh = make_mesh(1, 1, 2)
        cfg = UNetMotionConfig.tiny()
        model = UNetMotion(cfg, policy=FP32_POLICY)
        sample = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 16, 16, 4))
        t = jnp.asarray([500])
        ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 7, cfg.cross_attention_dim))
        params = fast_init(model, sample, t, ctx, seed=2)
        expected = model.apply(params, sample, t, ctx)

        shardings = param_sharding_rules(params, mesh, min_size=2**8)
        # the rules must actually shard something at this min_size
        n_sharded = sum(
            int(s.spec != jax.sharding.PartitionSpec())
            for s in jax.tree.leaves(shardings)
        )
        assert n_sharded > 10, f"only {n_sharded} leaves sharded"
        sharded_params = jax.device_put(params, shardings)
        got = jax.jit(model.apply)(sharded_params, sample, t, ctx)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(expected), atol=2e-4
        )


class TestTensorParallelAllFamilies:
    """The Megatron col/row rules are module-NAME based (to_q/net_0/ff_in
    column, to_out/net_2/ff_out row, generic last-axis split otherwise) —
    so they must hold for every denoiser family, not just UNetMotion.
    TP-sharded forward == replicated, per family."""

    def _families(self):
        import jax.numpy as jnp

        from vdx.core.dtypes import FP32_POLICY
        from vdx.models.cogvideox import CogVideoXConfig, CogVideoXDiT
        from vdx.models.dit import LatteConfig, LatteDiT
        from vdx.models.svd_unet import SVDUNetConfig, UNetSpatioTemporal
        from vdx.models.unet3d import UNet3D, UNet3DConfig

        k = jax.random.PRNGKey(0)
        t = jnp.asarray([500])
        fams = []
        cfg = UNet3DConfig.tiny()
        fams.append((
            "unet3d",
            UNet3D(cfg, policy=FP32_POLICY),
            (jax.random.normal(k, (1, 4, 16, 16, cfg.in_channels)), t,
             jax.random.normal(k, (1, 7, cfg.cross_attention_dim))),
        ))
        cfg = LatteConfig.tiny()
        fams.append((
            "latte",
            LatteDiT(cfg, policy=FP32_POLICY),
            (jax.random.normal(k, (1, 4, 8, 8, cfg.in_channels)), t,
             jax.random.normal(k, (1, 7, cfg.cross_attention_dim))),
        ))
        cfg = CogVideoXConfig.tiny()
        fams.append((
            "cogvideox",
            CogVideoXDiT(cfg, policy=FP32_POLICY),
            (jax.random.normal(k, (1, 2, 8, 8, cfg.in_channels)), t,
             jax.random.normal(k, (1, cfg.max_text_len, cfg.text_dim))),
        ))
        cfg = SVDUNetConfig.tiny()
        fams.append((
            "svd",
            UNetSpatioTemporal(cfg, policy=FP32_POLICY),
            (jax.random.normal(k, (1, 4, 16, 16, cfg.in_channels)),
             jnp.asarray([1.5]),
             jax.random.normal(k, (1, 1, cfg.cross_attention_dim)),
             jnp.asarray([[6, 127, 0.02]], jnp.float32)),
        ))
        return fams

    def test_tp_matches_replicated_per_family(self):
        import numpy as np

        from vdx.parallel.mesh import param_sharding_rules

        if len(jax.devices()) < 2:
            pytest.skip("needs 2 devices")
        mesh = make_mesh(1, 1, 2)
        for name, model, args in self._families():
            params = fast_init(model, *args, seed=2)
            expected = model.apply(params, *args)
            shardings = param_sharding_rules(params, mesh, min_size=2**8)
            n_sharded = sum(
                int(s.spec != jax.sharding.PartitionSpec())
                for s in jax.tree.leaves(shardings)
            )
            assert n_sharded > 10, (name, n_sharded)
            sharded_params = jax.device_put(params, shardings)
            got = jax.jit(model.apply)(sharded_params, *args)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(expected), atol=2e-4,
                err_msg=name,
            )
