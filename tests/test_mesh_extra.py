"""Mesh helper edge cases."""

import jax
import pytest

from vdx.parallel.mesh import auto_mesh, make_mesh


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
