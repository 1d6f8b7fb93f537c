"""Environment smoke check (parity with reference torch_check.py:1-5)."""

import jax

print(f"JAX version: {jax.__version__}")
print(f"Backend: {jax.default_backend()}")
print(f"Devices: {jax.devices()}")
print(f"Device count: {jax.device_count()}")
