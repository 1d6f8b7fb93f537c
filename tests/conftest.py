"""Test harness: force CPU backend with 8 virtual devices.

Mirrors the TPU-world testing recipe from SURVEY.md §4: collectives and mesh
sharding are validated on a virtual 8-device CPU mesh
(``xla_force_host_platform_device_count``), numerical parity in fp32.
Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The container's sitecustomize force-registers the axon TPU backend and sets
# jax_platforms before conftest runs; override it at the config level so tests
# run on the local 8-device virtual CPU mesh, not through the TPU tunnel.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: identical tiny-model programs recompile in
# every test process otherwise (the suite's dominant cost).
from vdx.core.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


REFERENCE_ROOT = "/root/reference"


@pytest.fixture(scope="session")
def reference_root():
    import pathlib

    p = pathlib.Path(REFERENCE_ROOT)
    if not p.exists():
        pytest.skip("reference tree not mounted")
    return p
