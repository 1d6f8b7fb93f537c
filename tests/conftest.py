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


# ---- quick tier ----------------------------------------------------------
# `python -m pytest tests/ -m quick -q` — a fast per-subsystem subset for
# iteration; the FULL suite stays the pre-commit gate (CLAUDE.md).  One
# representative module per layer, minus the measured slow outliers inside
# them (durations from the round-3 full-suite run).
QUICK_MODULES = {
    "test_kernels.py",          # Pallas flash attention + dispatch
    "test_groupnorm_kernel.py",  # fused GN+SiLU
    "test_schedulers.py",        # Euler/DDIM/EDM tables + steps
    "test_models.py",            # UNetMotion/VAE/CLIP structure + semantics
    "test_pipeline.py",          # base pipeline contract
    "test_pipeline_unified.py",  # one-core generate across families
    "test_metrics.py",           # MSE/PSNR/flicker/flow engine
    "test_analysis.py",          # CSV/report parity layer
    "test_harness.py",           # grid runner, config, resume
    "test_serving.py",           # HTTP surface + micro-batching
    "test_parallel.py",          # mesh/shard_map collectives
    "test_convert.py",           # weight-conversion rule coverage
    "test_lora.py",              # LoRA merge/convert/train/pipeline surface
    "test_subsystems.py",        # checkpoint/tracing/failure contracts
}
QUICK_EXCLUDE = (  # slow outliers (>20 s each measured) within quick modules
    "test_traces_tiny_unet",
    "test_graft_entry_dryrun",
    "test_random_field_close_and_shape",
    "test_incompatible_shapes_split_batches",
    "test_concurrent_requests_share_one_batch",
    "test_one_decode_program_and_latency_win",
    "test_save_load_roundtrip_generation",
    "TestLoadPretrained",  # safetensors->pipeline end-to-ends (~2 min)
)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "quick: fast per-subsystem subset (~8 min); full suite is the gate",
    )
    config.addinivalue_line(
        "markers",
        "oracle_full: ~10-min full 78-record oracle recompute "
        "(VDX_FULL_ORACLE=1 enables)",
    )


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.path.name in QUICK_MODULES and not any(
            key in item.nodeid for key in QUICK_EXCLUDE
        ):
            item.add_marker(pytest.mark.quick)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


REFERENCE_ROOT = "/root/reference"


def golden_skip(msg: str):
    """Golden-oracle artifacts unavailable. By default this SKIPS — but the
    committed reference JSONs/CSVs/PNGs are the strongest oracle in the
    repo, and a packaging/CI change that drops them must not silently
    no-op the whole golden layer: set ``VDX_REQUIRE_GOLDEN=1`` (any CI
    that mounts /root/reference should) to turn these skips into
    failures."""
    import os

    if os.environ.get("VDX_REQUIRE_GOLDEN"):
        pytest.fail(
            f"VDX_REQUIRE_GOLDEN=1 but golden oracle unavailable: {msg}"
        )
    pytest.skip(f"{msg} (VDX_REQUIRE_GOLDEN=1 makes this a failure)")


@pytest.fixture(scope="session")
def reference_root():
    import pathlib

    p = pathlib.Path(REFERENCE_ROOT)
    if not p.exists():
        golden_skip("reference tree not mounted")
    return p
