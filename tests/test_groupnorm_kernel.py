"""Fused GroupNorm Pallas kernel vs the XLA reference (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from vdx.kernels.groupnorm import group_norm_silu_pallas
from vdx.ops.groupnorm import group_norm, group_norm_silu


@pytest.mark.parametrize("shape,groups", [
    ((2, 8, 8, 64), 8),
    ((1, 4, 4, 4, 32), 4),   # 5D: stats span frames+space jointly
    ((3, 16, 96), 32),       # already-flattened layout (96 lanes, unaligned)
])
def test_matches_xla(shape, groups):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    C = shape[-1]
    scale = jnp.asarray(rng.standard_normal(C).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(C).astype(np.float32))

    with pltpu.force_tpu_interpret_mode():
        got_silu = group_norm_silu_pallas(x, groups, scale, bias)
        got_plain = group_norm_silu_pallas(x, groups, scale, bias, with_silu=False)

    np.testing.assert_allclose(
        np.asarray(got_silu), np.asarray(group_norm_silu(x, groups, scale, bias)),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(got_plain), np.asarray(group_norm(x, groups, scale, bias)),
        atol=1e-5,
    )


@pytest.mark.parametrize("shape,groups", [
    ((2, 64, 64), 8),
    ((1, 4, 8, 8, 32), 4),
])
def test_2phase_matches_xla(shape, groups):
    from vdx.kernels.groupnorm import fused_group_norm_2phase

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    C = shape[-1]
    S = int(np.prod(shape[1:-1]))
    scale = jnp.asarray(rng.standard_normal(C).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(C).astype(np.float32))

    with pltpu.force_tpu_interpret_mode():
        got = fused_group_norm_2phase(
            x.reshape(shape[0], S, C), scale, bias, num_groups=groups,
            with_silu=True,
        ).reshape(shape)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(group_norm_silu(x, groups, scale, bias)),
        atol=1e-5,
    )


def test_pick_chunk_mosaic_sublane_constraint():
    """2-phase S-chunks must be 8-divisible divisors of S (Mosaic block
    tiling) — caught live at CogVideoX's causal-VAE GN (S=13*60*90=70200,
    C=512): the unconstrained pick was 975, which fails TPU lowering."""
    from vdx.kernels.groupnorm import _pick_chunk, pallas_gn_viable

    assert _pick_chunk(70200, 1024) == 975          # the hazard, documented
    assert _pick_chunk(70200, 1024, multiple=8) == 936
    # S with a single factor of 2: no 8-divisible divisor exists at all
    assert _pick_chunk(5850, 1024, multiple=8) == 0
    assert pallas_gn_viable((1, 13, 60, 90, 512))   # 2phase, chunk 936
    assert not pallas_gn_viable((1, 5850, 512))     # -> XLA fallback
    assert pallas_gn_viable((2, 64, 320))           # single-program path
    # budget is in BYTES: [16,1024,960] f32 overflows the single-program
    # scoped-vmem block (caught live on TPU) and must route to 2-phase,
    # while the same shape in bf16 stays single-program
    from vdx.kernels.groupnorm import _SINGLE_PROGRAM_MAX_BYTES

    assert 1024 * 960 * 2 <= _SINGLE_PROGRAM_MAX_BYTES
    assert 1024 * 960 * 4 > _SINGLE_PROGRAM_MAX_BYTES
    assert pallas_gn_viable((16, 32, 32, 960), itemsize=4)  # via 2-phase


def test_2phase_odd_factor_chunk_matches_xla():
    """A non-power-of-two (but 8-divisible) chunk: S=3744=2^5*117 picks
    chunk 1872 -> 2 grid steps."""
    from vdx.kernels.groupnorm import _pick_chunk, fused_group_norm_2phase

    assert _pick_chunk(3744, 2048, multiple=8) == 1872
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 3744, 256)).astype(np.float32))
    scale = jnp.asarray(rng.standard_normal(256).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(256).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        got = fused_group_norm_2phase(
            x, scale, bias, num_groups=32, with_silu=True
        )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(group_norm_silu(x, 32, scale, bias)),
        atol=1e-5,
    )
