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
