"""Pallas kernel tests — interpreter mode on CPU, numerics vs the XLA path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vdx.ops.attention import _xla_attention


def _run_flash_interpret(q, k, v, scale, **kw):
    """Run the flash kernel in Pallas interpret mode (no TPU needed)."""
    from jax.experimental.pallas import tpu as pltpu

    from vdx.kernels.flash_attention import flash_attention

    with pltpu.force_tpu_interpret_mode():
        return flash_attention(q, k, v, scale=scale, **kw)


@pytest.mark.parametrize(
    "B,S,H,D",
    [
        (1, 256, 2, 64),
        (2, 512, 4, 128),
        (1, 300, 2, 40),  # unaligned seq and head dim
    ],
)
def test_flash_matches_xla(B, S, H, D):
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, S, H, D), jnp.float32)
    k = jax.random.normal(kk, (B, S, H, D), jnp.float32)
    v = jax.random.normal(kv, (B, S, H, D), jnp.float32)
    scale = D**-0.5

    expected = _xla_attention(q, k, v, scale, None)
    got = _run_flash_interpret(q, k, v, scale, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5)


@pytest.mark.parametrize("B,S,H,D", [(1, 256, 2, 40), (2, 300, 4, 64)])
def test_flash_dt_matches_xla(B, S, H, D):
    from jax.experimental.pallas import tpu as pltpu

    from vdx.kernels.flash_attention import flash_attention_dt

    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, S, H, D), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, S, H, D), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, S, H, D), jnp.float32)
    scale = D**-0.5
    expected = _xla_attention(q, k, v, scale, None)
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention_dt(q, k, v, scale=scale, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5)


@pytest.mark.parametrize(
    "exp_impl", ["exp2", "fastexp2", "staticmax", "staticaug"]
)
def test_flash_dt_exp2_paths_match_xla(exp_impl):
    """Base-2 softmax variants (scale folded into q) stay numerically exact.

    fastexp2's cubic has 7.5e-5 max rel error — atol 5e-4 still catches any
    structural mistake (wrong exponent bits, bad clamp) by orders of
    magnitude. The max-free static variants (p = 2^(s - STATIC_OFF), the
    offset a power of two so the scaling is floating-point-exact and
    cancels in acc/l) must hit the same 2e-5 bar as the running-max
    kernel."""
    from jax.experimental.pallas import tpu as pltpu

    from vdx.kernels.flash_attention import flash_attention_dt

    key = jax.random.PRNGKey(3)
    B, S, H, D = 2, 300, 2, 40  # unaligned S exercises the masked path
    q = jax.random.normal(key, (B, S, H, D), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, S, H, D), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, S, H, D), jnp.float32)
    scale = D**-0.5
    expected = _xla_attention(q, k, v, scale, None)
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention_dt(
            q, k, v, scale=scale, block_q=128, block_k=128, exp_impl=exp_impl
        )
    atol = 5e-4 if exp_impl == "fastexp2" else 2e-5
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=atol)


@pytest.mark.parametrize("exp_impl", ["exp2", "staticmax"])
def test_flash_dt_bf16_matches_xla(exp_impl):
    """bf16 q/k/v through both dispatched kernel variants — "staticmax" is
    the PRODUCTION default (ops/attention.py), "exp2" the running-max
    fallback kept available via exp_impl.

    The scale*log2e fold is computed fp32 and rounded once to bf16, so the
    end-to-end error vs an fp32 reference stays within plain bf16-matmul
    tolerance (~1e-2 for unit-normal inputs at D=40)."""
    from jax.experimental.pallas import tpu as pltpu

    from vdx.kernels.flash_attention import flash_attention_dt

    key = jax.random.PRNGKey(5)
    B, S, H, D = 2, 256, 2, 40
    qf = jax.random.normal(key, (B, S, H, D), jnp.float32)
    kf = jax.random.normal(jax.random.fold_in(key, 1), (B, S, H, D), jnp.float32)
    vf = jax.random.normal(jax.random.fold_in(key, 2), (B, S, H, D), jnp.float32)
    scale = D**-0.5
    # reference: the SAME bf16-rounded inputs through the exact fp32 path
    q, k, v = (x.astype(jnp.bfloat16) for x in (qf, kf, vf))
    expected = _xla_attention(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        scale, None,
    )
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention_dt(
            q, k, v, scale=scale, block_q=128, block_k=128, exp_impl=exp_impl
        )
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(expected), atol=2e-2
    )


def test_flash_dt_staticmax_edge_behavior():
    """Pin the documented domain edges of the max-free "staticmax" default.

    (a) A row whose EVERY scaled log2-logit sits below the underflow bound
        (~-46 after the -80 offset) flushes to a ZERO output row (the
        documented divergence from the exact kernel's near-uniform average);
    (b) rows with large-but-sane logits (scaled magnitude ~30) keep exact
        parity with the fp32 XLA reference — the power-of-two offset is
        fp-exact and cancels in acc/l."""
    from jax.experimental.pallas import tpu as pltpu

    from vdx.kernels.flash_attention import flash_attention_dt

    key = jax.random.PRNGKey(11)
    B, S, H, D = 1, 128, 1, 40
    q = jax.random.normal(key, (B, S, H, D), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, S, H, D), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, S, H, D), jnp.float32)
    scale = D**-0.5
    # (b) large-logit rows: scale q up so scaled log2-logits reach ~+/-48
    # (std ~11.5) — far beyond sane activations, well below the
    # ~207-log2(Skv) overflow bound.
    q_big = q * 8.0
    expected = _xla_attention(q_big, k, v, scale, None)
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention_dt(
            q_big, k, v, scale=scale, block_q=128, block_k=128,
            exp_impl="staticmax",
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5)

    # (a) all-negative row: q row 0 pointed hard away from every k makes
    # every scaled log2-logit < -46 -> documented zero output (the exact
    # kernel would return a near-uniform v average instead).
    k_neg = jnp.ones((B, S, H, D), jnp.float32)
    q_under = q.at[0, 0].set(-4000.0)
    with pltpu.force_tpu_interpret_mode():
        got_u = flash_attention_dt(
            q_under, k_neg, v, scale=scale, block_q=128, block_k=128,
            exp_impl="staticmax",
        )
    row = np.asarray(got_u)[0, 0]
    np.testing.assert_array_equal(row, np.zeros_like(row))
    assert not np.isnan(np.asarray(got_u)).any()


def test_temporal_attention_cp_matches_xla():
    """C-major / positions-on-lanes temporal attention (the round-3
    megakernel layout probe) matches the exact XLA path."""
    from vdx.kernels.temporal_attention_cp import temporal_attention_cp

    key = jax.random.PRNGKey(7)
    P, F, H, D = 256, 16, 8, 40
    q = jax.random.normal(key, (P, F, H, D), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (P, F, H, D), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (P, F, H, D), jnp.float32)
    scale = D**-0.5
    want = _xla_attention(q, k, v, scale, None)
    got = temporal_attention_cp(q, k, v, scale=scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fast_exp2_accuracy():
    """_fast_exp2 vs exp2 over the full negative domain incl. the clamp."""
    from vdx.kernels.flash_attention import _fast_exp2

    y = jnp.asarray(
        np.concatenate(
            [
                np.random.default_rng(0).uniform(-130, 0, 200_000),
                [0.0, -1e30, -126.0, -124.999, -0.5],
            ]
        ),
        jnp.float32,
    )
    got = np.asarray(_fast_exp2(y))
    exact = np.exp2(np.maximum(np.asarray(y, np.float64), -125.0))
    rel = np.abs(got - exact) / np.maximum(exact, 1e-300)
    assert rel.max() < 1e-4


@pytest.mark.parametrize("P,F,H,D", [(40, 16, 2, 40), (12, 8, 3, 16)])
def test_flash_blockdiag_matches_xla(P, F, H, D):
    """Tiny-seq block-diagonal kernel == per-position dense attention.

    P chosen so P*F is not a multiple of the 128-token block: the padded
    tail tokens must receive zero softmax weight (group-mismatch mask)."""
    from jax.experimental.pallas import tpu as pltpu

    from vdx.kernels.flash_attention import flash_attention_blockdiag

    key = jax.random.PRNGKey(5)
    q = jax.random.normal(key, (P, F, H, D), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (P, F, H, D), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (P, F, H, D), jnp.float32)
    scale = D**-0.5
    expected = _xla_attention(q, k, v, scale, None)
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention_blockdiag(q, k, v, scale=scale, block=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5)


@pytest.mark.parametrize("variant", ["tc", "tc2"])
def test_flash_blockdiag_tc_variants_match_xla(variant):
    """[T, C]-layout block-diagonal variants (documented negative perf
    results — PERF.md — but kept callable and correct)."""
    from jax.experimental.pallas import tpu as pltpu

    from vdx.kernels.flash_attention import (
        flash_attention_blockdiag_tc,
        flash_attention_blockdiag_tc2,
    )

    fn = {"tc": flash_attention_blockdiag_tc,
          "tc2": flash_attention_blockdiag_tc2}[variant]
    key = jax.random.PRNGKey(6)
    P, F, H, D = 40, 16, 2, 40
    q = jax.random.normal(key, (P, F, H, D), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (P, F, H, D), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (P, F, H, D), jnp.float32)
    scale = D**-0.5
    expected = _xla_attention(q, k, v, scale, None)
    with pltpu.force_tpu_interpret_mode():
        got = fn(q, k, v, scale=scale, heads=H, block=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5)


def test_flash_cross_attention_shapes():
    """Skv != Sq (cross-attention 77-token context)."""
    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (1, 256, 2, 64), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (1, 77, 2, 64), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (1, 77, 2, 64), jnp.float32)
    expected = _xla_attention(q, k, v, 0.125, None)
    got = _run_flash_interpret(q, k, v, 0.125, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5)


def test_packed_blockdiag_attention_matches_unpacked():
    """xla_bf16p_packed (block-diag packed short-seq attention — measured
    5x SLOWER than bf16p on TPU, kept as the documented eighth short-seq
    attempt) is numerically identical to the unpacked bf16p path."""
    import numpy as np

    from vdx.ops.attention import (
        _xla_attention_bf16probs,
        dot_product_attention,
    )

    rng = np.random.default_rng(3)
    for B, S, H, D in [(37, 25, 5, 64), (16, 16, 8, 40)]:
        q, k, v = (
            jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
            .astype(jnp.bfloat16) for _ in range(3))
        ref = _xla_attention_bf16probs(q, k, v, D ** -0.5)
        got = dot_product_attention(q, k, v, impl="xla_bf16p_packed")
        # both paths emit bf16: allow one bf16 ULP (rtol 2^-7) — the packed
        # einsums may round the final cast differently on some XLA builds
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            rtol=2**-7, atol=2e-3)
