"""Flash attention — Pallas TPU kernel.

Online-softmax blocked attention (no S x S score materialisation) for the
UNet's long spatial self-attention sequences (64x64 latents -> S=4096, where
naive attention would stream an 8 GB fp32 score tensor through HBM per
forward). Replaces the cuDNN attention path the reference leans on through
torch (SURVEY.md §2c).

Layout contract: q, k, v are [B, S, H, D] (the ops.attention convention);
internally folded to [B*H, S, D]. Head dim is zero-padded to the 128-lane
boundary — padding contributes 0 to q.k^T scores and is sliced off the
output, so results are exact.

Grid: (BH, num_q_blocks, num_kv_blocks), kv innermost. TPU grids execute
sequentially on a core, so the fp32 (acc, m, l) scratch carries the running
softmax state across kv steps of one q block: the standard flash recurrence
  m' = max(m, rowmax(s));  alpha = exp(m - m')
  l' = alpha*l + rowsum(exp(s - m'));  acc' = alpha*acc + exp(s - m') @ v
finalised as acc/l at the last kv step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LOG2E = 1.4426950408889634

# Static softmax offset for the max-free flash variants ("staticmax" /
# "staticaug"): p = 2^(s - STATIC_OFF) instead of 2^(s - rowmax(s)).
# Scaling by a power of two is EXACT in floating point (mantissas
# untouched), and the offset cancels in acc/l, so results match the
# running-max kernel up to summation-order rounding. Domain bounds:
# a single p term overflows at a scaled logit > 127 + 80 = 207, and the
# fp32 l/acc accumulation over Skv terms adds up to log2(Skv) doublings
# on top, so the tight bound is smax > ~207 - log2(Skv) (~193 at the
# SVD site's Skv=9216 — still impossible for sane activations);
# full-row underflow (NaN guard at finalise) needs EVERY scaled logit
# in a row below -126 + 80 = -46.
STATIC_OFF = 80.0

# Degree-3 minimax polynomial for 2^f on f in [0, 1] (rel err 7.5e-5 — 50x
# below bf16's output grid). Used by the "fastexp2" softmax path.
_EXP2_C0 = 0.9999250788416159
_EXP2_C1 = 0.6958342408899721
_EXP2_C2 = 0.22606693137993905
_EXP2_C3 = 0.0780238760040786


def _fast_exp2(y: jnp.ndarray) -> jnp.ndarray:
    """2^y for y <= 0 via exponent-bit construction + cubic mantissa poly.

    The builtin exp lowers to a long accurate VPU sequence; softmax only
    needs bf16-grade probabilities, so a ~10-op approximation buys back a
    large share of the kernel's VPU time. Clamped at 2^-125 (the cubic's
    p < 1 would push 2^-126 subnormal, which FTZ flushes to 0 — fine for
    softmax but it would break the relative-error contract).
    """
    y = jnp.maximum(y, -125.0)
    n = jnp.floor(y)
    f = y - n
    p = ((_EXP2_C3 * f + _EXP2_C2) * f + _EXP2_C1) * f + _EXP2_C0
    bits = (n.astype(jnp.int32) + 127) << 23
    return jax.lax.bitcast_convert_type(bits, jnp.float32) * p



def _flash_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *, scale, kv_steps):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0]  # [BQ, D]
    k = k_ref[0]  # [BK, D]
    v = v_ref[0]  # [BK, D]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BQ, BK]
    s = s * scale

    m_prev = m_ref[:]  # [BQ, 1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)  # [BQ, BK]

    l_ref[:] = alpha * l_ref[:] + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_ref[:] = alpha * acc_ref[:] + pv
    m_ref[:] = m_new

    @pl.when(ki == kv_steps - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _min_pad_block(S: int, cap: int) -> int:
    """Largest block <= cap (multiple of 128) minimising padded compute.

    A fixed cap pads S up to a cap multiple: at the SVD north-star spatial
    site S=9216 with cap 4096 that is 12288 rows — 33% wasted MXU work on
    both matmuls. Keeping the same number of grid blocks but shrinking the
    block to ceil(S/n) rounded to the 128 tile removes (nearly) all of it:
    S=9216 -> 3 blocks of 3072, zero padding, identical results.
    """
    Sp = max(128, ((S + 127) // 128) * 128)
    cap = max(128, (min(cap, Sp) // 128) * 128)  # honour "block <= cap"
    n = (Sp + cap - 1) // cap  # minimum block count at this cap
    return min(cap, ((Sp // n + 127) // 128) * 128)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k"))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float,
    block_q: int = 1024,
    block_k: int = 1024,
) -> jnp.ndarray:
    """Attention over [B, S, H, D] tensors (no mask; bidirectional)."""
    B, Sq, H, D = q.shape
    Skv = k.shape[1]

    # [B, S, H, D] -> [B*H, S, D]
    def fold(x):
        return x.transpose(0, 2, 1, 3).reshape(B * x.shape[2], x.shape[1], x.shape[3])

    qf, kf, vf = fold(q), fold(k), fold(v)

    # Pad head dim to the 128-lane boundary; pad seq to block multiples.
    Dp = max(128, ((D + 127) // 128) * 128)
    bq = _min_pad_block(Sq, block_q)
    bk = _min_pad_block(Skv, block_k)
    Sqp = ((Sq + bq - 1) // bq) * bq
    Skvp = ((Skv + bk - 1) // bk) * bk

    qf = _pad_to(_pad_to(qf, Dp, 2), Sqp, 1)
    kf = _pad_to(_pad_to(kf, Dp, 2), Skvp, 1)
    vf = _pad_to(_pad_to(vf, Dp, 2), Skvp, 1)
    # Padded KV rows must not receive softmax weight; the masked kernel
    # variant pushes their scores to -inf via an iota comparison.
    kv_steps = Skvp // bk
    grid = (B * H, Sqp // bq, kv_steps)

    out = pl.pallas_call(
        functools.partial(
            _flash_kernel_masked if Skvp != Skv else _flash_kernel_nomask,
            scale=scale,
            kv_steps=kv_steps,
            kv_len=Skv,
            block_k=bk,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, Dp), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, bk, Dp), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, bk, Dp), lambda b, qi, ki: (b, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, Dp), lambda b, qi, ki: (b, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, Sqp, Dp), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, Dp), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
        ],
        # v5e has 128 MB VMEM/core; the compiler's 16 MB scoped default
        # blocks the large-block configs that amortise grid overhead.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(qf, kf, vf)

    out = out[:, :Sq, :D]
    return out.reshape(B, H, Sq, D).transpose(0, 2, 1, 3)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k", "exp_impl")
)
def flash_attention_dt(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float,
    block_q: int = 1024,
    block_k: int = 1024,
    exp_impl: str = "exp",  # "exp" | "exp2" | "fastexp2" | "staticmax" |
    #                         "staticaug" | "noexp" | "mxu_only"
) -> jnp.ndarray:
    """Transposed-layout flash attention — zero head-dim padding waste.

    The standard layout pads D to the 128-lane boundary, wasting 128/D of
    the MXU on BOTH matmuls at SD-1.5's D=40/80 head dims. Here everything
    runs D-major:

        scores^T [BK, BQ] = dot(k^T [D, BK], q^T [D, BQ])   (contract D on
                                                             SUBLANES: D=40
                                                             -> 5 tiles, no pad)
        out^T    [D, BQ]  = dot(v^T [D, BK], p [BK, BQ])    (contract BK on
                                                             lanes: no pad)

    Softmax statistics reduce across sublanes ([1, BQ] running max/sum) —
    lane-broadcast friendly. Host-side transposes to/from [B*H, D, S] are
    one cheap XLA pass each. Requires D % 8 == 0 (sublane tile).
    """
    B, Sq, H, D = q.shape
    Skv = k.shape[1]
    assert D % 8 == 0, D

    def fold_t(x):  # [B, S, H, D] -> [B*H, D, S]
        return x.transpose(0, 2, 3, 1).reshape(B * x.shape[2], x.shape[3], x.shape[1])

    qt, kt, vt = fold_t(q), fold_t(k), fold_t(v)
    if exp_impl == "staticaug":
        return _flash_dt_staticaug(
            qt, kt, vt, B=B, H=H, D=D, Sq=Sq, Skv=Skv, scale=scale,
            block_q=block_q, block_k=block_k,
        ).reshape(B, H, D, Sq).transpose(0, 3, 1, 2)
    if exp_impl != "exp":
        # Base-2 softmax: fold scale * log2(e) into q once (one cheap XLA
        # pass over [BH, D, S]) so the kernel's scores live in the log2
        # domain and 2^x replaces e^x with identical results. The product
        # is computed in fp32 and rounded ONCE back to q's dtype — a bf16
        # constant would truncate scale*log2e itself before the multiply.
        qt = (qt.astype(jnp.float32) * (scale * LOG2E)).astype(qt.dtype)
        kscale = 1.0
    else:
        kscale = scale
    bq = _min_pad_block(Sq, block_q)
    bk = _min_pad_block(Skv, block_k)
    Sqp = ((Sq + bq - 1) // bq) * bq
    Skvp = ((Skv + bk - 1) // bk) * bk
    qt = _pad_to(qt, Sqp, 2)
    kt = _pad_to(kt, Skvp, 2)
    vt = _pad_to(vt, Skvp, 2)

    kv_steps = Skvp // bk
    grid = (B * H, Sqp // bq, kv_steps)

    out = pl.pallas_call(
        functools.partial(
            _flash_dt_kernel, scale=kscale, kv_steps=kv_steps, kv_len=Skv,
            block_k=bk, masked=(Skvp != Skv), exp_impl=exp_impl,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, D, bq), lambda b, qi, ki: (b, 0, qi)),
            pl.BlockSpec((1, D, bk), lambda b, qi, ki: (b, 0, ki)),
            pl.BlockSpec((1, D, bk), lambda b, qi, ki: (b, 0, ki)),
        ],
        out_specs=pl.BlockSpec((1, D, bq), lambda b, qi, ki: (b, 0, qi)),
        out_shape=jax.ShapeDtypeStruct((B * H, D, Sqp), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((D, bq), jnp.float32),
            pltpu.VMEM((1, bq), jnp.float32),
            pltpu.VMEM((1, bq), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(qt, kt, vt)

    out = out[:, :, :Sq]  # [BH, D, Sq]
    return out.reshape(B, H, D, Sq).transpose(0, 3, 1, 2)


def _flash_dt_kernel(qt_ref, kt_ref, vt_ref, o_ref, acc_ref, m_ref, l_ref,
                     *, scale, kv_steps, kv_len, block_k, masked,
                     exp_impl="exp"):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    qt = qt_ref[0]  # [D, BQ]
    kt = kt_ref[0]  # [D, BK]
    vt = vt_ref[0]  # [D, BK]

    # exp_impl != "exp" => scores are already in the log2 domain (scale and
    # log2(e) folded into q host-side) and scale == 1.0 here.
    #
    # Two DIAGNOSTIC impls for the roofline decomposition (wrong numerics,
    # identical memory traffic + grid; never dispatched by ops.attention):
    #   "noexp"    — full online-softmax machinery with the exponential
    #                replaced by a single VPU add: isolates the cost of the
    #                exp itself from the max/sum reductions around it.
    #   "mxu_only" — both matmuls + accumulate only (p = s, no stats): the
    #                measured MXU floor of this exact kernel/grid/blocks.
    if exp_impl == "mxu_only":
        s = jax.lax.dot_general(
            kt, qt, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        pv = jax.lax.dot_general(
            vt, s.astype(vt.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] = acc_ref[:] + pv

        @pl.when(ki == kv_steps - 1)
        def _finalize_mxu():
            o_ref[0] = acc_ref[:].astype(o_ref.dtype)

        return
    # "staticmax" — max-free online softmax: p = 2^(s - STATIC_OFF), no
    # running-max pass / no acc rescale (the power-of-two offset cancels
    # exactly in acc/l at finalise; see STATIC_OFF note).
    if exp_impl == "staticmax":
        s = jax.lax.dot_general(
            kt, qt, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if scale != 1.0:
            s = s * scale
        if masked:
            kv_ids = (ki * block_k
                      + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0))
            s = jnp.where(kv_ids < kv_len, s, NEG_INF)
        p = jnp.exp2(s - STATIC_OFF)  # NEG_INF underflows to exactly 0
        l_ref[:] = l_ref[:] + jnp.sum(p, axis=0, keepdims=True)
        pv = jax.lax.dot_general(
            vt, p.astype(vt.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] = acc_ref[:] + pv

        @pl.when(ki == kv_steps - 1)
        def _finalize_static():
            l = jnp.maximum(l_ref[:], 2.0 ** -126)  # all-row-underflow guard
            o_ref[0] = (acc_ref[:] / l).astype(o_ref.dtype)

        return
    exp_fn = {"exp": jnp.exp, "exp2": jnp.exp2, "fastexp2": _fast_exp2,
              "noexp": lambda x: x + 1.0}[exp_impl]

    # scores^T [BK, BQ]: contract over D (sublanes of both operands)
    s = jax.lax.dot_general(
        kt, qt, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    if scale != 1.0:
        s = s * scale
    if masked:
        kv_ids = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        s = jnp.where(kv_ids < kv_len, s, NEG_INF)

    m_prev = m_ref[:]  # [1, BQ]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=0, keepdims=True))
    alpha = exp_fn(m_prev - m_new)
    p = exp_fn(s - m_new)  # [BK, BQ]

    l_ref[:] = alpha * l_ref[:] + jnp.sum(p, axis=0, keepdims=True)
    # out^T [D, BQ]: contract over BK (lanes of vt, sublanes of p)
    pv = jax.lax.dot_general(
        vt, p.astype(vt.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_ref[:] = alpha * acc_ref[:] + pv
    m_ref[:] = m_new

    @pl.when(ki == kv_steps - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


def _flash_dt_staticaug(qt, kt, vt, *, B, H, D, Sq, Skv, scale,
                        block_q, block_k):
    """Max-free flash with BOTH softmax reductions folded into the MXU.

    Augment the head dim with one constant row so the two matmuls carry the
    softmax bookkeeping for free (the MXU sits at single-digit utilisation
    at D=40/64 — see PERF.md round-4 roofline):

      scores:  qa = [q * scale*log2e ; 1],  ka = [k ; -STATIC_OFF]
               -> s = (scale*log2e) q.k - STATIC_OFF   (subtract fused)
      PV:      va = [v ; 1]
               -> pv rows 0..D-1 = P @ V,  row D = rowsum(P) = l  (sum fused)

    Leaves exp2 + the bf16 cast as the ONLY per-score-element VPU work.
    Same softmax semantics as "staticmax" (power-of-two offset cancels in
    acc/l); normalisation uses the sum of the BF16-ROUNDED weights actually
    fed to the PV matmul — self-consistent where the running-max kernel
    normalises by the pre-rounding fp32 sum.
    """
    BH = B * H
    # One extra constant row, then pad the row axis to the 8-sublane tile.
    Da = ((D + 1 + 7) // 8) * 8
    dt = qt.dtype

    def aug(x, row_val):
        row = jnp.full((BH, 1, x.shape[2]), row_val, dt)
        return _pad_to(jnp.concatenate([x, row], axis=1), Da, 1)

    qs = (qt.astype(jnp.float32) * (scale * LOG2E)).astype(dt)
    qa = aug(qs, 1.0)
    ka = aug(kt, -STATIC_OFF)
    va = aug(vt, 1.0)

    bq = _min_pad_block(Sq, block_q)
    bk = _min_pad_block(Skv, block_k)
    Sqp = ((Sq + bq - 1) // bq) * bq
    Skvp = ((Skv + bk - 1) // bk) * bk
    qa = _pad_to(qa, Sqp, 2)
    ka = _pad_to(ka, Skvp, 2)
    va = _pad_to(va, Skvp, 2)
    kv_steps = Skvp // bk

    out = pl.pallas_call(
        functools.partial(
            _flash_dt_staticaug_kernel, kv_steps=kv_steps, kv_len=Skv,
            block_k=bk, masked=(Skvp != Skv), l_row=D,
        ),
        grid=(BH, Sqp // bq, kv_steps),
        in_specs=[
            pl.BlockSpec((1, Da, bq), lambda b, qi, ki: (b, 0, qi)),
            pl.BlockSpec((1, Da, bk), lambda b, qi, ki: (b, 0, ki)),
            pl.BlockSpec((1, Da, bk), lambda b, qi, ki: (b, 0, ki)),
        ],
        out_specs=pl.BlockSpec((1, Da, bq), lambda b, qi, ki: (b, 0, qi)),
        out_shape=jax.ShapeDtypeStruct((BH, Da, Sqp), dt),
        scratch_shapes=[pltpu.VMEM((Da, bq), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(qa, ka, va)
    return out[:, :D, :Sq]


def _flash_dt_staticaug_kernel(qa_ref, ka_ref, va_ref, o_ref, acc_ref, *,
                               kv_steps, kv_len, block_k, masked, l_row):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    qa = qa_ref[0]  # [Da, BQ] — scale*log2e in q, "+1" row at l_row
    ka = ka_ref[0]  # [Da, BK] — "-STATIC_OFF" row at l_row
    va = va_ref[0]  # [Da, BK] — ones row at l_row

    # s[bk, bq] = (scale*log2e) q.k - STATIC_OFF, straight off the MXU
    s = jax.lax.dot_general(
        ka, qa, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    if masked:
        kv_ids = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        s = jnp.where(kv_ids < kv_len, s, NEG_INF)
    p = jnp.exp2(s).astype(va.dtype)  # the ONLY per-element VPU work

    # rows 0..D-1: P@V; row l_row: rowsum(P) = l — one MXU op for both
    pv = jax.lax.dot_general(
        va, p, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    acc_ref[:] = acc_ref[:] + pv

    @pl.when(ki == kv_steps - 1)
    def _finalize():
        l = jnp.maximum(acc_ref[l_row:l_row + 1, :], 2.0 ** -126)
        o_ref[0] = (acc_ref[:] / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block"))
def flash_attention_blockdiag(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float,
    block: int = 512,
) -> jnp.ndarray:
    """Tiny-sequence (temporal, S=F<=32) self-attention, MXU-aligned.

    The motion modules attend over F frames per spatial position
    ([B*H*W, F, H, D]; reference trace experiments/03_trace_forward_pass.py:
    160-169). XLA lowers that as a 65k-deep batch of [F, F] matmuls whose
    score tensors pad F=16 lanes up to 128 — an 8x HBM/MXU waste that makes
    these "tiny" sites ~6 ms each (PERF.md breakdown).

    Trick: positions x frames is ONE contiguous token axis ([P, F] ->
    [P*F] is a pure reshape), and per-position attention is exactly
    full attention over that axis under a block-diagonal mask
    (token i ~ token j iff i//F == j//F). With a block size that's a
    multiple of F, every off-diagonal tile is fully masked — so only the
    grid's diagonal tiles are computed: a one-shot masked softmax per
    [block, block] tile, no online recurrence, no padding waste. The
    transposed (D-sublane) layout avoids head-dim lane padding as in
    flash_attention_dt; scale*log2(e) is folded into q (base-2 softmax).

    Requires F | block and block % 128 == 0 (dispatch gates on
    128 % F == 0).
    """
    P, F, H, D = q.shape
    assert k.shape == q.shape and v.shape == q.shape
    assert D % 8 == 0, D
    assert block % 128 == 0 and block % F == 0, (block, F)

    T = P * F

    def fold_t(x):  # [P, F, H, D] -> [H, D, P*F]
        return x.transpose(2, 3, 0, 1).reshape(H, D, T)

    qt = fold_t(q) * jnp.asarray(scale * LOG2E, q.dtype)
    kt, vt = fold_t(k), fold_t(v)

    Tp = ((T + block - 1) // block) * block
    qt, kt, vt = _pad_to(qt, Tp, 2), _pad_to(kt, Tp, 2), _pad_to(vt, Tp, 2)

    grid = (H, Tp // block)
    out = pl.pallas_call(
        functools.partial(_blockdiag_kernel, seq=F),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, D, block), lambda h, t: (h, 0, t)),
            pl.BlockSpec((1, D, block), lambda h, t: (h, 0, t)),
            pl.BlockSpec((1, D, block), lambda h, t: (h, 0, t)),
        ],
        out_specs=pl.BlockSpec((1, D, block), lambda h, t: (h, 0, t)),
        out_shape=jax.ShapeDtypeStruct((H, D, Tp), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(qt, kt, vt)

    out = out[:, :, :T]  # [H, D, T]
    return out.reshape(H, D, P, F).transpose(2, 3, 0, 1)


@functools.partial(jax.jit, static_argnames=("scale", "heads", "block"))
def flash_attention_blockdiag_tc(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float,
    heads: int,
    block: int = 256,
) -> jnp.ndarray:
    """Tiny-seq block-diagonal attention on the NATIVE [tokens, C] layout.

    flash_attention_blockdiag's host-side fold to [H, D, T] is a
    minor-dims-to-major relayout that costs more than the attention itself
    (PERF.md: 8.2 ms vs 5.2 ms for the XLA path at the level-0 temporal
    shape). Here q/k/v stay in the projection output layout [P, F, C]
    (reshaped [P*F, C] for free since P,F are adjacent); the kernel
    transposes each [block, C] tile in VMEM (cheap — no HBM relayout) and
    slices heads on SUBLANES (D % 8 == 0), so HBM sees exactly 3 reads +
    1 write of the logical tensors and nothing else.
    """
    P, F, H, D = q.shape
    assert k.shape == q.shape and v.shape == q.shape
    assert H == heads and D % 8 == 0, (H, heads, D)
    assert block % 128 == 0 and block % F == 0, (block, F)

    T = P * F
    C = H * D

    def fold(x):  # [P, F, H, D] -> [T, C]: pure reshape, no data movement
        return x.reshape(T, C)

    q2, k2, v2 = fold(q), fold(k), fold(v)
    Tp = ((T + block - 1) // block) * block
    q2, k2, v2 = _pad_to(q2, Tp, 0), _pad_to(k2, Tp, 0), _pad_to(v2, Tp, 0)

    grid = (Tp // block,)
    out = pl.pallas_call(
        functools.partial(
            _blockdiag_tc_kernel, seq=F, heads=H, head_dim=D,
            scale_log2e=scale * LOG2E,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, C), lambda t: (t, 0)),
            pl.BlockSpec((block, C), lambda t: (t, 0)),
            pl.BlockSpec((block, C), lambda t: (t, 0)),
        ],
        out_specs=pl.BlockSpec((block, C), lambda t: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((Tp, C), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(q2, k2, v2)

    return out[:T].reshape(P, F, H, D)


def _blockdiag_tc_kernel(q_ref, k_ref, v_ref, o_ref, *, seq, heads, head_dim,
                         scale_log2e):
    qt = q_ref[:].T  # [C, BQ] — VMEM transpose, heads on sublanes
    kt = k_ref[:].T
    vt = v_ref[:].T

    rows = None
    outs = []
    for h in range(heads):
        lo = h * head_dim
        hi = lo + head_dim
        s = jax.lax.dot_general(
            kt[lo:hi], qt[lo:hi], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BK, BQ]
        s = s * scale_log2e
        if rows is None:
            rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) // seq
            cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) // seq
            allowed = rows == cols
        s = jnp.where(allowed, s, NEG_INF)
        m = jnp.max(s, axis=0, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=0, keepdims=True)
        pv = jax.lax.dot_general(
            vt[lo:hi], p.astype(vt.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [D, BQ]
        outs.append(pv / l)
    o_ref[:] = jnp.concatenate(outs, axis=0).T.astype(o_ref.dtype)


def _blockdiag_tc2_kernel(q_ref, k_ref, v_ref, o_ref, *, seq, heads, head_dim,
                          scale_log2e):
    """tc variant with a single VMEM transpose (k only).

    q/v head slices stay in the native [BQ, C] layout (lane slices at
    D-multiples); scores are computed q-major so softmax reduces over
    lanes and the PV dot consumes v natively.
    """
    q = q_ref[:]  # [BQ, C]
    v = v_ref[:]
    kt = k_ref[:].T  # [C, BQ]

    allowed = None
    outs = []
    for h in range(heads):
        lo = h * head_dim
        hi = lo + head_dim
        s = jax.lax.dot_general(
            q[:, lo:hi], kt[lo:hi], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BQ, BK]
        s = s * scale_log2e
        if allowed is None:
            rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) // seq
            cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) // seq
            allowed = rows == cols
        s = jnp.where(allowed, s, NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v[:, lo:hi], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BQ, D]
        outs.append(pv / l)
    o_ref[:] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "heads", "block"))
def flash_attention_blockdiag_tc2(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float,
    heads: int,
    block: int = 256,
) -> jnp.ndarray:
    """blockdiag_tc with the single-transpose q-major kernel."""
    P, F, H, D = q.shape
    assert H == heads and D % 8 == 0, (H, heads, D)
    assert block % 128 == 0 and block % F == 0, (block, F)
    T = P * F
    C = H * D
    q2, k2, v2 = q.reshape(T, C), k.reshape(T, C), v.reshape(T, C)
    Tp = ((T + block - 1) // block) * block
    q2, k2, v2 = _pad_to(q2, Tp, 0), _pad_to(k2, Tp, 0), _pad_to(v2, Tp, 0)
    out = pl.pallas_call(
        functools.partial(
            _blockdiag_tc2_kernel, seq=F, heads=H, head_dim=D,
            scale_log2e=scale * LOG2E,
        ),
        grid=(Tp // block,),
        in_specs=[
            pl.BlockSpec((block, C), lambda t: (t, 0)),
            pl.BlockSpec((block, C), lambda t: (t, 0)),
            pl.BlockSpec((block, C), lambda t: (t, 0)),
        ],
        out_specs=pl.BlockSpec((block, C), lambda t: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((Tp, C), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(q2, k2, v2)
    return out[:T].reshape(P, F, H, D)


def _blockdiag_kernel(qt_ref, kt_ref, vt_ref, o_ref, *, seq):
    qt = qt_ref[0]  # [D, BQ] — scores already in the log2 domain
    kt = kt_ref[0]
    vt = vt_ref[0]

    s = jax.lax.dot_general(
        kt, qt, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BK, BQ]
    # Block-diagonal mask: tiles start at multiples of `seq`, so local
    # indices suffice. Padded tail tokens always mismatch real groups.
    rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) // seq
    cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) // seq
    s = jnp.where(rows == cols, s, NEG_INF)

    m = jnp.max(s, axis=0, keepdims=True)  # [1, BQ]
    p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=0, keepdims=True)
    pv = jax.lax.dot_general(
        vt, p.astype(vt.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [D, BQ]
    o_ref[0] = (pv / l).astype(o_ref.dtype)


def _flash_kernel_nomask(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref,
                         *, scale, kv_steps, kv_len, block_k):
    del kv_len, block_k
    _flash_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref,
                  scale=scale, kv_steps=kv_steps)


def _flash_kernel_masked(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref,
                         *, scale, kv_steps, kv_len, block_k):
    """Variant masking padded KV rows (only used when Skv % block_k != 0)."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    kv_ids = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(kv_ids < kv_len, s, NEG_INF)

    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_ref[:] = alpha * l_ref[:] + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_ref[:] = alpha * acc_ref[:] + pv
    m_ref[:] = m_new

    @pl.when(ki == kv_steps - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)
