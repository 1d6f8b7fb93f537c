"""Attention op with implementation dispatch.

Single entry point for every attention in the framework (spatial self-attn,
text cross-attn, temporal/motion attn — the three flavours the reference
traces at experiments/03_trace_forward_pass.py:124-241). Shapes:

    q: [B, Sq, H, D]   k, v: [B, Skv, H, D]   ->   [B, Sq, H, D]

Implementations:
  * ``xla``       — einsum + EXACT fp32 softmax (probs stored fp32).
  * ``xla_bf16p`` — fp32 softmax statistics, probs tensor stored bf16
                    between the two matmuls (-18% at short-seq sites).
  * ``flash``     — Pallas TPU flash-attention kernel
                    (kernels/flash_attention.py) for long spatial sequences
                    (HW up to 4096+) where the naive S×S score tensor would
                    blow HBM traffic.
  * ``auto``      — flash on TPU when the shape qualifies; xla_bf16p for
                    maskless bf16 inputs; else xla.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def _xla_attention(q, k, v, scale: float, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    # [B, S, H, D] -> [B, H, S, D]
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qt, kt, preferred_element_type=jnp.float32)
    scores = scores * jnp.asarray(scale, dtype=scores.dtype)
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.finfo(scores.dtype).min)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(vt.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, vt, preferred_element_type=jnp.float32)
    return jnp.swapaxes(out.astype(q.dtype), 1, 2)


def _xla_attention_bf16probs(q, k, v, scale: float) -> jnp.ndarray:
    """Short-sequence XLA attention with the probs tensor in bf16.

    The temporal (S=16) and cross (Skv=77) sites stream the probability
    tensor through HBM between the two batched matmuls; softmax statistics
    stay fp32 but the stored probs drop to bf16, which measures 18%/17%
    faster at the UNet level-0 temporal/cross shapes
    (scripts/bench_shortseq_attn.py). Only used when v is bf16 — fp32
    reference paths keep the exact softmax.
    """
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores * jnp.asarray(scale, jnp.float32)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m).astype(jnp.bfloat16)
    l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)  # [b,h,q,1]
    out = jnp.einsum("bhqk,bkhd->bqhd", p, v,
                     preferred_element_type=jnp.float32)
    return (out / jnp.swapaxes(l, 1, 2)).astype(q.dtype)


def _xla_attention_bf16probs_static(q, k, v, scale: float) -> jnp.ndarray:
    """bf16-probs short-seq attention with the MAX-FREE static softmax.

    Same trick as the flash kernel's "staticmax" (PERF.md round-4
    roofline): p = 2^(s*scale*log2e - 80) — the power-of-two offset is
    floating-point-exact and cancels in out/l, so no rowmax pass or its
    serialization. Same domain bound (a row of scaled logits ALL below
    -46 underflows; guard returns zeros there).
    """
    from vdx.kernels.flash_attention import LOG2E, STATIC_OFF

    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores * jnp.asarray(scale * LOG2E, jnp.float32)
    p = jnp.exp2(scores - STATIC_OFF).astype(jnp.bfloat16)
    l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)  # [b,h,q,1]
    l = jnp.maximum(l, 2.0 ** -126)
    out = jnp.einsum("bhqk,bkhd->bqhd", p, v,
                     preferred_element_type=jnp.float32)
    return (out / jnp.swapaxes(l, 1, 2)).astype(q.dtype)


def _xla_attention_bf16probs_packed(q, k, v, scale: float, pack: int) -> jnp.ndarray:
    """Block-diagonal PACKED short-sequence attention (exact; NOT dispatched).

    Idea: the temporal sites run huge-batch tiny-seq attention
    ([B*H*W, F, H, D], F=16..32); XLA lowers the scores/PV batched matmuls
    with M=N=F — an FxF corner of each 128x128 MXU pass. Packing
    P = 128//F batch rows into one [P*F, P*F] score matrix with a STATIC
    block-diagonal -inf mask fills the tiles; off-block probs are exactly 0
    so results match the unpacked path (verified bitwise at bf16).

    MEASURED NEGATIVE (scripts/bench_attn_shapes.py, round 3): the Px
    score-tensor HBM blowup + XLA's lowering of the 6D einsums lose 5x at
    BOTH hot shapes — [18432,25,5,64]: 69.1 ms vs bf16p's 13.2;
    [8192,16,8,40]: 33.5 vs 6.7. Kept callable (impl="xla_bf16p_packed")
    and parity-tested as the record of the eighth short-seq attempt; the
    dispatch keeps xla_bf16p.
    """
    B, S, H, D = q.shape
    G = -(-B // pack)
    if G * pack != B:
        padb = G * pack - B
        pad4 = ((0, padb), (0, 0), (0, 0), (0, 0))
        q = jnp.pad(q, pad4)
        k = jnp.pad(k, pad4)
        v = jnp.pad(v, pad4)
    qg = q.reshape(G, pack, S, H, D)
    kg = k.reshape(G, pack, S, H, D)
    vg = v.reshape(G, pack, S, H, D)
    scores = jnp.einsum("gpshd,gqthd->ghpsqt", qg, kg,
                        preferred_element_type=jnp.float32)
    scores = scores * jnp.asarray(scale, jnp.float32)
    # rows of pack-slot p attend only pack-slot p's keys
    blockdiag = jnp.eye(pack, dtype=bool)[None, None, :, None, :, None]
    scores = jnp.where(blockdiag, scores, -1e30)
    m = jnp.max(scores, axis=(4, 5), keepdims=True)
    p = jnp.exp(scores - m).astype(jnp.bfloat16)
    l = jnp.sum(p.astype(jnp.float32), axis=(4, 5))  # [G, H, P, S]
    out = jnp.einsum("ghpsqt,gqthd->gpshd", p, vg,
                     preferred_element_type=jnp.float32)
    out = out / l.transpose(0, 2, 3, 1)[..., None]
    out = out.astype(q.dtype).reshape(G * pack, S, H, D)
    return out[:B]


@functools.lru_cache(maxsize=1)
def _flash_available() -> bool:
    try:
        from vdx.kernels import flash_attention  # noqa: F401

        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _should_use_flash(q, k) -> bool:
    # Flash pays off when the score matrix is large; short KV (cross-attn 77,
    # temporal 16-32) is faster through plain XLA fusion.
    sq, skv = q.shape[1], k.shape[1]
    dh = q.shape[-1]
    return sq >= 512 and skv >= 512 and dh <= 256


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: Optional[float] = None,
    mask: Optional[jnp.ndarray] = None,
    impl: str = "auto",
    kv_valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Scaled dot-product attention over [B, S, H, D] tensors.

    ``kv_valid`` ([S_kv_local] bool) is ring-only: ragged frame sharding's
    key-validity mask, rotated around the ring with its KV block.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if kv_valid is not None and not impl.startswith("ring:"):
        raise ValueError("kv_valid is only supported by ring attention; "
                         "local ragged paths slice the frame axis instead")

    if impl == "auto":
        if mask is None and _flash_available() and _should_use_flash(q, k):
            impl = "flash"
        elif mask is None and v.dtype == jnp.bfloat16:
            # Temporal/motion sites (S = frame count <= 32) stay on the
            # XLA path: the block-diagonal Pallas kernels
            # (kernels/flash_attention.py blockdiag*) are measured SLOWER
            # than XLA+bf16probs at the level-0 shape — host-side folds /
            # in-VMEM transposes eat the padding win (PERF.md). Revisit if
            # Mosaic gains cheap tile transposes.
            impl = "xla_bf16p"
        else:
            impl = "xla"

    if impl == "blockdiag":
        from vdx.kernels.flash_attention import flash_attention_blockdiag

        return flash_attention_blockdiag(q, k, v, scale=scale)
    if impl == "flash":
        D = q.shape[-1]
        if D % 8 == 0 and D < 128:
            # transposed layout: no 128-lane head-dim padding (25% faster at
            # the UNet's D=40/80 shapes — PERF.md kernel table). Base-2
            # softmax (scale*log2e folded into q) is another 7% on top.
            from vdx.kernels.flash_attention import flash_attention_dt

            # block_q spanning the whole sequence (grid = kv steps only)
            # measures 7% faster than 1024x1024 at the level-0 shape
            # (PERF.md block sweep); block_q is clamped to S internally.
            #
            # "staticmax": max-free base-2 softmax (p = 2^(s - 80), offset a
            # power of two so the scaling is fp-exact and cancels in acc/l).
            # Removing the running-max pass + acc rescale puts the kernel AT
            # its own matmul-only floor: 69.2 -> 50.4 ms at the SVD L0 site,
            # 15.8 -> 12.3 ms at the AnimateDiff L0 site (PERF.md round-4
            # roofline). Domain bound: a row whose EVERY scaled logit is
            # below -46 underflows to zeros (true softmax there is an
            # ~uniform average) — unreachable for sane activations; the
            # running-max kernel remains available via exp_impl="exp2".
            return flash_attention_dt(
                q, k, v, scale=scale, block_q=4096, block_k=1024,
                exp_impl="staticmax",
            )
        from vdx.kernels.flash_attention import flash_attention

        return flash_attention(q, k, v, scale=scale)
    if impl == "xla_bf16p_packed":
        assert mask is None, "packed path does not support masks"
        S = q.shape[1]
        pack = max(1, 128 // S)
        if pack == 1 or k.shape[1] != S:
            return _xla_attention_bf16probs(q, k, v, scale)
        return _xla_attention_bf16probs_packed(q, k, v, scale, pack)
    if impl == "xla_bf16p":
        # bf16-prob fast path is only picked here or by explicit request —
        # impl="xla" always means the exact fp32-softmax program.
        assert mask is None, "bf16-prob path does not support masks"
        return _xla_attention_bf16probs(q, k, v, scale)
    if impl == "xla":
        return _xla_attention(q, k, v, scale, mask)
    if impl.startswith("ring:"):
        # Sequence-parallel ring attention: the S axis of q/k/v is a LOCAL
        # shard of a mesh axis; only valid inside shard_map.
        from vdx.parallel.ring_attention import ring_attention

        assert mask is None, "ring attention does not support masks"
        return ring_attention(q, k, v, axis_name=impl.split(":", 1)[1],
                              scale=scale, kv_valid=kv_valid)
    raise ValueError(f"unknown attention impl {impl!r}")
