#!/usr/bin/env python
"""Short-sequence attention micro-optimisation bench (TPU probe).

The fwd breakdown (scripts/bench_fwd_breakdown.py) shows the SHORT-sequence
attention sites — text cross-attn (Skv=77) and temporal/motion attn (S=16)
— cost ~140 ms of the 441 ms UNet forward through the XLA path: fp32 score
tensors and layout transposes stream hundreds of MB through HBM per site.
This bench times candidate implementations at the two level-0 hot shapes:

  temporal: q,k,v [8192, 16, 8, 40]   (B*H*W positions, F frames)
  cross:    q [32, 4096, 8, 40], kv [32, 77, 8, 40]

Usage: python -u scripts/bench_shortseq_attn.py [temporal|cross|all]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

K = 16


def timeit(tag, fn, make_inputs):
    @jax.jit
    def loop(q, k, v):
        def body(c, _):
            o = fn(c, k, v)
            return (c + 0.01 * o).astype(c.dtype), ()
        out, _ = jax.lax.scan(body, q, None, length=K)
        return out

    def fresh(i):
        kq, kk, kv = jax.random.split(jax.random.PRNGKey(i), 3)
        arrs = make_inputs(kq, kk, kv)
        jax.block_until_ready(arrs)
        float(jnp.sum(arrs[0]))
        return arrs

    q, k, v = fresh(0)
    t0 = time.time()
    float(jnp.sum(loop(q, k, v)))
    print(f"[{tag}] compile+first {time.time()-t0:.1f} s", flush=True)
    times = []
    for i in range(1, 3):
        q, k, v = fresh(i)
        t0 = time.time()
        float(jnp.sum(loop(q, k, v)))
        times.append(time.time() - t0)
    best = min(times) / K * 1e3
    print(f"[{tag}] {best:.2f} ms/site", flush=True)
    return best


def xla_current(q, k, v, scale):
    from vdx.ops.attention import _xla_attention
    return _xla_attention(q, k, v, scale, None)


def xla_noswap(q, k, v, scale):
    """einsum with b,h as batch dims, output transposed back by einsum."""
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def xla_bf16probs(q, k, v, scale):
    """Softmax stats in fp32 but the exp/probs tensor in bf16 (halves the
    biggest HBM stream; sum accumulates fp32 via preferred_element_type)."""
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    m = jax.lax.stop_gradient(jnp.max(scores, axis=-1, keepdims=True))
    p = jnp.exp(scores - m).astype(jnp.bfloat16)
    l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
    out = jnp.einsum("bhqk,bkhd->bqhd", p, v,
                     preferred_element_type=jnp.float32)
    # l: [b, h, q, 1] -> [b, q, h, 1] to match out
    return (out / jnp.swapaxes(l, 1, 2)).astype(q.dtype)


def xla_bf16scores(q, k, v, scale):
    """Scores accumulated in bf16 (halves the batched-matmul output cost;
    S=16 keeps the summation error negligible)."""
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.bfloat16)
    probs = jax.nn.softmax(scores.astype(jnp.float32) * scale, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def xla_khq(q, k, v, scale):
    """Scores in [b, k, h, q] so the two minor dims are (h=8, q=16) ->
    h*q = 128 lanes exactly after a free trailing reshape — no 16->128
    lane padding on the biggest stream. Softmax reduces over axis 1
    (sublanes); probs stored bf16."""
    scores = jnp.einsum("bqhd,bkhd->bkhq", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores * jnp.asarray(scale, jnp.float32)
    m = jnp.max(scores, axis=1, keepdims=True)
    p = jnp.exp(scores - m).astype(jnp.bfloat16)
    l = jnp.sum(p.astype(jnp.float32), axis=1, keepdims=True)  # [b,1,h,q]
    out = jnp.einsum("bkhq,bkhd->bqhd", p, v,
                     preferred_element_type=jnp.float32)
    return (out / jnp.transpose(l, (0, 3, 2, 1))).astype(q.dtype)


def xla_headcross(q, k, v, scale):
    """Batch only over positions; let the MXU compute the full head-crossed
    [F, H, F, H] score block (64x padded FLOPs, still tiny) and slice the
    h==h' diagonal — avoids the 65536-deep batched-tiny-matmul lowering."""
    B, F, H, D = q.shape
    # [B, F*H*D] x [B, F*H*D] contracting d only: [B, F, H, F, H]
    s_full = jax.lax.dot_general(
        q, k, (((3,), (3,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [B, F, H, F2, H2]
    ii = jnp.arange(H)
    s = s_full[:, :, ii, :, ii]  # [H, B, F, F2] (advanced indexing moves H out)
    s = jnp.moveaxis(s, 0, 1) * scale  # [B, H, F, F2]
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def make_temporal(kq, kk, kv):
    shp = (8192, 16, 8, 40)
    mk = lambda key: jax.random.normal(key, shp, jnp.float32).astype(jnp.bfloat16)  # noqa: E731
    return mk(kq), mk(kk), mk(kv)


def make_cross(kq, kk, kv):
    mk = lambda key, shp: jax.random.normal(key, shp, jnp.float32).astype(jnp.bfloat16)  # noqa: E731
    return (mk(kq, (32, 4096, 8, 40)), mk(kk, (32, 77, 8, 40)),
            mk(kv, (32, 77, 8, 40)))


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    scale = 40 ** -0.5
    results = {}
    if which in ("all", "temporal"):
        for tag, fn in [
            ("t-xla-current", xla_current),
            ("t-xla-bf16probs", xla_bf16probs),
            ("t-xla-bf16scores", xla_bf16scores),
            ("t-xla-headcross", xla_headcross),
        ]:
            results[tag] = timeit(tag, lambda q, k, v, f=fn: f(q, k, v, scale),
                                  make_temporal)
        from vdx.kernels.flash_attention import (
            flash_attention_blockdiag,
            flash_attention_blockdiag_tc,
        )

        for blk in (512,):
            results[f"t-blockdiag{blk}"] = timeit(
                f"t-blockdiag{blk}",
                lambda q, k, v, b=blk: flash_attention_blockdiag(
                    q, k, v, scale=scale, block=b),
                make_temporal)
        for blk in (128, 256, 512):
            results[f"t-blockdiagtc{blk}"] = timeit(
                f"t-blockdiagtc{blk}",
                lambda q, k, v, b=blk: flash_attention_blockdiag_tc(
                    q, k, v, scale=scale, heads=8, block=b),
                make_temporal)
    if which in ("all", "cross"):
        from vdx.kernels.flash_attention import flash_attention_dt

        def x_flash_dt(q, k, v, scale):
            # Skv=77 -> one masked 128-wide kv block; kv_steps=1 so the
            # online-softmax machinery reduces to one-shot softmax.
            return flash_attention_dt(q, k, v, scale=scale, exp_impl="exp2")

        for tag, fn in [
            ("x-xla-current", xla_current),
            ("x-xla-noswap", xla_noswap),
            ("x-xla-bf16probs", xla_bf16probs),
            ("x-flash-dt", x_flash_dt),
        ]:
            results[tag] = timeit(tag, lambda q, k, v, f=fn: f(q, k, v, scale),
                                  make_cross)
        try:
            from vdx.kernels.shortseq_attention import crosskv_attention_fused
            results["x-pallas"] = timeit(
                "x-pallas",
                lambda q, k, v: crosskv_attention_fused(q, k, v, scale=scale),
                make_cross)
        except ImportError:
            pass
    print({k: round(v, 2) for k, v in results.items()}, flush=True)


if __name__ == "__main__":
    main()
