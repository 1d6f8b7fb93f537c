#!/usr/bin/env python
"""Attribute UNetMotion forward time across components (TPU probe).

Times the K-chained fwd (bench_unet_fwd methodology) under surgical
monkeypatches that null out one component at a time; the delta vs the full
forward attributes cost. Variants:

  full        — production path (flash attention, fused GN)
  xla-attn    — dot_product_attention impl forced to xla
  no-attnmath — attention score/softmax math replaced by identity (q passes
                through; QKV/out projections and everything else remain)
  no-motion   — motion-module attention math removed the same way (the
                temporal scores are computed through the same op)
  gn-xla      — fused GroupNorm kernel off (VDX_GN_IMPL=xla re-exec)

Usage: python -u scripts/bench_fwd_breakdown.py [K]
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def build():
    from vdx.core.cache import enable_compilation_cache
    from vdx.core.dtypes import Policy
    from vdx.models.unet_motion import UNetMotion, UNetMotionConfig

    enable_compilation_cache()
    policy = Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    cfg = UNetMotionConfig.sd15()
    model = UNetMotion(cfg, policy=policy)
    B = 2
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 2, 8, 8, cfg.in_channels)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, cfg.cross_attention_dim)),
    )
    rng = np.random.default_rng(0)
    leaves, tdef = jax.tree.flatten(shapes)
    params = jax.tree.unflatten(tdef, [
        jnp.asarray((rng.standard_normal(l.shape) * 0.02).astype(np.float32),
                    dtype=l.dtype) for l in leaves
    ])
    ctx = jnp.asarray(rng.standard_normal((B, 77, cfg.cross_attention_dim)),
                      jnp.bfloat16)
    t = jnp.full((B,), 500, jnp.int32)
    return model, params, ctx, t


def time_variant(model, params, ctx, t, K, tag):
    B, F, H, W = 2, 16, 64, 64

    @jax.jit
    def fwd_loop(params, x0, t, ctx):
        def body(c, _):
            eps = model.apply(params, c, t, ctx)
            return (c + 0.001 * eps.astype(jnp.float32)).astype(c.dtype), ()
        out, _ = jax.lax.scan(body, x0, None, length=K)
        return out

    def fresh(i):
        x = jax.random.normal(jax.random.PRNGKey(i), (B, F, H, W, 4),
                              jnp.float32).astype(jnp.bfloat16)
        float(jnp.sum(x))
        return x

    t0 = time.time()
    out = fwd_loop(params, fresh(0), t, ctx)
    float(jnp.sum(out))
    print(f"[{tag}] compile+first: {time.time() - t0:.1f} s", flush=True)
    times = []
    for i in range(1, 4):
        x = fresh(i)
        t0 = time.time()
        out = fwd_loop(params, x, t, ctx)
        float(jnp.sum(out))
        times.append(time.time() - t0)
    best = min(times)
    print(f"[{tag}] BEST: {best / K * 1e3:.1f} ms/fwd", flush=True)
    return best / K


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    which = sys.argv[2] if len(sys.argv) > 2 else "all"
    print("backend:", jax.default_backend(), "K:", K, flush=True)
    model, params, ctx, t = build()

    import vdx.ops.attention as opsattn
    real_dpa = opsattn.dot_product_attention
    results = {}

    def run(tag):
        results[tag] = time_variant(model, params, ctx, t, K, tag)

    if which in ("all", "all2", "full"):
        run("full")

    if which in ("all", "xla-attn"):
        def xla_dpa(q, k, v, **kw):
            kw["impl"] = "xla"
            return real_dpa(q, k, v, **kw)
        # Attention modules call the symbol imported into nn.attention.
        import vdx.nn.attention as nnattn
        nnattn.dot_product_attention = xla_dpa
        run("xla-attn")
        nnattn.dot_product_attention = real_dpa

    if which in ("all", "no-attnmath"):
        import vdx.nn.attention as nnattn

        def null_dpa(q, k, v, **kw):
            return q
        nnattn.dot_product_attention = null_dpa
        run("no-attnmath")
        nnattn.dot_product_attention = real_dpa

    if which in ("all2", "no-motionmod"):
        # Whole motion module (GN, reshapes, projections, temporal blocks)
        # skipped via the module's temporal_impl hook — attributes the full
        # module cost. Params still exist (model definition unchanged), so
        # the production param tree is reused.
        import vdx.nn.temporal as nntemp

        real_call = nntemp.TemporalTransformer3D.__call__

        def null_call(self, x, num_frames, refresh=None):
            return x
        nntemp.TemporalTransformer3D.__call__ = null_call
        # params for unused modules are still initialised by eval_shape
        # (init path unaffected: we only patch after building params)
        try:
            run("no-motionmod")
        finally:
            nntemp.TemporalTransformer3D.__call__ = real_call

    if which in ("all2", "no-ff"):
        # FeedForward (GEGLU) nulled everywhere (spatial + temporal blocks).
        import vdx.nn.attention as nnattn
        import vdx.nn.temporal as nntemp
        import vdx.nn.transformer as nntr

        real_ffcall = nnattn.FeedForward.__call__

        def null_ffcall(self, x):
            return jnp.zeros_like(x)
        nnattn.FeedForward.__call__ = null_ffcall
        try:
            run("no-ff")
        finally:
            nnattn.FeedForward.__call__ = real_ffcall

    if which in ("all3", "no-tempgn"):
        # GroupNorm at the head of each motion module -> identity.
        import vdx.nn.temporal as nntemp

        real_gn = nntemp.group_norm

        def null_gn(x, groups, scale, bias, eps=1e-5, stats_axis=None):
            return x
        nntemp.group_norm = null_gn
        try:
            run("no-tempgn")
        finally:
            nntemp.group_norm = real_gn

    if which in ("all3", "no-templn"):
        # LayerNormF32 inside temporal blocks -> identity (spatial blocks
        # import their own symbol from nn.transformer, unaffected).
        import vdx.nn.temporal as nntemp

        real_ln = nntemp.LayerNormF32

        class NullLN:
            def __init__(self, *a, **kw):
                pass

            def __call__(self, x):
                return x
        nntemp.LayerNormF32 = NullLN
        try:
            run("no-templn")
        finally:
            nntemp.LayerNormF32 = real_ln

    if which in ("all3", "no-temptranspose"):
        # Replace the [B,F,H,W,C] <-> [B*H*W,F,C] relayouts with pure
        # reshapes (WRONG data, identical shapes/op count) to attribute
        # the transpose cost alone.
        import flax.linen as fnn

        import vdx.models.unet_motion as um
        import vdx.nn.temporal as nntemp

        def reshape_call(self, x, num_frames, refresh=None):
            BF, H, W, C = x.shape
            F = num_frames
            B = BF // F
            residual = x
            scale = self.param("norm_scale", fnn.initializers.ones, (C,),
                               self.policy.param_dtype)
            bias = self.param("norm_bias", fnn.initializers.zeros, (C,),
                              self.policy.param_dtype)
            import math as _math
            h = x.reshape(B, F, H, W, C)
            h = nntemp.group_norm(h, _math.gcd(32, C), scale, bias, eps=1e-6)
            h = h.reshape(B * H * W, F, C)  # reshape, not transpose
            h = fnn.Dense(C, dtype=self.policy.compute_dtype,
                          param_dtype=self.policy.param_dtype,
                          name="proj_in")(h)
            for i in range(self.depth):
                h = nntemp.TemporalBlock(
                    C, self.heads, C // self.heads,
                    max_seq_length=self.max_seq_length, policy=self.policy,
                    temporal_impl=self.temporal_impl, pab=self.pab,
                    name=f"blocks_{i}")(h, refresh=refresh)
            h = fnn.Dense(C, dtype=self.policy.compute_dtype,
                          param_dtype=self.policy.param_dtype,
                          name="proj_out")(h)
            h = h.reshape(BF, H, W, C)
            return h + residual

        # Subclass so flax's metaclass wraps the compact method properly;
        # patch the import site the UNet builds modules from.
        ReshapeTT3D = type(
            "TemporalTransformer3D",
            (nntemp.TemporalTransformer3D,),
            {"__call__": fnn.compact(reshape_call)},
        )
        um.TemporalTransformer3D = ReshapeTT3D
        try:
            run("no-temptranspose")
        finally:
            um.TemporalTransformer3D = nntemp.TemporalTransformer3D

    if which in ("all", "no-spatialmath"):
        # Null only the LONG-sequence (spatial self) attention; cross (S_kv=77)
        # and temporal (S=16) stay real.
        import vdx.nn.attention as nnattn

        def spatial_null_dpa(q, k, v, **kw):
            if q.shape[1] >= 512 and k.shape[1] >= 512:
                return q
            return real_dpa(q, k, v, **kw)
        nnattn.dot_product_attention = spatial_null_dpa
        run("no-spatialmath")
        nnattn.dot_product_attention = real_dpa

    print({k: round(v * 1e3, 1) for k, v in results.items()}, flush=True)


if __name__ == "__main__":
    main()
