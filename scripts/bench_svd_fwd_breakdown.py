#!/usr/bin/env python
"""Attribute the SVD UNet forward (north-star shape) across components.

bench_svd_breakdown.py showed the 56 s north-star video is ~100% UNet
forward (2158 ms/CFG pair x 25 steps; decode 3.7 s, prep 0.3 s).  This
probe attributes the 2158 ms: K-chained fwd under surgical monkeypatches
that null one component at a time (bench_fwd_breakdown.py methodology),
plus XLA cost_analysis FLOPs for a roofline target.

Variants:
  full            — production path
  no-attnmath     — all attention score/softmax math -> identity
  no-spatialmath  — only long-seq (spatial self) attention math nulled
  no-ff           — FeedForward (GEGLU) -> zeros everywhere
  no-tempres      — temporal branch of SpatioTemporalResBlock skipped
                    (spatial ResnetBlock2D result passes through)
  no-ttransformer — TemporalBlock -> identity (attn+FF+LNs of the
                    temporal transformer pair)

Usage: python -u scripts/bench_svd_fwd_breakdown.py [K] [which]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

B, F, H, W = 2, 25, 72, 128  # CFG pair at the north-star latent shape


def build():
    from vdx.core.dtypes import Policy
    from vdx.core.init import fast_init
    from vdx.models.svd_unet import SVDUNetConfig, UNetSpatioTemporal

    policy = Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    model = UNetSpatioTemporal(SVDUNetConfig.svd(), policy=policy)
    params = fast_init(
        model,
        jnp.zeros((1, 2, 8, 8, 8)), jnp.float32(0.5),
        jnp.zeros((1, 1, 1024)), jnp.zeros((1, 3)),
    )
    params = jax.device_put(params)  # once — not per timed call
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.standard_normal((B, 1, 1024)), jnp.bfloat16)
    aids = jnp.asarray([[6.0, 127.0, 0.02]] * B, jnp.float32)
    return model, params, emb, aids


def time_variant(model, params, emb, aids, K, tag, report_flops=False):
    @jax.jit
    def fwd_loop(params, x0, emb, aids):
        def body(x, _):
            out = model.apply(params, x, jnp.full((B,), 0.5), emb, aids)
            nxt = jnp.concatenate([out, out], axis=-1).astype(x.dtype)
            return nxt * x.dtype.type(1.0001), None

        xK, _ = jax.lax.scan(body, x0, None, length=K)
        return xK

    def fresh(i):
        x = jax.random.normal(jax.random.PRNGKey(i), (B, F, H, W, 8),
                              jnp.float32).astype(jnp.bfloat16)
        float(jnp.sum(x.astype(jnp.float32)))
        return x

    if report_flops:
        try:
            c = fwd_loop.lower(params, fresh(0), emb, aids).compile()
            fl = c.cost_analysis().get("flops", 0.0)
            print(f"[{tag}] cost_analysis: {fl / K / 1e12:.2f} TFLOP/fwd "
                  f"-> v5e roofline {fl / K / 197e12 * 1e3:.0f} ms/fwd",
                  flush=True)
        except Exception as e:  # cost model availability varies by backend
            print(f"[{tag}] cost_analysis unavailable: {e}", flush=True)

    t0 = time.time()
    out = fwd_loop(params, fresh(0), emb, aids)
    float(jnp.sum(out.astype(jnp.float32)))
    print(f"[{tag}] compile+first: {time.time() - t0:.1f} s", flush=True)
    times = []
    for i in range(1, 4):
        x = fresh(i)
        t0 = time.time()
        out = fwd_loop(params, x, emb, aids)
        float(jnp.sum(out.astype(jnp.float32)))
        times.append(time.time() - t0)
    best = min(times)
    print(f"[{tag}] BEST: {best / K * 1e3:.1f} ms/fwd", flush=True)
    return best / K


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    which = sys.argv[2] if len(sys.argv) > 2 else "all"
    print("backend:", jax.default_backend(), "K:", K, flush=True)
    from vdx.core.cache import enable_compilation_cache

    enable_compilation_cache()
    model, params, emb, aids = build()

    import vdx.nn.attention as nnattn

    real_dpa = nnattn.dot_product_attention
    results = {}

    def run(tag, report_flops=False):
        results[tag] = time_variant(model, params, emb, aids, K, tag,
                                    report_flops)

    if which in ("all", "full"):
        run("full", report_flops=True)

    if which in ("all", "no-attnmath"):
        nnattn.dot_product_attention = lambda q, k, v, **kw: q
        try:
            run("no-attnmath")
        finally:
            nnattn.dot_product_attention = real_dpa

    if which in ("all", "no-spatialmath"):
        def spatial_null(q, k, v, **kw):
            if q.shape[1] >= 512 and k.shape[1] >= 512:
                return q
            return real_dpa(q, k, v, **kw)

        nnattn.dot_product_attention = spatial_null
        try:
            run("no-spatialmath")
        finally:
            nnattn.dot_product_attention = real_dpa

    if which in ("all", "no-ff"):
        real_ff = nnattn.FeedForward.__call__
        nnattn.FeedForward.__call__ = lambda self, x: jnp.zeros_like(x)
        try:
            run("no-ff")
        finally:
            nnattn.FeedForward.__call__ = real_ff

    if which in ("all", "no-tempres"):
        # Subclass so flax's metaclass wraps the compact method, then patch
        # the import site (bench_fwd_breakdown.py no-temptranspose pattern).
        import flax.linen as fnn

        import vdx.models.svd_unet as su
        from vdx.nn.resnet import ResnetBlock2D

        real_cls = su.SpatioTemporalResBlock

        def spatial_only(self, x, temb, num_frames):
            return ResnetBlock2D(self.out_channels, policy=self.policy,
                                 name="spatial")(x, temb)

        su.SpatioTemporalResBlock = type(
            "SpatioTemporalResBlock", (real_cls,),
            {"__call__": fnn.compact(spatial_only)},
        )
        try:
            run("no-tempres")
        finally:
            su.SpatioTemporalResBlock = real_cls

    if which in ("all", "no-ttransformer"):
        import vdx.nn.temporal as nntemp

        real_tb = nntemp.TemporalBlock.__call__
        nntemp.TemporalBlock.__call__ = (
            lambda self, x, refresh=None: x
        )
        try:
            run("no-ttransformer")
        finally:
            nntemp.TemporalBlock.__call__ = real_tb

    full = results.get("full")
    print("\n==== SVD UNet fwd attribution (ms/fwd, CFG pair) ====", flush=True)
    for tag, v in results.items():
        d = f"  (component: {1e3 * (full - v):.0f} ms)" if full and tag != "full" else ""
        print(f"{tag:16s}: {v * 1e3:7.1f}{d}", flush=True)


if __name__ == "__main__":
    main()
