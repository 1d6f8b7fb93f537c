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
  no-ttranspose   — the whole temporal path of TransformerSpatioTemporal
                    skipped INCLUDING the [B,F,HW,C]<->[B*HW,F,C]
                    transposes (delta vs no-ttransformer isolates the
                    relayout cost)
  gn-affine       — group_norm(_silu) stats skipped (scale/bias/silu
                    kept): the GN reduction+normalise HBM cost
  conv1x1         — all spatial 3x3 convs -> 1x1 (keeps channels):
                    ~8/9 of conv FLOPs + the halo reads
  no-sres         — spatial ResnetBlock2D -> shortcut only (total
                    spatial-resnet cost incl. its GNs and convs)
  tconv-mm        — temporal 3x1x1 convs computed as three shifted CxC
                    matmuls (nn/temporal.FrameConv3) instead of nn.Conv:
                    candidate FIX, not an ablation — exact same math
  sconv-mm        — spatial 3x3 resnet convs as nine shifted CxC matmuls
                    (nn/resnet.SpatialConv3x3): candidate FIX

Usage: python -u scripts/bench_svd_fwd_breakdown.py [K] [which]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

import os

if os.environ.get("VDX_BENCH_TINY"):  # CPU smoke of the ablation patches
    B, F, H, W = 1, 4, 8, 8
else:
    B, F, H, W = 2, 25, 72, 128  # CFG pair at the north-star latent shape


def build():
    from vdx.core.dtypes import Policy
    from vdx.core.init import fast_init
    from vdx.models.svd_unet import SVDUNetConfig, UNetSpatioTemporal

    policy = Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    cfg = (SVDUNetConfig.tiny() if os.environ.get("VDX_BENCH_TINY")
           else SVDUNetConfig.svd())
    model = UNetSpatioTemporal(cfg, policy=policy)
    params = fast_init(
        model,
        jnp.zeros((1, 2, 8, 8, cfg.in_channels)), jnp.float32(0.5),
        jnp.zeros((1, 1, cfg.cross_attention_dim)), jnp.zeros((1, 3)),
    )
    params = jax.device_put(params)  # once — not per timed call
    rng = np.random.default_rng(0)
    emb = jnp.asarray(
        rng.standard_normal((B, 1, cfg.cross_attention_dim)), jnp.bfloat16)
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

    if which in ("all", "no-ttranspose"):
        import flax.linen as fnn

        import vdx.models.svd_unet as su

        real_cls = su.TransformerSpatioTemporal

        def spatial_only_tf(self, x, context, num_frames, refresh=None):
            from vdx.models.svd_unet import AlphaBlender
            from vdx.nn.transformer import BasicTransformerBlock

            r = refresh or {}
            BF, H, W, C = x.shape
            residual = x
            h = su.GroupNormModule(
                32 if C % 32 == 0 else min(C, 8), 1e-6, self.policy,
                name="norm")(x)
            h = fnn.Dense(C, dtype=self.policy.compute_dtype,
                          param_dtype=self.policy.param_dtype,
                          name="proj_in")(h)
            hs = h.reshape(BF, H * W, C)
            hs = BasicTransformerBlock(
                C, self.heads, self.head_dim, context_dim=self.context_dim,
                policy=self.policy, attn_impl=self.attn_impl, pab=self.pab,
                name="spatial_block",
            )(hs, context, refresh_self=r.get("spatial"),
              refresh_cross=r.get("cross"))
            h = AlphaBlender(name="mix")(hs, hs).reshape(BF, H, W, C)
            h = fnn.Dense(C, dtype=self.policy.compute_dtype,
                          param_dtype=self.policy.param_dtype,
                          name="proj_out")(h)
            return h + residual

        su.TransformerSpatioTemporal = type(
            "TransformerSpatioTemporal", (real_cls,),
            {"__call__": fnn.compact(spatial_only_tf)},
        )
        try:
            run("no-ttranspose")
        finally:
            su.TransformerSpatioTemporal = real_cls

    if which in ("all", "gn-affine"):
        import vdx.ops.groupnorm as gn

        real_gn = gn.group_norm
        real_gns = gn.group_norm_silu

        def affine_only(x, num_groups, scale, bias, eps=1e-5, stats_axis=None):
            return (x * scale.astype(x.dtype) + bias.astype(x.dtype))

        def affine_silu(x, num_groups, scale, bias, eps=1e-5, stats_axis=None):
            h = x * scale.astype(x.dtype) + bias.astype(x.dtype)
            return h * jax.nn.sigmoid(h)

        gn.group_norm = affine_only
        gn.group_norm_silu = affine_silu
        # resnet.py / temporal.py imported these by value
        import vdx.nn.resnet as rn
        import vdx.nn.temporal as nntemp

        real_tgn = nntemp.group_norm
        rn.group_norm_silu = affine_silu
        nntemp.group_norm = affine_only
        try:
            run("gn-affine")
        finally:
            gn.group_norm = real_gn
            gn.group_norm_silu = real_gns
            rn.group_norm_silu = real_gns
            nntemp.group_norm = real_tgn

    if which in ("all", "conv1x1"):
        # Center-tap conv: IDENTICAL param tree (3x3 kernel + bias declared
        # with the real shapes/inits) but only kernel[1,1] is contracted —
        # measures the 8/9 spatial-tap FLOPs + halo-read share of the
        # resnet 3x3 convs without re-initialising params.
        import flax.linen as fnn

        import vdx.nn.resnet as rn

        real_conv = rn._conv

        class CenterTapConv(fnn.Module):
            features: int
            policy: object

            @fnn.compact
            def __call__(self, x):
                Cin = x.shape[-1]
                kernel = self.param(
                    "kernel", fnn.initializers.lecun_normal(),
                    (3, 3, Cin, self.features), self.policy.param_dtype)
                bias = self.param("bias", fnn.initializers.zeros,
                                  (self.features,), self.policy.param_dtype)
                y = jax.lax.conv_general_dilated(
                    x, kernel[1:2, 1:2].astype(self.policy.compute_dtype),
                    window_strides=(1, 1), padding="VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return y + bias.astype(self.policy.compute_dtype)

        def conv_center(features, kernel, policy, name, stride=1):
            if stride == 1 and kernel == 3:
                return CenterTapConv(features, policy, name=name)
            return real_conv(features, kernel, policy, name, stride)

        rn._conv = conv_center
        try:
            run("conv1x1")
        finally:
            rn._conv = real_conv

    if which in ("all", "no-sres"):
        import flax.linen as fnn

        import vdx.models.svd_unet as su
        import vdx.nn.resnet as rn

        real_cls = rn.ResnetBlock2D

        def shortcut_only(self, x, temb=None):
            if x.shape[-1] != self.out_channels:
                return rn._conv(self.out_channels, 1, self.policy,
                                "conv_shortcut")(x)
            return x

        patched = type("ResnetBlock2D", (real_cls,),
                       {"__call__": fnn.compact(shortcut_only)})
        rn.ResnetBlock2D = patched
        su.ResnetBlock2D = patched
        try:
            run("no-sres")
        finally:
            rn.ResnetBlock2D = real_cls
            su.ResnetBlock2D = real_cls

    if which in ("all", "tconv-mm"):
        import vdx.models.svd_unet as su
        from vdx.nn.temporal import FrameConv3
        from vdx.ops.halo import frame_halo_pad

        real_tconv = su.SpatioTemporalResBlock._tconv

        def tconv_mm(self, t, axis, name, zero_init):
            if axis is None:
                pad = "same"
            else:
                t = frame_halo_pad(t, axis, halo=1, frame_axis=1)
                pad = "valid"
            return FrameConv3(self.out_channels, padding=pad,
                              policy=self.policy, zero_init=zero_init,
                              name=name)(t)

        su.SpatioTemporalResBlock._tconv = tconv_mm
        try:
            run("tconv-mm")
        finally:
            su.SpatioTemporalResBlock._tconv = real_tconv

    if which in ("all", "sconv-mm"):
        import vdx.nn.resnet as rn
        from vdx.nn.resnet import SpatialConv3x3

        real_conv = rn._conv

        def conv_mm(features, kernel, policy, name, stride=1):
            if stride == 1 and kernel == 3:
                return SpatialConv3x3(features, policy, name=name)
            return real_conv(features, kernel, policy, name, stride)

        rn._conv = conv_mm
        try:
            run("sconv-mm")
        finally:
            rn._conv = real_conv

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
