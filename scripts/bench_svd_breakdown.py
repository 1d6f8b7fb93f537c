#!/usr/bin/env python
"""SVD north-star per-stage attribution (VERDICT r2 #3).

Where do the ~56 s of 25f @576x1024 img2vid live? Measures, on the real
chip with the PERF.md methodology (fresh inputs per timed dispatch, host
materialisation, warm compile):

  * conditioning prep (VAE encode_moments + CLIP-vision tower + aug)
  * denoise-only program (25 EDM steps, CFG-batched)  -> per-step cost
  * one UNetSpatioTemporal forward (K-chained scan)   -> scan overhead check
  * temporal decode (chunk 5)
  * full single-program generate (the pipeline surface)

Usage: timeout 3600 python -u scripts/bench_svd_breakdown.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np


def timed(label, fn, n=2):
    best = None
    for i in range(n):
        t0 = time.time()
        out = fn(i)
        # force real execution through the tunnel
        _ = float(np.asarray(out).ravel()[0]) if hasattr(out, "ravel") or hasattr(out, "shape") else out
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
        print(f"  {label} run{i}: {dt:.2f} s", flush=True)
    print(f"{label}: {best:.2f} s", flush=True)
    return best


def main():
    import jax.numpy as jnp

    from vdx.core.cache import enable_compilation_cache
    from vdx.core.dtypes import Policy
    from vdx.core.rng import as_key
    from vdx.models.clip_vision import CLIPVisionConfig
    from vdx.models.svd_unet import SVDUNetConfig
    from vdx.models.vae import VAEConfig
    from vdx.pipelines.svd import SVDImg2VidPipeline

    enable_compilation_cache()
    print("backend:", jax.default_backend(), flush=True)
    policy = Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    t0 = time.time()
    pipe = SVDImg2VidPipeline.with_random_params(
        seed=0,
        unet_config=SVDUNetConfig.svd(),
        vae_config=VAEConfig.sd15(),
        vision_config=CLIPVisionConfig.vit_h(),
        policy=policy,
    )
    print(f"init: {time.time() - t0:.1f} s", flush=True)

    F, H, W, steps = 25, 576, 1024, 25
    ds = pipe.vae.config.downscale
    h, w = H // ds, W // ds
    latent_shape = (1, F, h, w, 4)

    def fresh_img(i):
        return np.random.default_rng(i).random((H, W, 3)).astype(np.float32)

    kw = dict(num_frames=F, height=H, width=W, num_inference_steps=steps,
              decode_chunk=5)

    # ---- 1. conditioning prep alone --------------------------------------
    prep_fn = jax.jit(
        lambda params, key, cond: self_prep(pipe, params, key, cond, latent_shape)
    )

    def run_prep(i):
        img = jnp.asarray(fresh_img(100 + i), jnp.float32)[None] * 2 - 1
        cond = (img, jnp.float32(6.0), jnp.float32(127.0), jnp.float32(0.02))
        out = prep_fn(pipe.params, as_key(i), cond)
        return np.asarray(out["den_args"][0], np.float32)

    run_prep(0)  # compile
    t_prep = timed("conditioning prep (vae-enc + vision)", run_prep)

    # ---- 2. denoise-only program ----------------------------------------
    def run_denoise(i):
        out = pipe(fresh_img(200 + i), seed=50 + i, output_type="latent", **kw)
        return np.asarray(out.latents[:, 0, :2, :2, 0], np.float32)

    t0 = time.time()
    run_denoise(99)
    print(f"denoise compile+first: {time.time() - t0:.1f} s", flush=True)
    t_denoise = timed("denoise-only (25 steps incl. prep)", run_denoise)
    print(f"  => per-step (CFG pair): {(t_denoise - t_prep) / steps * 1000:.0f} ms",
          flush=True)

    # ---- 3. one UNet forward, K-chained ----------------------------------
    K = 4
    unet = pipe.unet

    def fwd_scan(params, x0, emb, aids):
        def body(x, _):
            out = unet.apply(params, x, jnp.full((2,), 0.5), emb, aids)
            nxt = jnp.concatenate([out, out], axis=-1).astype(x.dtype) * x.dtype.type(1.0001)
            return nxt, None

        xK, _ = jax.lax.scan(body, x0, None, length=K)
        return xK

    fwd = jax.jit(fwd_scan)

    def run_fwd(i):
        rng = np.random.default_rng(300 + i)
        x = jnp.asarray(rng.standard_normal((2, F, h, w, 8)), jnp.bfloat16)
        emb = jnp.asarray(rng.standard_normal((2, 1, 1024)), jnp.bfloat16)
        aids = jnp.asarray([[6.0, 127.0, 0.02]] * 2, jnp.float32)
        out = fwd(pipe.params["unet"], x, emb, aids)
        return np.asarray(out[0, 0, 0, 0], np.float32)

    t0 = time.time()
    run_fwd(99)
    print(f"fwd compile+first: {time.time() - t0:.1f} s", flush=True)
    t_fwd = timed(f"UNet fwd xK={K}", run_fwd)
    print(f"  => one CFG-pair forward: {t_fwd / K * 1000:.0f} ms", flush=True)

    # ---- 4. temporal decode ----------------------------------------------
    dec = pipe._get_decode(5)

    def run_dec(i):
        rng = np.random.default_rng(400 + i)
        lat = jnp.asarray(rng.standard_normal(latent_shape), jnp.float32)
        out = dec(pipe.params, lat)
        return np.asarray(out[0, 0, 0, 0], np.float32)

    t0 = time.time()
    run_dec(99)
    print(f"decode compile+first: {time.time() - t0:.1f} s", flush=True)
    t_dec = timed("temporal decode (25f, chunk 5)", run_dec)

    # ---- 5. full pipeline -------------------------------------------------
    def run_full(i):
        out = pipe(fresh_img(500 + i), seed=80 + i, output_type="np", **kw)
        return out.frames[0][0, 0, 0, 0] * 1.0

    t0 = time.time()
    run_full(99)
    print(f"full compile+first: {time.time() - t0:.1f} s", flush=True)
    t_full = timed("full generate (single program)", run_full)

    print("\n===== SVD north-star breakdown (single chip) =====", flush=True)
    print(f"conditioning prep : {t_prep:6.2f} s", flush=True)
    print(f"denoise 25 steps  : {t_denoise - t_prep:6.2f} s "
          f"({(t_denoise - t_prep) / steps * 1000:.0f} ms/step)", flush=True)
    print(f"  (fwd-only check : {t_fwd / K * steps:6.2f} s from K-chain)",
          flush=True)
    print(f"temporal decode   : {t_dec:6.2f} s", flush=True)
    print(f"full pipeline     : {t_full:6.2f} s "
          f"(sum of parts {t_denoise + t_dec:.2f})", flush=True)
    print(f"8-chip linear projection: {t_full / 8:.2f} s vs <10 s target",
          flush=True)


def self_prep(pipe, params, key, cond, latent_shape):
    return pipe._prepare_cond(params, key, cond, latent_shape)


if __name__ == "__main__":
    main()
