"""North-star numerics acceptance: TPU bf16 pipeline vs CPU fp32 reference.

BASELINE.md's acceptance criterion is per-frame PSNR vs a CPU reference at
the same seed. Round 4 carried only a tiny-shape bf16-vs-fp32 proxy
(tests/test_parity.py, ~36 dB on random weights); this script measures the
REAL thing at a mid-scale config: the full SD-1.5-size UNetMotion (1.3B),
8 frames @256^2, 10 DDIM steps, CFG 7.5 — the production bf16 TPU program
(Pallas flash attention, fused GN, bf16 params) against the exact fp32 CPU
program (XLA fp32 softmax path), identical seeds end to end (JAX threefry
is backend-deterministic, so both runs denoise the SAME initial noise).

Two-phase (the CPU leg takes ~30-60 min on the one core):
    # phase 1 (CPU, background):
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python scripts/parity_probe_midscale.py cpu /tmp/parity_cpu.npz
    # phase 2 (TPU):
    python scripts/parity_probe_midscale.py tpu /tmp/parity_tpu.npz
    # compare:
    python scripts/parity_probe_midscale.py compare /tmp/parity_cpu.npz /tmp/parity_tpu.npz
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

SEED_PARAMS = 0
SEED_GEN = 7
GEN = dict(num_frames=8, height=256, width=256, num_inference_steps=10,
           guidance_scale=7.5)
PROMPT = "portrait of a woman smiling, studio lighting"


def build(policy_name: str):
    import jax.numpy as jnp

    from vdx.core.dtypes import FP32_POLICY, Policy
    from vdx.pipelines import AnimateDiffPipeline

    policy = (
        FP32_POLICY
        if policy_name == "fp32"
        else Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    )
    # full SD-1.5 + motion config — the 1.3B flagship denoiser
    return AnimateDiffPipeline.with_random_params(seed=SEED_PARAMS, policy=policy)


def run(mode: str, out_path: str):
    """Modes: cpu (fp32 reference) | tpu (bf16 production program) |
    tpu32 (fp32 on TPU — isolates backend/kernels from dtype) |
    cpu_bf16 (bf16 on CPU — isolates dtype from backend)."""
    import jax

    if mode.startswith("cpu"):
        jax.config.update("jax_platforms", "cpu")
        pipe = build("bf16" if mode == "cpu_bf16" else "fp32")
    else:
        assert jax.devices()[0].platform != "cpu", "tpu leg needs the tunnel"
        if mode == "tpu32hp":
            # TRUE fp32 matmuls on the MXU (6-pass): the backend-correctness
            # control. TPU's DEFAULT precision computes fp32 dots as a
            # single bf16 MXU pass, so a plain fp32 program on TPU carries
            # bf16-class matmul rounding regardless of dtypes.
            jax.config.update("jax_default_matmul_precision", "highest")
        pipe = build("bf16" if mode == "tpu" else "fp32")
    t0 = time.time()
    out = pipe(PROMPT, seed=SEED_GEN, **GEN)
    frames = np.asarray(out.frames[0])
    lat = np.asarray(out.latents, np.float32)
    print(f"{mode}: {time.time() - t0:.1f} s, frames {frames.shape}")
    np.savez(out_path, frames=frames, latents=lat)
    print(f"wrote {out_path}")


def compare(cpu_path: str, tpu_path: str):
    cpu = np.load(cpu_path)
    tpu = np.load(tpu_path)
    f_cpu = cpu["frames"].astype(np.float64) / 255.0
    f_tpu = tpu["frames"].astype(np.float64) / 255.0
    assert f_cpu.shape == f_tpu.shape, (f_cpu.shape, f_tpu.shape)
    per_frame = []
    for i in range(f_cpu.shape[0]):
        mse = float(np.mean((f_cpu[i] - f_tpu[i]) ** 2))
        psnr = 10 * np.log10(1.0 / mse) if mse > 0 else float("inf")
        per_frame.append(psnr)
        print(f"frame {i}: PSNR {psnr:.2f} dB")
    lat_mse = float(np.mean((cpu["latents"] - tpu["latents"]) ** 2))
    lat_pow = float(np.mean(cpu["latents"] ** 2))
    print(f"latent NMSE {lat_mse / lat_pow:.3e} "
          f"({10 * np.log10(lat_pow / lat_mse):.1f} dB SNR)")
    print(f"RESULT midscale parity: mean {np.mean(per_frame):.2f} dB, "
          f"min {np.min(per_frame):.2f} dB over {len(per_frame)} frames "
          f"(config: 1.3B UNetMotion, 8f@256^2, 10 DDIM steps, CFG 7.5)")


if __name__ == "__main__":
    if sys.argv[1] == "compare":
        compare(sys.argv[2], sys.argv[3])
    else:
        run(sys.argv[1], sys.argv[2])
