"""Console entry points (``pyproject.toml [project.scripts]``).

The reference drives everything through ``python experiments/NN_*.py``
(reference experiments/01_baseline_generation.py:130-147, 05:380-419) —
those CLIs still exist under ``experiments/`` for command-line parity.
This module adds the package-native commands an installed user gets
without a repo checkout:

    vdx generate  — one clip from a prompt (gif + per-frame PNGs)
    vdx train     — fine-tune the motion UNet (full or LoRA) on frame clips
    vdx serve     — the HTTP generation server
    vdx convert   — torch safetensors -> vdx Orbax checkpoint
    vdx analyze   — basic / comprehensive analysis over metric JSON
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path


def _build_pipeline(args):
    from vdx.core.dtypes import FP32_POLICY
    from vdx.pipelines import AnimateDiffPipeline, ContextConfig
    from vdx.pipelines.base import SkipConfig

    kwargs = {}
    if args.tiny:
        from vdx.models.clip_text import CLIPTextConfig
        from vdx.models.unet_motion import UNetMotionConfig
        from vdx.models.vae import VAEConfig

        kwargs = dict(unet_config=UNetMotionConfig.tiny(),
                      vae_config=VAEConfig.tiny(),
                      text_config=CLIPTextConfig.tiny(),
                      policy=FP32_POLICY)
    if args.skip > 0:
        kwargs["skip"] = SkipConfig(threshold=args.skip)
    if getattr(args, "freeu", False):
        from vdx.nn.freeu import FreeUConfig

        kwargs["freeu"] = FreeUConfig()
    if args.context > 0:
        kwargs["context"] = ContextConfig(
            frames=args.context, stride=max(args.context // 2, 1)
        )
    pipe = AnimateDiffPipeline.with_random_params(
        seed=0, scheduler=args.scheduler, **kwargs
    )
    if args.checkpoint:
        pipe.load_checkpoint(args.checkpoint)
    return pipe


def generate(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="vdx generate",
        description="Generate one video clip (gif + per-frame PNGs)")
    p.add_argument("prompt")
    p.add_argument("--negative-prompt",
                   default="bad quality, blurry, distorted")
    p.add_argument("--output", default="outputs/generate")
    p.add_argument("--checkpoint", help="Orbax dir from `vdx convert` "
                   "(random weights otherwise — no model hub in CI)")
    p.add_argument("--num-frames", type=int, default=16)
    p.add_argument("--steps", type=int, default=25)
    p.add_argument("--cfg", type=float, default=7.5)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--scheduler", default="ddim",
                   choices=["ddim", "euler", "dpm", "dpm_edm", "edm"])
    p.add_argument("--skip", type=float, default=0.0, metavar="THRESH",
                   help="adaptive step-skip turbo threshold (0 = off)")
    p.add_argument("--freeu", action="store_true",
                   help="FreeU backbone/skip re-weighting (published "
                        "SD-1.5 constants; quality knob, zero extra cost)")
    p.add_argument("--context", type=int, default=0, metavar="FRAMES",
                   help="temporal context window for long clips (0 = off)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny model configs (CPU smoke test)")
    args = p.parse_args(argv)

    from vdx.io.frames import export_to_gif, save_frames

    pipe = _build_pipeline(args)
    out = pipe(args.prompt, negative_prompt=args.negative_prompt,
               num_frames=args.num_frames, num_inference_steps=args.steps,
               guidance_scale=args.cfg, height=args.height, width=args.width,
               seed=args.seed, output_type="np")
    outdir = Path(args.output)
    outdir.mkdir(parents=True, exist_ok=True)
    export_to_gif(out.frames[0], outdir / "video.gif")
    save_frames(out.frames[0], outdir / "frames")
    print(f"wrote {outdir}/video.gif + {args.num_frames} frames")
    return 0


def serve(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="vdx serve", description="HTTP generation server "
        "(POST /generate, /img2vid, /jobs; GET /health)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--checkpoint")
    p.add_argument("--scheduler", default="ddim")
    p.add_argument("--skip", type=float, default=0.0)
    p.add_argument("--freeu", action="store_true")
    p.add_argument("--context", type=int, default=0)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--batch-window-ms", type=float, default=0.0,
                   help=">0 enables request micro-batching")
    args = p.parse_args(argv)

    from vdx.serving.server import (
        BatchingGenerationService, GenerationServer, GenerationService,
    )

    pipe = _build_pipeline(args)
    svc = (BatchingGenerationService(
               pipe, batch_window_s=args.batch_window_ms / 1e3)
           if args.batch_window_ms > 0 else GenerationService(pipe))
    server = GenerationServer(svc, host=args.host, port=args.port)
    server.start()
    print(f"serving on http://{args.host}:{server.port}")
    try:
        import threading

        threading.Event().wait()
    except KeyboardInterrupt:
        server.stop()
    return 0


def train(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="vdx train",
        description="Fine-tune the motion UNet (eps-prediction DDPM "
        "objective) on a folder of frame clips; full or LoRA")
    p.add_argument("--data", required=True,
                   help="root dir: one subdir of frame PNGs per video")
    p.add_argument("--prompt", default="a video",
                   help="caption used as conditioning for every clip")
    p.add_argument("--out", default="outputs/train",
                   help="output dir (Orbax checkpoint, or LoRA adapter)")
    p.add_argument("--checkpoint", help="starting Orbax checkpoint "
                   "(random init otherwise)")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--clip-frames", type=int, default=16)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--warmup", type=int, default=10)
    p.add_argument("--accum", type=int, default=1,
                   help="gradient-accumulation micro-batches")
    p.add_argument("--remat", action="store_true",
                   help="rematerialise the forward (activation memory "
                   "stops scaling with depth — the 1.3B-on-one-chip lever)")
    p.add_argument("--ema", type=float, default=0.0,
                   help=">0 keeps an EMA param tree (saved as ema/)")
    p.add_argument("--lora", type=int, default=0, metavar="RANK",
                   help=">0 trains a rank-R LoRA adapter instead of the "
                   "full UNet")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from vdx.data.loader import (
        FrameFolderDataset, VideoClipLoader, encode_clips_to_latents,
        prefetch_to_device,
    )
    from vdx.parallel.train import (
        init_train_state, make_lora_train_step, make_optimizer,
        make_train_step,
    )

    args.scheduler, args.skip, args.context = "ddim", 0.0, 0
    pipe = _build_pipeline(args)
    # conditioning: the cond row of the CFG pair (uncond x B, cond x B)
    ctx1 = pipe.encode_prompt(args.prompt)[1:]
    ctx = jnp.broadcast_to(ctx1, (args.batch,) + ctx1.shape[1:])

    ds = FrameFolderDataset(args.data, clip_frames=args.clip_frames,
                            size=(args.size, args.size))
    loader = VideoClipLoader(ds, batch_size=args.batch, seed=args.seed)
    print(f"dataset: {len(ds)} videos, {ds.num_clips()} clips")

    opt = make_optimizer(args.lr, warmup_steps=args.warmup,
                         total_steps=args.steps)
    model, uparams = pipe.unet, pipe.params["unet"]
    if args.lora > 0:
        from vdx.core.lora import init_lora

        adapter = init_lora(uparams, rank=args.lora,
                            seed=args.seed)
        state, opt = init_train_state(model, adapter, optimizer=opt)
        step = jax.jit(make_lora_train_step(model, opt))
        step_args = lambda s, b, r: (s, b, r, uparams)  # noqa: E731
    else:
        state, opt = init_train_state(model, uparams, optimizer=opt,
                                      ema=args.ema > 0)
        step = jax.jit(make_train_step(
            model, opt, remat=args.remat, grad_accum=args.accum,
            ema_decay=args.ema if args.ema > 0 else None,
        ))
        step_args = lambda s, b, r: (s, b, r)  # noqa: E731

    def batches():
        it = iter(loader)
        while True:
            try:
                b = next(it)
            except StopIteration:
                it = iter(loader)
                b = next(it)
            lat = encode_clips_to_latents(
                pipe.vae, pipe.params["vae"], b["pixels"])
            yield {"latents": lat, "context": ctx}

    key = jax.random.PRNGKey(args.seed)
    src = prefetch_to_device(batches())
    last = None
    for i in range(args.steps):
        key, sub = jax.random.split(key)
        state, metrics = step(*step_args(state, next(src), sub))
        if i % args.log_every == 0 or i == args.steps - 1:
            last = float(metrics["loss"])
            print(f"step {i}: loss {last:.4f}", flush=True)

    outdir = Path(args.out)
    outdir.mkdir(parents=True, exist_ok=True)
    from vdx.core.checkpoint import save_params

    if args.lora > 0:
        save_lora_dir = (outdir / "lora").resolve()
        save_params(state.params, save_lora_dir)
        print(f"wrote LoRA adapter -> {save_lora_dir}")
    else:
        pipe.params["unet"] = state.params
        pipe.save_checkpoint((outdir / "checkpoint").resolve())
        if state.ema_params is not None:
            save_params({"unet": state.ema_params},
                        (outdir / "ema").resolve())
        print(f"wrote checkpoint -> {outdir / 'checkpoint'}")
    print(f"final loss {last:.4f}")
    return 0


def convert(argv=None) -> int:
    # the conversion CLI lives in scripts/convert_checkpoint.py for repo
    # use; resolve it relative to the repo root when importable, else the
    # installed copy under sys.prefix
    repo = Path(__file__).resolve().parents[1]
    sys.path.insert(0, str(repo))
    from scripts.convert_checkpoint import main as convert_main

    return convert_main(argv)


def analyze(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="vdx analyze",
        description="Grid-search analysis (reference experiments 07/08)")
    p.add_argument("--comprehensive", action="store_true")
    args, rest = p.parse_known_args(argv)
    if args.comprehensive:
        from vdx.analysis.comprehensive import main as m
    else:
        from vdx.analysis.basic import main as m
    m(rest)
    return 0


_COMMANDS = {
    "generate": generate,
    "train": train,
    "serve": serve,
    "convert": convert,
    "analyze": analyze,
}


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        print("commands:", ", ".join(sorted(_COMMANDS)))
        return 0
    cmd = argv[0]
    if cmd not in _COMMANDS:
        print(f"unknown command {cmd!r}; one of {sorted(_COMMANDS)}",
              file=sys.stderr)
        return 2
    return _COMMANDS[cmd](argv[1:]) or 0


if __name__ == "__main__":
    raise SystemExit(main())
