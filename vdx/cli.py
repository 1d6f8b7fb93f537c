"""Console entry points (``pyproject.toml [project.scripts]``).

The reference drives everything through ``python experiments/NN_*.py``
(reference experiments/01_baseline_generation.py:130-147, 05:380-419) —
those CLIs still exist under ``experiments/`` for command-line parity.
This module adds the package-native commands an installed user gets
without a repo checkout:

    vdx generate  — one clip from a prompt (gif + per-frame PNGs)
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
