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
    """GIF export matching diffusers' export_to_gif defaults (8 fps, loop)."""
    pil = _as_pil(frames)
    path = Path(path)
    pil[0].save(
        path,
        save_all=True,
        append_images=pil[1:],
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
