"""Training data pipeline: video clips -> batched device arrays.

The reference never trains (inference-only harness, SURVEY.md §2d); the
training entry point (parallel/train.py) needs a production loader. Design
is TPU-shaped:

  * host-side decode (PIL) + resize in a background thread pool — the TPU
    never waits on PNG decode;
  * clips batched to STATIC shapes [B, F, H, W, 3] float32 in [-1, 1]
    (XLA recompiles on any shape change — the loader enforces one shape);
  * ``prefetch_to_device`` double-buffers batches onto the chip (or mesh)
    so H2D overlaps the train step — the JAX analogue of the torch
    DataLoader's pinned-memory prefetch;
  * optional on-device VAE encoding folds pixels -> latents into one jit.

The on-disk layout it reads is the framework's own artifact contract
(``{experiment}/frames/frame_###.png`` — reference 05:172-188), so every
generated grid doubles as training data.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Iterator, List, Optional, Sequence

import numpy as np


class FrameFolderDataset:
    """Clips from directories of PNG frames.

    Every subdirectory of ``root`` containing a ``frames/`` folder (the
    grid-search artifact layout) — or itself containing ``frame_*.png`` —
    is one video; clips of ``clip_frames`` consecutive frames are sampled.
    """

    def __init__(self, root, clip_frames: int = 8, size: Optional[tuple] = None):
        self.root = Path(root)
        self.clip_frames = clip_frames
        self.size = size  # (H, W) resize, None keeps native
        self.videos: List[List[Path]] = []
        for d in sorted(self.root.iterdir()) if self.root.is_dir() else []:
            fdir = d / "frames" if (d / "frames").is_dir() else d
            if fdir.is_dir():
                frames = sorted(fdir.glob("frame_*.png")) or sorted(
                    fdir.glob("*.png"))
                if len(frames) >= clip_frames:
                    self.videos.append(frames)

    def __len__(self) -> int:
        return len(self.videos)

    def num_clips(self) -> int:
        return sum(len(v) - self.clip_frames + 1 for v in self.videos)

    def load_clip(self, video_idx: int, start: int) -> np.ndarray:
        """-> [F, H, W, 3] float32 in [-1, 1]."""
        from PIL import Image

        frames = []
        for p in self.videos[video_idx][start:start + self.clip_frames]:
            img = Image.open(p).convert("RGB")
            if self.size is not None:
                img = img.resize((self.size[1], self.size[0]), Image.BILINEAR)
            frames.append(np.asarray(img, np.float32) / 127.5 - 1.0)
        return np.stack(frames)


class VideoClipLoader:
    """Shuffled, batched, background-decoded clip iterator.

    Yields {"pixels": [B, F, H, W, 3] float32} with deterministic
    seed-driven shuffling; decode runs on a thread pool so the consumer
    (the train step) overlaps IO.
    """

    def __init__(
        self,
        dataset: FrameFolderDataset,
        batch_size: int,
        seed: int = 0,
        drop_last: bool = True,
        num_workers: int = 2,
    ):
        assert len(dataset) > 0, "empty dataset"
        self.dataset = dataset
        self.batch_size = batch_size
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = num_workers

    def _index(self) -> List[tuple]:
        out = []
        for vi, frames in enumerate(self.dataset.videos):
            for s in range(len(frames) - self.dataset.clip_frames + 1):
                out.append((vi, s))
        return out

    def __iter__(self) -> Iterator[dict]:
        idx = self._index()
        rng = np.random.default_rng(self.seed)
        order = rng.permutation(len(idx))
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            for start in range(0, len(order), self.batch_size):
                sel = order[start:start + self.batch_size]
                if len(sel) < self.batch_size and self.drop_last:
                    return
                clips = list(pool.map(
                    lambda i: self.dataset.load_clip(*idx[i]), sel))
                yield {"pixels": np.stack(clips)}


def prefetch_to_device(iterator, size: int = 2, sharding=None):
    """Double-buffered host->device transfer running ahead of the consumer.

    ``sharding`` places batches straight onto a mesh (NamedSharding) so the
    train step never sees host arrays.
    """
    import jax

    q: "queue.Queue" = queue.Queue(maxsize=size)
    _END = object()

    def put(batch):
        if sharding is not None:
            return {k: jax.device_put(v, sharding) for k, v in batch.items()}
        return {k: jax.device_put(v) for k, v in batch.items()}

    def producer():
        try:
            for batch in iterator:
                q.put(put(batch))
        finally:
            q.put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        yield item


def encode_clips_to_latents(vae, vae_params, pixels, rng=None):
    """[B, F, H, W, 3] pixels -> [B, F, h, w, 4] pre-scaled latents, one jit.

    Folds frames into batch for the spatial encoder and restores the video
    layout — the training-side analogue of the pipelines' decode tiling.
    """
    import jax
    import jax.numpy as jnp

    B, F = pixels.shape[:2]
    flat = jnp.reshape(jnp.asarray(pixels), (B * F,) + pixels.shape[2:])
    lat = vae.apply(vae_params, flat, rng, method=vae.encode)
    return jnp.reshape(lat, (B, F) + lat.shape[1:])
