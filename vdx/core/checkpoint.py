"""Checkpoint save/load — Orbax-backed param persistence.

The reference's "model checkpoints" are HF-hub downloads cached by
from_pretrained (SURVEY.md §5 checkpoint/resume); here converted/trained
param trees persist through Orbax (the TPU-native checkpointing stack:
async, sharding-aware, multi-host safe). Experiment-level resume stays the
config.json commit-marker contract (vdx/harness/grid.py) — the two layers
are deliberately independent, like the reference's.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import jax


def save_params(params: Any, path: str | Path) -> Path:
    """Synchronously save a param pytree to ``path`` (a directory)."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, params, force=True)
    ckpt.wait_until_finished()
    return path


def load_params(path: str | Path, template: Optional[Any] = None) -> Any:
    """Load a param pytree; ``template`` (e.g. from jax.eval_shape) restores
    with correct dtypes/shardings."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    ckpt = ocp.StandardCheckpointer()
    if template is not None:
        template = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), template
        )
        return ckpt.restore(path, template)
    return ckpt.restore(path)
