"""Persistent XLA compilation cache.

The reference amortises compiles by staying in one torch process
(reference experiments/05_grid_search_ablation.py:121-147 loads the pipeline
once for all 78 experiments). Under XLA each (shape, step-count) program is
a fresh compile per process — 220-530 s for the denoise scan through the
remote-compile tunnel (PERF.md) — so cross-process amortisation needs the
persistent compilation cache: compiled executables keyed by HLO hash, stored
on local disk, hit on every later process with the same program.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/vdx/xla")
_enabled = False


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Idempotently enable the persistent compilation cache. Returns the dir.

    Safe to call any time (before or after backend init); cached entries are
    written for compiles taking >1 s and read back in any later process.
    """
    global _enabled
    import jax

    path = cache_dir or os.environ.get("VDX_COMPILATION_CACHE", _DEFAULT_DIR)
    if _enabled and jax.config.jax_compilation_cache_dir == path:
        return path
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # cache everything regardless of entry size
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _enabled = True
    return path
