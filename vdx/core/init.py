"""Host-side fast parameter initialisation.

``model.init`` JIT-compiles the full init graph — minutes for 1B+ params on
remote-compile TPU backends (PERF.md methodology) and tens of seconds even
for tiny configs on one CPU core. ``fast_init`` replaces it everywhere exact
flax initializer distributions don't matter (benchmarks, driver contract,
tests): ``jax.eval_shape`` traces the init without compiling, and leaves are
built host-side with numpy — fan-in-scaled normals for weights, ones for
scale-like leaves, zeros for the rest — the same recipe as the pipelines'
``init_params`` fast path (pipelines/base.py:149).

reference experiments/01_baseline_generation.py:55-73 loads checkpoints
instead; random-init paths exist only on our side, so no parity contract
applies to these values.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def build_leaves(shapes, seed: int = 0, scale: float | None = None):
    """Fill an eval_shape tree with host-built numpy leaves.

    scale=None uses fan-in scaling (activations O(1) end to end);
    a float uses ``normal * scale`` for every >=2D leaf.
    """
    rng = np.random.default_rng(seed)
    flat, treedef = jax.tree_util.tree_flatten_with_path(shapes)
    out = []
    for path, leaf in flat:
        name = str(getattr(path[-1], "key", path[-1])).lower()
        if len(leaf.shape) >= 2:
            s = (1.0 / max(int(np.prod(leaf.shape[:-1])), 1)) ** 0.5 \
                if scale is None else scale
            a = rng.standard_normal(leaf.shape) * s
        elif "scale" in name:
            a = np.ones(leaf.shape)
        else:
            a = np.zeros(leaf.shape)
        out.append(jnp.asarray(a.astype(np.float32), dtype=leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, out)


def fast_init(model, *args, seed: int = 0, scale: float | None = None):
    """Drop-in replacement for ``model.init(PRNGKey(seed), *args)`` that
    never compiles: eval_shape trace + host-side numpy leaves.

    Non-array args (e.g. a static ``num_frames`` int) are closed over so
    eval_shape doesn't abstract them."""
    static = {i: a for i, a in enumerate(args) if not hasattr(a, "shape")}
    dyn = [a for i, a in enumerate(args) if i not in static]

    def init_fn(key, *d):
        it = iter(d)
        full = [static[i] if i in static else next(it) for i in range(len(args))]
        return model.init(key, *full)

    shapes = jax.eval_shape(init_fn, jax.random.PRNGKey(seed), *dyn)
    return build_leaves(shapes, seed=seed, scale=scale)
