"""PRNG helpers.

The reference seeds torch's Philox generator with seed 42
(reference experiments/01:103, 05:156). JAX uses threefry counter-based keys;
bit-identical noise to torch is impossible, so determinism parity is defined
as: same seed => same video, across runs and across process restarts
(SURVEY.md §2b). All sampling entry points take either an int seed or a
``jax.random.PRNGKey``.
"""

from __future__ import annotations

from typing import Sequence, Union

import jax
import jax.numpy as jnp

KeyLike = Union[int, jax.Array]


def as_key(seed: KeyLike) -> jax.Array:
    if isinstance(seed, int):
        return jax.random.PRNGKey(seed)
    return seed


def noise_for_shape(seed: KeyLike, shape: Sequence[int], dtype=jnp.float32) -> jax.Array:
    """Standard-normal latents for a given shape, deterministic in the seed."""
    return jax.random.normal(as_key(seed), tuple(shape), dtype=dtype)


def split_like(seed: KeyLike, n: int):
    return jax.random.split(as_key(seed), n)
