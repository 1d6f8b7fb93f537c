"""Multi-host initialisation and failure handling.

The reference has no distributed backend at all (SURVEY.md §2d); the
TPU-native story is ``jax.distributed`` + XLA collectives over ICI/DCN. This
module is the fleet entrypoint:

  * :func:`initialize` — jax.distributed bring-up (no-op single-host)
  * :func:`health_check` — a tiny psum across all hosts with a timeout; the
    standard liveness probe before/after long runs
  * recovery model: crash -> re-exec -> :func:`initialize` -> resume from
    the config.json commit-markers (generation) and Orbax checkpoints
    (params). Matches the reference's skip-completed resume semantics
    (reference 05:213-216) extended to fleets: any host failure aborts the
    step cleanly (XLA collectives fail fast), the job restarts, completed
    experiments are skipped.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed bring-up. All args default from env (JAX conventions);
    silently a no-op for single-process runs."""
    if num_processes in (None, 1) and "JAX_COORDINATOR_ADDRESS" not in os.environ and coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def health_check() -> int:
    """All-host liveness probe: psum(1) over every device; returns the
    global device count. Raises (rather than hangs) on a dead host because
    the collective fails when the coordination service notices the loss."""
    import jax.numpy as jnp

    n = jax.device_count()
    ones = jax.pmap(lambda x: jax.lax.psum(x, "i"), axis_name="i")(
        jnp.ones((jax.local_device_count(),))
    )
    total = int(ones[0])
    assert total == n, (total, n)
    return total
