"""Backend capability probes.

The build environment reaches its TPU through a remote-dispatch PJRT
plugin ("axon") that does not implement every host-interaction feature of
a local backend. Capability checks live here so features can degrade
gracefully instead of failing at run time.
"""

import os


def host_callbacks_supported() -> bool:
    """Whether the active backend can run host send/recv callbacks
    (``jax.debug.callback`` / ``io_callback`` / ``pure_callback``).

    The axon remote-dispatch PJRT rejects them at execution time
    (``UNIMPLEMENTED: axon_pjrt does not support host send/recv
    callbacks`` — measured, PERF.md round-3 cont.). CPU and standard
    local TPU backends support them. The axon plugin only activates when
    ``PALLAS_AXON_POOL_IPS`` is set and jax resolved to a non-CPU
    backend, which is what this probes.
    """
    import jax

    if jax.default_backend() == "cpu":
        return True
    return "PALLAS_AXON_POOL_IPS" not in os.environ
