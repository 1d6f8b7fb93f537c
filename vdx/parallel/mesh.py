"""Device mesh and sharding rules.

The reference is single-GPU with zero distributed backend (SURVEY.md §2d);
scaling here is TPU-native from the start: a ``jax.sharding.Mesh`` with axes

  * ``data``   — batch / independent experiments (DP; the grid search's
                 embarrassingly-parallel outer loop, reference 05:316-334)
  * ``frames`` — the temporal axis (SP; the motion module is the only
                 cross-frame op, reference 03:266-275, so only it communicates)
  * ``tensor`` — attention heads / MLP hidden (TP) for the 1.3B UNet

XLA inserts the collectives (all-gather/reduce-scatter over ICI) from the
shardings; no NCCL-style transport layer exists or is needed.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("data", "frames", "tensor")


def make_mesh(
    data: int = 1, frames: int = 1, tensor: int = 1, devices=None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = data * frames * tensor
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    grid = np.asarray(devices[:n]).reshape(data, frames, tensor)
    return Mesh(grid, AXES)


def auto_mesh(n_devices: Optional[int] = None) -> Mesh:
    """Default layout for n chips: favour data, then frames, then tensor."""
    n = n_devices or len(jax.devices())
    data = frames = tensor = 1
    if n % 2 == 0 and n >= 8:
        data, frames, tensor = n // 4, 2, 2
    elif n % 2 == 0 and n >= 4:
        data, frames, tensor = n // 2, 2, 1
    else:
        data = n
    return make_mesh(data, frames, tensor)


# Megatron-style paired split (attention + MLP): the producer of the inner
# activation splits its OUTPUT axis (column), the consumer splits its INPUT
# axis (row) — the inner activation then lives sharded with no collective
# between the pair; XLA inserts one reduce at the row-split output.
_COL_SPLIT = ("to_q", "to_k", "to_v", "net_0", "fc1", "q_proj", "k_proj",
              "v_proj", "ff_in")
_ROW_SPLIT = ("to_out", "net_2", "fc2", "out_proj", "ff_out")


def param_sharding_rules(params, mesh: Mesh, min_size: int = 2**16):
    """Tensor-parallel shardings for a pytree of params.

    Column/row paired split over attention qkv/out and MLP in/out (module
    names above); any other large >=2D kernel splits its output (last)
    axis. Column-split biases shard with their kernels. XLA's SPMD
    partitioner propagates the activation shardings and inserts the
    collectives; numerical parity with the replicated model is tested
    (tests/test_mesh_extra.py).
    """
    tensor_size = mesh.shape["tensor"]

    def rule(path, x):
        if tensor_size <= 1 or not hasattr(x, "ndim"):
            return NamedSharding(mesh, P())
        names = [str(getattr(p, "key", p)) for p in path]
        col = any(n in _COL_SPLIT for n in names)
        row = any(n in _ROW_SPLIT for n in names)
        if (
            x.ndim >= 2
            and x.size >= min_size
            and row
            and names[-1] == "kernel"
            and x.shape[-2] % tensor_size == 0
        ):
            spec = [None] * x.ndim
            spec[-2] = "tensor"
            return NamedSharding(mesh, P(*spec))
        if x.ndim >= 2 and x.size >= min_size and x.shape[-1] % tensor_size == 0:
            spec = [None] * (x.ndim - 1) + ["tensor"]
            return NamedSharding(mesh, P(*spec))
        if (
            x.ndim == 1
            and col
            and names[-1] == "bias"
            and x.shape[0] % tensor_size == 0
            and x.size >= tensor_size
        ):
            return NamedSharding(mesh, P("tensor"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def video_sharding(mesh: Mesh) -> NamedSharding:
    """[B, F, H, W, C] latents: batch over data, frames over frames."""
    return NamedSharding(mesh, P("data", "frames"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
