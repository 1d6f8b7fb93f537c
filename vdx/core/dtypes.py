"""Dtype policy for TPU execution.

The reference runs fp16 end-to-end on CUDA (experiments/01:21, 05:35 in the
reference tree). On TPU the native fast dtype is bfloat16: same exponent range
as fp32, so no loss-scaling machinery is needed. Policy:

  * params     — stored fp32 (master copy), cast to ``compute`` at use
  * compute    — bf16 for all matmul/conv (MXU native), fp32 accumulation via
                 ``preferred_element_type``
  * norms/softmax — computed in fp32 for stability, cast back
  * scheduler math — always fp32 (tiny, precision-critical)
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    """Mixed-precision policy threaded through every module."""

    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    norm_dtype: jnp.dtype = jnp.float32
    output_dtype: jnp.dtype = jnp.float32

    def cast_to_compute(self, *xs):
        out = tuple(x.astype(self.compute_dtype) if x is not None else None for x in xs)
        return out if len(out) > 1 else out[0]

    def cast_to_norm(self, x):
        return x.astype(self.norm_dtype)

    def cast_to_output(self, x):
        return x.astype(self.output_dtype)


DEFAULT_POLICY = Policy()
# Full-fp32 policy: used for CPU parity/golden tests where bf16 rounding would
# swamp the comparison tolerance.
FP32_POLICY = Policy(compute_dtype=jnp.float32)
