"""ForwardTracer — model introspection via Flax method interception.

Capability-parity rebuild of the reference's hook-based tracer
(reference utils/forward_tracer.py:25-383): records per-module input/output
shapes & dtypes, parameter counts, execution order, optional output capture;
depth and predicate filtering; text report, dict export and shape-change
scan; plus an attention-only subclass.

Where torch uses ``register_forward_hook`` (utils/forward_tracer.py:177-194),
the JAX-native mechanism is ``flax.linen.intercept_methods``: every bound
``__call__`` flows through the interceptor, giving the same visibility
without mutating the model. Works under ``jit`` tracing too (shapes come
from tracers' avals).

For wall-clock profiling (absent in the reference) see profile_trace below —
jax.profiler xplane traces.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional

import flax.linen as nn
import jax
import numpy as np


def _shape_of(x) -> Optional[tuple]:
    return tuple(x.shape) if hasattr(x, "shape") else None


def _dtype_of(x) -> Optional[str]:
    return str(x.dtype) if hasattr(x, "dtype") else None


def _flatten_arrays(tree) -> List[Any]:
    return [x for x in jax.tree.leaves(tree) if hasattr(x, "shape")]


@dataclasses.dataclass
class ModuleTrace:
    """One module invocation record (reference utils/forward_tracer.py:25-37)."""

    name: str
    class_name: str
    input_shapes: List[tuple]
    output_shapes: List[tuple]
    input_dtypes: List[str]
    output_dtypes: List[str]
    param_count: int
    execution_order: int
    output: Optional[Any] = None


class ForwardTracer:
    """Trace a Flax module's forward pass.

    Args:
        model: a Flax linen Module.
        trace_depth: max module-path depth to record (None = all).
        filter_fn: predicate(path_name, module) -> bool to select modules.
        capture_tensors: keep module outputs (memory-heavy).
    """

    def __init__(
        self,
        model: nn.Module,
        trace_depth: Optional[int] = None,
        filter_fn: Optional[Callable[[str, nn.Module], bool]] = None,
        capture_tensors: bool = False,
    ):
        self.model = model
        self.trace_depth = trace_depth
        self.filter_fn = filter_fn
        self.capture_tensors = capture_tensors
        self.traces: Dict[str, ModuleTrace] = {}
        self.execution_order: List[str] = []

    # ------------------------------------------------------------------
    def _interceptor(self, next_fn, args, kwargs, context):
        module = context.module
        path = "/".join(str(p) for p in module.path) if module.path else "(root)"
        out = next_fn(*args, **kwargs)

        if context.method_name != "__call__":
            return out
        if self.trace_depth is not None and len(module.path) > self.trace_depth:
            return out
        if self.filter_fn is not None and not self.filter_fn(path, module):
            return out

        in_arrays = _flatten_arrays(args)
        out_arrays = _flatten_arrays(out)
        try:
            pcount = sum(
                int(np.prod(v.shape))
                for v in jax.tree.leaves(module.variables.get("params", {}))
                if hasattr(v, "shape")
            )
        except Exception:
            pcount = 0

        self.traces[path] = ModuleTrace(
            name=path,
            class_name=type(module).__name__,
            input_shapes=[_shape_of(a) for a in in_arrays],
            output_shapes=[_shape_of(a) for a in out_arrays],
            input_dtypes=[_dtype_of(a) for a in in_arrays],
            output_dtypes=[_dtype_of(a) for a in out_arrays],
            param_count=pcount,
            execution_order=len(self.execution_order),
            output=out if self.capture_tensors else None,
        )
        self.execution_order.append(path)
        return out

    def trace(self, params, *args, method=None, **kwargs):
        """Run model.apply under interception; returns the model output."""
        self.traces.clear()
        self.execution_order.clear()
        with nn.intercept_methods(self._interceptor):
            return self.model.apply(params, *args, method=method, **kwargs)

    # ------------------------------------------------------------------
    # Reports (formats mirror reference utils/forward_tracer.py:214-334)
    # ------------------------------------------------------------------
    def summary_lines(self) -> List[str]:
        lines = [
            f"Forward trace: {type(self.model).__name__}",
            f"Modules traced: {len(self.traces)}",
            "-" * 80,
        ]
        for name in self.execution_order:
            t = self.traces[name]
            lines.append(
                f"{t.execution_order:4d}. {t.class_name:<26} {name:<50} "
                f"in={t.input_shapes} out={t.output_shapes} params={t.param_count:,}"
            )
        return lines

    def print_summary(self) -> None:
        print("\n".join(self.summary_lines()))

    def find_shape_changes(self) -> List[str]:
        """Modules whose (first) output shape differs from input shape."""
        out = []
        for name in self.execution_order:
            t = self.traces[name]
            if t.input_shapes and t.output_shapes and t.input_shapes[0] != t.output_shapes[0]:
                out.append(name)
        return out

    def save_report(self, path) -> Path:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text("\n".join(self.summary_lines()) + "\n")
        return path

    def to_dict(self) -> Dict:
        return {
            "model": type(self.model).__name__,
            "num_modules": len(self.traces),
            "execution_order": list(self.execution_order),
            "traces": {
                k: {
                    f.name: getattr(t, f.name)
                    for f in dataclasses.fields(ModuleTrace)
                    if f.name != "output"
                }
                for k, t in self.traces.items()
            },
        }

    def save_json(self, path) -> Path:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(json.dumps(self.to_dict(), indent=2, default=str))
        return path


class AttentionTracer(ForwardTracer):
    """Attention-only tracer (reference utils/forward_tracer.py:370-383)."""

    def __init__(self, model: nn.Module, **kwargs):
        kwargs.setdefault(
            "filter_fn",
            lambda path, module: "attn" in path.lower()
            or "attention" in type(module).__name__.lower(),
        )
        super().__init__(model, **kwargs)


def trace_model(model: nn.Module, params, *args, **kwargs) -> ForwardTracer:
    """One-shot convenience (reference utils/forward_tracer.py:341-363)."""
    tracer = ForwardTracer(model)
    tracer.trace(params, *args, **kwargs)
    return tracer


def print_model_flow(model: nn.Module, params, *args, **kwargs) -> None:
    trace_model(model, params, *args, **kwargs).print_summary()


def profile_trace(fn, *args, log_dir: str = "/tmp/vdx_profile"):
    """Wall-clock profiling via jax.profiler (xplane traces for Perfetto/XProf).

    The timing capability the reference lacks (SURVEY.md §5 tracing).
    """
    with jax.profiler.trace(log_dir):
        out = fn(*args)
        jax.block_until_ready(out)
    return out, log_dir
