"""LoRA adapters — low-rank weight deltas on attention projections.

The capability analogue of diffusers' ``load_lora_weights`` surface on the
pipeline family the reference instantiates (AnimateDiff motion LoRAs are
the standard ecosystem add-on to the pipeline loaded at reference
experiments/01_baseline_generation.py:55-73; the reference repo itself
never loads one, so this is surface parity with the pipeline class, not
with a reference call site).

TPU-first design: LoRA is a *weight-space* transform here, not a runtime
module graph change. ``merge_lora(params, lora, scale)`` produces a new
param tree with ``W' = W + scale * (a @ b)`` on every adapted kernel —
computed fp32, cast back to the param dtype — in ONE jittable program.
Because every compiled pipeline program takes params as runtime arguments
(pipelines/base.py), loading/unloading/rescaling a LoRA never recompiles
anything and adds ZERO per-step cost: the denoise program is byte-identical,
only the param values change. (Contrast with the torch approach of patching
``forward`` with per-layer ``x @ A @ B`` adds — that shape of graph change
would invalidate the cached executables and leave small matmuls unfused.)

Representation: a FLAT dict ``{param_path: {"a": [in, r], "b": [r, out]}}``
keyed by the same slash paths ``core.convert.flatten_params`` produces, so
conversion rules, checkpoint IO (core/checkpoint.py works on any pytree)
and optax all operate on it directly.

Training: ``parallel.train.make_lora_train_step`` differentiates through
the merge w.r.t. the adapter only — the base tree is a plain runtime
argument that AD never touches, which is exactly LoRA's memory story
(optimizer state over ~0.1% of the params).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

#: attention projections — the standard LoRA target set (q/k/v/out), and
#: what AnimateDiff motion-LoRA checkpoints adapt.
DEFAULT_TARGETS: Tuple[str, ...] = (
    "to_q/kernel", "to_k/kernel", "to_v/kernel", "to_out/kernel",
)


def _leaf_paths(params) -> Dict[str, int]:
    """{slash path (params-root stripped): flat leaf index}."""
    leaves, _ = jax.tree_util.tree_flatten_with_path(params)
    idx = {}
    for i, (path, _leaf) in enumerate(leaves):
        keys = [str(getattr(k, "key", getattr(k, "idx", k))) for k in path]
        if keys and keys[0] == "params":
            keys = keys[1:]
        idx["/".join(keys)] = i
    return idx


def target_paths(
    params, targets: Sequence[str] = DEFAULT_TARGETS
) -> "list[str]":
    """All 2-D kernel paths in ``params`` matching one of ``targets``
    (suffix match on the slash path)."""
    leaves, _ = jax.tree_util.tree_flatten_with_path(params)
    flat_leaves = [leaf for _, leaf in leaves]
    out = []
    for path, i in sorted(_leaf_paths(params).items()):
        leaf = flat_leaves[i]
        if len(leaf.shape) == 2 and any(path.endswith(t) for t in targets):
            out.append(path)
    return out


def init_lora(
    params,
    rank: int = 4,
    targets: Sequence[str] = DEFAULT_TARGETS,
    seed: int = 0,
    dtype=jnp.float32,
) -> dict:
    """Fresh adapter over ``params``: ``a ~ N(0, 1/d_in)`` (host numpy,
    adapters are tiny), ``b = 0`` — so a freshly-initialised LoRA is an
    exact no-op until trained (the standard init)."""
    paths = target_paths(params, targets)
    if not paths:
        raise ValueError(f"no 2-D kernels match targets {tuple(targets)}")
    leaves, _ = jax.tree_util.tree_flatten_with_path(params)
    flat = {p: leaves[i][1] for p, i in _leaf_paths(params).items()}
    rng = np.random.default_rng(seed)
    tree = {}
    for p in paths:
        d_in, d_out = flat[p].shape
        a = rng.standard_normal((d_in, rank), dtype=np.float32)
        a *= (1.0 / d_in) ** 0.5
        tree[p] = {
            "a": jnp.asarray(a, dtype),
            "b": jnp.zeros((rank, d_out), dtype),
        }
    return tree


def merge_lora(params, lora: dict, scale=1.0):
    """``W' = W + scale * (a @ b)`` on every adapted leaf; fp32 math, cast
    back to each leaf's dtype. Pure and trace-compatible: jit it once and
    every load/rescale is one device program (tunnel-friendly), or call it
    inside a loss to differentiate w.r.t. ``lora`` (training).

    Returns a tree with the EXACT structure of ``params`` (any pytree —
    the leading ``params`` collection root, if present, is transparent)."""
    leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    idx = _leaf_paths(params)
    out = [leaf for _, leaf in leaves]
    scale = jnp.float32(scale)
    for p, site in lora.items():
        if p not in idx:
            raise KeyError(
                f"LoRA site {p!r} has no matching param leaf "
                f"(adapter built for a different architecture?)"
            )
        W = out[idx[p]]
        if W.shape != (site["a"].shape[0], site["b"].shape[1]):
            raise ValueError(
                f"LoRA site {p!r}: delta shape "
                f"{(site['a'].shape[0], site['b'].shape[1])} != kernel "
                f"shape {tuple(W.shape)}"
            )
        delta = site["a"].astype(jnp.float32) @ site["b"].astype(jnp.float32)
        out[idx[p]] = (W.astype(jnp.float32) + scale * delta).astype(W.dtype)
    return jax.tree_util.tree_unflatten(treedef, out)


# ----------------------------------------------------------------------
# Torch LoRA checkpoint conversion (target-driven, like core/convert.py)
# ----------------------------------------------------------------------

_LORA_KEY_MARKERS = (
    "lora_A", "lora_B", "lora_down", "lora_up", "lora.down", "lora.up",
    "_lora.down", "_lora.up",
)


def is_lora_state_dict(sd: dict) -> bool:
    """True when ``sd`` looks like a torch LoRA checkpoint (any format)."""
    return isinstance(sd, dict) and any(
        isinstance(k, str) and any(m in k for m in _LORA_KEY_MARKERS)
        for k in sd
    )


def _strip_prefix(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Drop a uniform ``unet.`` key prefix (diffusers saves pipeline-level
    LoRA dicts namespaced by component)."""
    if sd and all(k.startswith("unet.") for k in sd):
        return {k[len("unet."):]: v for k, v in sd.items()}
    return sd


def _processor_stem(stem: str) -> Optional[str]:
    """Old diffusers attn-processor form: ``...attn1.to_q`` ->
    ``...attn1.processor.to_q_lora`` (to_out.0 -> to_out_lora)."""
    for proj in ("to_q", "to_k", "to_v", "to_out.0"):
        suffix = "." + proj
        if stem.endswith(suffix):
            parent = stem[: -len(suffix)]
            name = proj.split(".")[0]
            return f"{parent}.processor.{name}_lora"
    return None


def _candidate_keys(base_hf_key: str):
    """(A-key, B-key, alpha-key) candidates for one adapted site, derived
    from the BASE weight's hf key — peft (lora_A/lora_B), old diffusers
    attn-processor (.processor.to_q_lora.down/up), and kohya
    (lora_unet_<mangled>.lora_down/up + .alpha) formats."""
    assert base_hf_key.endswith(".weight"), base_hf_key
    stem = base_hf_key[: -len(".weight")]
    cands = [
        (f"{stem}.lora_A.weight", f"{stem}.lora_B.weight", None),
        (f"{stem}.lora_A.default.weight", f"{stem}.lora_B.default.weight",
         None),
        (f"{stem}.lora.down.weight", f"{stem}.lora.up.weight", None),
    ]
    proc = _processor_stem(stem)
    if proc is not None:
        cands.append((f"{proc}.down.weight", f"{proc}.up.weight", None))
    mangled = "lora_unet_" + stem.replace(".", "_")
    cands.append((
        f"{mangled}.lora_down.weight",
        f"{mangled}.lora_up.weight",
        f"{mangled}.alpha",
    ))
    return cands


def convert_lora_checkpoint(
    state_dict: Dict[str, np.ndarray],
    template_params,
    base_rules: Dict[str, Tuple[str, "object"]],
    targets: Sequence[str] = DEFAULT_TARGETS,
    strict: bool = True,
) -> Tuple[dict, dict]:
    """Torch LoRA state dict -> our flat adapter tree.

    Target-driven like ``convert_checkpoint``: walks OUR target kernel
    paths, derives each site's torch LoRA keys from the BASE rules'
    ``hf_key`` (so every naming convention the base rules encode — motion
    modules included — is covered automatically), and converts

        a = A^T * (alpha / r)      # torch A: [r, in]  -> [in, r]
        b = B^T                    # torch B: [out, r] -> [r, out]

    which makes ``merge_lora(..., scale=1.0)`` match torch's
    ``W + (alpha/r) * B @ A`` exactly (flax kernels are [in, out]).
    Sites with no matching keys are skipped (LoRA checkpoints adapt
    subsets — e.g. motion-only adapters). strict=True additionally
    requires every LoRA-looking checkpoint key to be consumed, the
    loud-failure contract of core/convert.py.

    Returns (lora_tree, report) with report keys ``converted``,
    ``skipped``, ``shape_errors``, ``unused_lora_keys``. Factors whose
    shapes do not actually factor their target kernel are rejected
    (raise under strict, reported and skipped otherwise).
    """
    sd = _strip_prefix(dict(state_dict))
    leaves, _ = jax.tree_util.tree_flatten_with_path(template_params)
    flat_leaves = [leaf for _, leaf in leaves]
    leaf_idx = _leaf_paths(template_params)
    paths = target_paths(template_params, targets)
    tree: dict = {}
    used: set = set()
    skipped, shape_errors = [], []
    for p in paths:
        if p not in base_rules:
            skipped.append(f"{p} (no base rule)")
            continue
        base_key = base_rules[p][0]
        site = None
        for a_key, b_key, alpha_key in _candidate_keys(base_key):
            if a_key in sd and b_key in sd:
                A = np.asarray(sd[a_key], np.float32)   # [r, in]
                B = np.asarray(sd[b_key], np.float32)   # [out, r]
                r = A.shape[0]
                d_in, d_out = flat_leaves[leaf_idx[p]].shape
                used.update({a_key, b_key})
                if alpha_key is not None and alpha_key in sd:
                    used.add(alpha_key)
                if A.shape != (r, d_in) or B.shape != (d_out, r):
                    shape_errors.append(
                        f"{p}: A {A.shape} / B {B.shape} do not factor "
                        f"the [{d_in}, {d_out}] kernel"
                    )
                    break
                alpha = float(np.asarray(sd[alpha_key])) if (
                    alpha_key is not None and alpha_key in sd
                ) else float(r)
                site = {
                    "a": jnp.asarray(A.T * (alpha / r)),
                    "b": jnp.asarray(B.T),
                }
                break
        if site is None:
            skipped.append(p)
        else:
            tree[p] = site
    unused = sorted(
        k for k in sd
        if k not in used and any(m in k for m in _LORA_KEY_MARKERS)
    )
    report = {
        "converted": sorted(tree),
        "skipped": skipped,
        "shape_errors": shape_errors,
        "unused_lora_keys": unused,
    }
    if strict and shape_errors:
        raise ValueError(
            "LoRA factor shapes do not match their target kernels:\n"
            + "\n".join(shape_errors[:10])
        )
    if not tree:
        raise ValueError(
            "no LoRA site in the checkpoint matched any target kernel — "
            f"formats tried: peft/diffusers/kohya; targets={tuple(targets)}"
        )
    if strict and unused:
        raise ValueError(
            f"{len(unused)} LoRA checkpoint keys matched no target site "
            f"(first few: {unused[:5]}) — pass strict=False to ignore"
        )
    return tree, report
