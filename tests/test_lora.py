"""LoRA adapter tests: merge semantics, checkpoint-format conversion,
adapter-only training, and the pipeline load/unload/rescale surface.

Weight-space LoRA (core/lora.py): ``W' = W + scale * a @ b`` on attention
projections — torch-format conversion covers peft, old-diffusers-processor
and kohya key styles, derived target-driven from the base conversion rules.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vdx.core.convert import unet_motion_rules
from vdx.core.dtypes import FP32_POLICY
from vdx.core.init import fast_init
from vdx.core.lora import (
    DEFAULT_TARGETS,
    convert_lora_checkpoint,
    init_lora,
    is_lora_state_dict,
    merge_lora,
    target_paths,
)
from vdx.models.clip_text import CLIPTextConfig
from vdx.models.unet_motion import UNetMotion, UNetMotionConfig
from vdx.models.vae import VAEConfig
from vdx.pipelines import AnimateDiffPipeline


@pytest.fixture(scope="module")
def tiny_unet():
    cfg = UNetMotionConfig.tiny()
    model = UNetMotion(cfg, policy=FP32_POLICY)
    sample = jnp.asarray(
        np.random.default_rng(3).standard_normal((1, 2, 8, 8, cfg.in_channels)),
        jnp.float32,
    )
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.asarray(
        np.random.default_rng(4).standard_normal((1, 7, cfg.cross_attention_dim)),
        jnp.float32,
    )
    params = fast_init(model, sample, t, ctx, seed=0)
    return model, params, (sample, t, ctx)


def _randomize_b(lora, seed=5, scale=0.1):
    """Fresh adapters have b=0 (exact no-op); give them a deterministic
    nonzero b so merging visibly changes the weights."""
    rng = np.random.default_rng(seed)
    return {
        p: {
            "a": site["a"],
            "b": jnp.asarray(
                rng.standard_normal(site["b"].shape, np.float32) * scale
            ),
        }
        for p, site in lora.items()
    }


class TestMerge:
    def test_fresh_adapter_is_identity(self, tiny_unet):
        _, params, _ = tiny_unet
        lora = init_lora(params, rank=2)
        merged = merge_lora(params, lora, 1.0)
        assert jax.tree_util.tree_structure(merged) == (
            jax.tree_util.tree_structure(params)
        )
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(merged)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_scale_zero_is_identity(self, tiny_unet):
        _, params, _ = tiny_unet
        lora = _randomize_b(init_lora(params, rank=2))
        merged = merge_lora(params, lora, 0.0)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(merged)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_merge_matches_manual_delta(self, tiny_unet):
        _, params, _ = tiny_unet
        lora = _randomize_b(init_lora(params, rank=4))
        merged = merge_lora(params, lora, 0.7)
        from vdx.core.convert import flatten_params

        base_flat = flatten_params(params)
        merged_flat = flatten_params(merged)
        path = sorted(lora)[0]
        want = np.asarray(base_flat[path]) + 0.7 * (
            np.asarray(lora[path]["a"]) @ np.asarray(lora[path]["b"])
        )
        np.testing.assert_allclose(
            np.asarray(merged_flat[path]), want, rtol=1e-6, atol=1e-6
        )
        # non-target leaves untouched
        other = next(p for p in base_flat if p not in lora)
        np.testing.assert_array_equal(
            np.asarray(base_flat[other]), np.asarray(merged_flat[other])
        )

    def test_targets_cover_all_attention_projections(self, tiny_unet):
        _, params, _ = tiny_unet
        paths = target_paths(params)
        assert paths, "no targets found"
        for proj in ("to_q", "to_k", "to_v", "to_out"):
            assert any(f"/{proj}/kernel" in p or p.endswith(f"{proj}/kernel")
                       for p in paths), proj

    def test_forward_changes_with_adapter(self, tiny_unet):
        model, params, (sample, t, ctx) = tiny_unet
        lora = _randomize_b(init_lora(params, rank=2))
        base_out = model.apply(params, sample, t, ctx)
        lora_out = model.apply(merge_lora(params, lora, 1.0), sample, t, ctx)
        assert not np.allclose(np.asarray(base_out), np.asarray(lora_out))

    def test_wrong_architecture_raises(self, tiny_unet):
        _, params, _ = tiny_unet
        lora = {"nonexistent/path/kernel": {
            "a": jnp.zeros((4, 2)), "b": jnp.zeros((2, 4))}}
        with pytest.raises(KeyError):
            merge_lora(params, lora, 1.0)


class TestConversion:
    """Torch LoRA state dicts in the three ecosystem key formats."""

    def _setup(self):
        cfg = UNetMotionConfig.tiny()
        model = UNetMotion(cfg, policy=FP32_POLICY)
        sample = jnp.zeros((1, 2, 8, 8, cfg.in_channels))
        params = fast_init(
            model, sample, jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 7, cfg.cross_attention_dim)), seed=0,
        )
        return params, unet_motion_rules(cfg)

    def test_peft_format_with_unet_prefix(self):
        params, rules = self._setup()
        from vdx.core.convert import flatten_params

        flat = flatten_params(params)
        paths = target_paths(params)[:3]
        rng = np.random.default_rng(0)
        sd, torch_factors = {}, {}
        for p in paths:
            d_in, d_out = flat[p].shape
            A = rng.standard_normal((4, d_in)).astype(np.float32)
            B = rng.standard_normal((d_out, 4)).astype(np.float32)
            stem = rules[p][0][: -len(".weight")]
            sd[f"unet.{stem}.lora_A.weight"] = A
            sd[f"unet.{stem}.lora_B.weight"] = B
            torch_factors[p] = (A, B)
        assert is_lora_state_dict(sd)
        lora, report = convert_lora_checkpoint(sd, params, rules)
        assert sorted(lora) == sorted(paths)
        assert report["unused_lora_keys"] == []
        assert len(report["skipped"]) == len(target_paths(params)) - 3
        for p, (A, B) in torch_factors.items():
            # alpha defaults to rank -> factor 1
            np.testing.assert_allclose(np.asarray(lora[p]["a"]), A.T, rtol=1e-6)
            np.testing.assert_allclose(np.asarray(lora[p]["b"]), B.T, rtol=1e-6)

    def test_kohya_format_with_alpha(self):
        params, rules = self._setup()
        from vdx.core.convert import flatten_params

        flat = flatten_params(params)
        p = target_paths(params)[0]
        d_in, d_out = flat[p].shape
        rng = np.random.default_rng(1)
        A = rng.standard_normal((4, d_in)).astype(np.float32)
        B = rng.standard_normal((d_out, 4)).astype(np.float32)
        stem = rules[p][0][: -len(".weight")]
        mangled = "lora_unet_" + stem.replace(".", "_")
        sd = {
            f"{mangled}.lora_down.weight": A,
            f"{mangled}.lora_up.weight": B,
            f"{mangled}.alpha": np.float32(8.0),  # rank 4 -> factor 2
        }
        lora, report = convert_lora_checkpoint(sd, params, rules)
        assert report["unused_lora_keys"] == []
        np.testing.assert_allclose(
            np.asarray(lora[p]["a"]), A.T * 2.0, rtol=1e-6
        )
        np.testing.assert_allclose(np.asarray(lora[p]["b"]), B.T, rtol=1e-6)

    def test_old_processor_format(self):
        params, rules = self._setup()
        from vdx.core.convert import flatten_params

        flat = flatten_params(params)
        # pick a to_out site: its processor form drops the trailing ".0"
        p = next(q for q in target_paths(params) if q.endswith("to_out/kernel"))
        d_in, d_out = flat[p].shape
        rng = np.random.default_rng(2)
        A = rng.standard_normal((2, d_in)).astype(np.float32)
        B = rng.standard_normal((d_out, 2)).astype(np.float32)
        base = rules[p][0]  # "...to_out.0.weight"
        assert base.endswith("to_out.0.weight")
        proc = base[: -len(".0.weight")] + "_lora"
        parent, name = proc.rsplit(".", 1)
        sd = {
            f"{parent}.processor.{name}.down.weight": A,
            f"{parent}.processor.{name}.up.weight": B,
        }
        lora, _ = convert_lora_checkpoint(sd, params, rules)
        assert p in lora
        np.testing.assert_allclose(np.asarray(lora[p]["a"]), A.T, rtol=1e-6)

    def test_strict_rejects_unmatched_lora_keys(self):
        params, rules = self._setup()
        from vdx.core.convert import flatten_params

        flat = flatten_params(params)
        p = target_paths(params)[0]
        d_in, d_out = flat[p].shape
        stem = rules[p][0][: -len(".weight")]
        sd = {
            f"{stem}.lora_A.weight": np.zeros((2, d_in), np.float32),
            f"{stem}.lora_B.weight": np.zeros((d_out, 2), np.float32),
            "text_encoder.layers.0.q.lora_A.weight": np.zeros(
                (2, 8), np.float32
            ),
        }
        with pytest.raises(ValueError, match="matched no target"):
            convert_lora_checkpoint(sd, params, rules)
        lora, report = convert_lora_checkpoint(sd, params, rules, strict=False)
        assert p in lora and len(report["unused_lora_keys"]) == 1

    def test_no_matching_site_raises(self):
        params, rules = self._setup()
        with pytest.raises(ValueError, match="no LoRA site"):
            convert_lora_checkpoint(
                {"foo.lora_A.weight": np.zeros((2, 2), np.float32)},
                params, rules,
            )


class TestTorchParity:
    def test_merged_kernel_matches_torch_lora_linear(self):
        """Our merged flax kernel reproduces torch's peft-style
        ``y = x @ (W + (alpha/r) B A)^T`` exactly."""
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(0)
        d_in, d_out, r, alpha = 16, 24, 4, 6.0
        W = rng.standard_normal((d_out, d_in)).astype(np.float32)
        A = rng.standard_normal((r, d_in)).astype(np.float32)
        B = rng.standard_normal((d_out, r)).astype(np.float32)
        x = rng.standard_normal((5, d_in)).astype(np.float32)

        with torch.no_grad():
            merged_t = torch.tensor(W) + (alpha / r) * (
                torch.tensor(B) @ torch.tensor(A)
            )
            y_torch = torch.nn.functional.linear(
                torch.tensor(x), merged_t
            ).numpy()

        kernel = jnp.asarray(W.T)  # flax [in, out]
        a = jnp.asarray(A.T * (alpha / r))
        b = jnp.asarray(B.T)
        merged = merge_lora(
            {"params": {"dense": {"kernel": kernel}}},
            {"dense/kernel": {"a": a, "b": b}},
            1.0,
        )
        y_ours = np.asarray(x @ merged["params"]["dense"]["kernel"])
        np.testing.assert_allclose(y_ours, y_torch, rtol=1e-5, atol=1e-5)


class TestLoRATraining:
    def test_adapter_only_training_reduces_loss(self, tiny_unet):
        from vdx.parallel.train import TrainState, make_lora_train_step

        model, base_params, (sample, t, ctx) = tiny_unet
        lora = init_lora(base_params, rank=4, seed=1)
        optimizer = optax.adam(3e-3)
        step = jax.jit(make_lora_train_step(model, optimizer))
        state = TrainState(lora, optimizer.init(lora), jnp.zeros((), jnp.int32))

        rng = np.random.default_rng(7)
        batch = {
            "latents": jnp.asarray(
                rng.standard_normal(sample.shape).astype(np.float32)
            ),
            "context": ctx,
        }
        base_before = jax.tree.map(np.asarray, base_params)
        losses = []
        for _ in range(8):
            # fixed draw key -> fixed objective -> optimization must descend
            state, metrics = step(state, batch, jax.random.PRNGKey(0),
                                  base_params)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0], losses
        # base params are never touched (pure inputs)
        for before, after in zip(
            jax.tree.leaves(base_before), jax.tree.leaves(base_params)
        ):
            np.testing.assert_array_equal(before, np.asarray(after))
        # the adapter moved (b starts at zero, must be nonzero after)
        b_after = np.asarray(state.params[sorted(lora)[0]]["b"])
        assert np.abs(b_after).max() > 0

    def test_adapter_checkpoint_roundtrip(self, tiny_unet, tmp_path):
        from vdx.core.checkpoint import load_params, save_params

        _, params, _ = tiny_unet
        lora = _randomize_b(init_lora(params, rank=2))
        save_params(lora, tmp_path / "adapter")
        loaded = load_params(tmp_path / "adapter", template=lora)
        for a, b in zip(jax.tree.leaves(lora), jax.tree.leaves(loaded)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.fixture(scope="module")
def tiny_pipe():
    return AnimateDiffPipeline.with_random_params(
        seed=0,
        unet_config=UNetMotionConfig.tiny(),
        vae_config=VAEConfig.tiny(),
        text_config=CLIPTextConfig.tiny(),
        policy=FP32_POLICY,
    )


GEN = dict(num_frames=2, height=64, width=64, num_inference_steps=2,
           seed=11, output_type="np")


class TestPipelineSurface:
    def test_load_rescale_unload_roundtrip(self, tiny_pipe):
        base = tiny_pipe("portrait", **GEN).frames[0]
        lora = _randomize_b(init_lora(tiny_pipe.params["unet"], rank=2))

        tiny_pipe.load_lora(lora, scale=1.0)
        adapted = tiny_pipe("portrait", **GEN).frames[0]
        assert not np.array_equal(base, adapted)

        # scale 0 == pristine weights, bit-exact
        tiny_pipe.set_lora_scale(0.0)
        np.testing.assert_array_equal(tiny_pipe("portrait", **GEN).frames[0],
                                      base)
        # back to 1.0 == the adapted output, bit-exact (no rounding drift)
        tiny_pipe.set_lora_scale(1.0)
        np.testing.assert_array_equal(tiny_pipe("portrait", **GEN).frames[0],
                                      adapted)

        tiny_pipe.unload_lora()
        np.testing.assert_array_equal(tiny_pipe("portrait", **GEN).frames[0],
                                      base)
        assert tiny_pipe._lora_active == {}

    def test_load_replaces_previous_adapter(self, tiny_pipe):
        base = tiny_pipe("portrait", **GEN).frames[0]
        l1 = _randomize_b(init_lora(tiny_pipe.params["unet"], rank=2), seed=5)
        l2 = _randomize_b(init_lora(tiny_pipe.params["unet"], rank=2), seed=9)
        tiny_pipe.load_lora(l1)
        out1 = tiny_pipe("portrait", **GEN).frames[0]
        tiny_pipe.load_lora(l2)  # replaces, merges from pristine
        out2 = tiny_pipe("portrait", **GEN).frames[0]
        assert not np.array_equal(out1, out2)
        tiny_pipe.unload_lora()
        np.testing.assert_array_equal(tiny_pipe("portrait", **GEN).frames[0],
                                      base)

    def test_load_torch_state_dict_end_to_end(self, tiny_pipe):
        from vdx.core.convert import flatten_params

        base = tiny_pipe("portrait", **GEN).frames[0]
        rules = unet_motion_rules(tiny_pipe.unet.config)
        flat = flatten_params(tiny_pipe.params["unet"])
        rng = np.random.default_rng(3)
        sd = {}
        for p in target_paths(tiny_pipe.params["unet"])[:4]:
            d_in, d_out = flat[p].shape
            stem = rules[p][0][: -len(".weight")]
            sd[f"{stem}.lora_A.weight"] = (
                rng.standard_normal((2, d_in)).astype(np.float32) * 0.2
            )
            sd[f"{stem}.lora_B.weight"] = (
                rng.standard_normal((d_out, 2)).astype(np.float32) * 0.2
            )
        report = tiny_pipe.load_lora(sd, scale=1.0)
        assert len(report["converted"]) == 4
        assert not np.array_equal(base, tiny_pipe("portrait", **GEN).frames[0])
        tiny_pipe.unload_lora()
        np.testing.assert_array_equal(tiny_pipe("portrait", **GEN).frames[0],
                                      base)

    def test_no_active_adapter_errors(self, tiny_pipe):
        with pytest.raises(ValueError, match="no LoRA active"):
            tiny_pipe.unload_lora()
        with pytest.raises(ValueError, match="no LoRA active"):
            tiny_pipe.set_lora_scale(0.5)


class TestConversionCLI:
    def test_lora_cli_roundtrip(self, tiny_pipe, tmp_path):
        """scripts/convert_checkpoint.py --lora: torch safetensors ->
        Orbax adapter -> load_params -> pipe.load_lora changes the output."""
        import importlib.util
        from pathlib import Path as _P

        from safetensors.numpy import save_file

        from vdx.core.checkpoint import load_params
        from vdx.core.convert import flatten_params

        spec = importlib.util.spec_from_file_location(
            "convert_checkpoint",
            _P(__file__).resolve().parents[1]
            / "scripts" / "convert_checkpoint.py",
        )
        cli = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(cli)

        rules = unet_motion_rules(tiny_pipe.unet.config)
        flat = flatten_params(tiny_pipe.params["unet"])
        rng = np.random.default_rng(8)
        sd = {}
        for p in target_paths(tiny_pipe.params["unet"])[:3]:
            d_in, d_out = flat[p].shape
            stem = rules[p][0][: -len(".weight")]
            sd[f"{stem}.lora_A.weight"] = (
                rng.standard_normal((2, d_in)).astype(np.float32) * 0.3
            )
            sd[f"{stem}.lora_B.weight"] = (
                rng.standard_normal((d_out, 2)).astype(np.float32) * 0.3
            )
        src = tmp_path / "motion_lora.safetensors"
        save_file(sd, str(src))

        out = tmp_path / "adapter"
        assert cli.main([
            "--family", "animatediff", "--tiny", "--dtype", "fp32",
            "--lora", f"unet={src}", "--lora-out", str(out),
        ]) == 0

        adapter = load_params(out)
        assert len(adapter) == 3
        base = tiny_pipe("portrait", **GEN).frames[0]
        tiny_pipe.load_lora(adapter, scale=1.0)
        assert not np.array_equal(base, tiny_pipe("portrait", **GEN).frames[0])
        tiny_pipe.unload_lora()
        np.testing.assert_array_equal(
            base, tiny_pipe("portrait", **GEN).frames[0]
        )


def test_convert_rejects_misshaped_factors():
    """Factors that don't factor their target kernel are shape-checked."""
    cfg = UNetMotionConfig.tiny()
    model = UNetMotion(cfg, policy=FP32_POLICY)
    params = fast_init(
        model, jnp.zeros((1, 2, 8, 8, cfg.in_channels)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 7, cfg.cross_attention_dim)), seed=0,
    )
    rules = unet_motion_rules(cfg)
    p = target_paths(params)[0]
    stem = rules[p][0][: -len(".weight")]
    sd = {
        f"{stem}.lora_A.weight": np.zeros((2, 999), np.float32),
        f"{stem}.lora_B.weight": np.zeros((999, 2), np.float32),
    }
    with pytest.raises(ValueError, match="do not factor"):
        convert_lora_checkpoint(sd, params, rules)
    with pytest.raises(ValueError, match="no LoRA site"):
        # non-strict: the site is skipped, leaving nothing converted
        convert_lora_checkpoint(sd, params, rules, strict=False)
