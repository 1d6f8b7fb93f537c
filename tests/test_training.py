"""Training-path tests: loss decreases over steps; sharded batched grid."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vdx.core.dtypes import FP32_POLICY
from vdx.core.init import fast_init
from vdx.models.unet_motion import UNetMotion, UNetMotionConfig
from vdx.parallel.train import TrainState, make_train_step


class TestTraining:
    def test_loss_decreases_and_grads_flow(self):
        """ONE compiled train step proves both training properties.

        (a) a few adamw steps on a fixed batch reduce the DDPM loss, and
        (b) no dead parameters: every leaf gets a nonzero gradient on the
        first step (grad_absmax metric). Merged into one test because the
        train-step compile dominates wall-clock on the 1-core CPU runner.
        """
        cfg = UNetMotionConfig.tiny()
        model = UNetMotion(cfg, policy=FP32_POLICY)
        B, F, H, W = 2, 2, 16, 16
        latents = jax.random.normal(jax.random.PRNGKey(0), (B, F, H, W, 4)) * 0.5
        ctx = jax.random.normal(jax.random.PRNGKey(1), (B, 7, cfg.cross_attention_dim))
        params = fast_init(model, latents, jnp.zeros((B,), jnp.int32), ctx, seed=2)
        optimizer = optax.adamw(3e-4)
        state = TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))
        step = jax.jit(make_train_step(model, optimizer, with_grad_stats=True))

        batch = {"latents": latents, "context": ctx}
        losses = []
        first_grads = None
        for i in range(8):
            # fixed rng: same (t, noise) every step => pure optimisation signal
            state, metrics = step(state, batch, jax.random.PRNGKey(42))
            losses.append(float(metrics["loss"]))
            if first_grads is None:
                first_grads = metrics["grad_absmax"]
        assert losses[-1] < losses[0] * 0.9, losses

        zero_leaves = [
            "/".join(str(k) for k in path)
            for path, g in jax.tree_util.tree_flatten_with_path(first_grads)[0]
            if float(g) == 0.0
        ]
        assert not zero_leaves, zero_leaves[:10]


class TestProductionLevers:
    def test_remat_accum_ema_step_matches_plain(self):
        """The production step (remat + grad_accum + EMA) is numerically the
        SAME optimisation as the plain step: rematerialisation recomputes
        identical activations, and the noise draw happens once per step for
        the full batch, so k micro-batches average to the full-batch
        gradient exactly. EMA = decay*init + (1-decay)*new_params.

        Uses SGD so the parameter comparison is LINEAR in the gradient —
        adamw's g/sqrt(v) normalisation amplifies one-ULP gradient
        reassociation differences into visible parameter noise."""
        from vdx.parallel.train import init_train_state

        cfg = UNetMotionConfig.tiny()
        model = UNetMotion(cfg, policy=FP32_POLICY)
        B, F, H, W = 2, 2, 16, 16
        latents = jax.random.normal(jax.random.PRNGKey(0), (B, F, H, W, 4)) * 0.5
        ctx = jax.random.normal(jax.random.PRNGKey(1), (B, 7, cfg.cross_attention_dim))
        params = fast_init(model, latents, jnp.zeros((B,), jnp.int32), ctx, seed=2)
        batch = {"latents": latents, "context": ctx}
        rng = jax.random.PRNGKey(42)

        optimizer = optax.sgd(1e-2)
        plain_state = TrainState(params, optimizer.init(params),
                                 jnp.zeros((), jnp.int32))
        plain = jax.jit(make_train_step(model, optimizer))
        sa, ma = plain(plain_state, batch, rng)

        prod_state, _ = init_train_state(model, params, optimizer=optimizer,
                                         ema=True)
        prod = jax.jit(make_train_step(
            model, optimizer, remat=True, grad_accum=2, ema_decay=0.9
        ))
        sb, mb = prod(prod_state, batch, rng)

        np.testing.assert_allclose(
            float(mb["loss"]), float(ma["loss"]), rtol=1e-5
        )
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-6
            ),
            sa.params, sb.params,
        )
        # EMA: 0.9 * init + 0.1 * updated
        jax.tree.map(
            lambda e, p0, p1: np.testing.assert_allclose(
                np.asarray(e), 0.9 * np.asarray(p0) + 0.1 * np.asarray(p1),
                atol=1e-6,
            ),
            sb.ema_params, params, sb.params,
        )
        assert int(sb.step) == 1

    def test_grad_accum_keeps_param_dtype(self):
        """bf16 params + grad_accum: the fp32-accumulated grads must come
        back in param dtype, or adamw's mu/nu silently upcast after step 1
        and the jitted step recompiles (trace-only check via eval_shape —
        no compile)."""
        import jax.numpy as jnp

        from vdx.core.dtypes import Policy

        policy = Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
        cfg = UNetMotionConfig.tiny()
        model = UNetMotion(cfg, policy=policy)
        B, F, H, W = 2, 2, 16, 16
        latents = (jax.random.normal(jax.random.PRNGKey(0), (B, F, H, W, 4))
                   .astype(jnp.bfloat16))
        ctx = (jax.random.normal(jax.random.PRNGKey(1),
                                 (B, 7, cfg.cross_attention_dim))
               .astype(jnp.bfloat16))
        params = fast_init(model, latents, jnp.zeros((B,), jnp.int32), ctx,
                           seed=2)
        optimizer = optax.adamw(1e-4)
        state = TrainState(params, optimizer.init(params),
                           jnp.zeros((), jnp.int32))
        step = make_train_step(model, optimizer, grad_accum=2)
        out_state, _ = jax.eval_shape(
            step, state, {"latents": latents, "context": ctx},
            jax.random.PRNGKey(3),
        )
        jax.tree.map(
            lambda before, after: None if before.dtype == after.dtype
            else pytest.fail(f"{before.dtype} -> {after.dtype}"),
            state.opt_state, out_state.opt_state,
        )

    def test_make_optimizer_warmup_and_clipping(self):
        """Recipe sanity on a toy problem (no model compile): warmup step 0
        has ~zero LR; the clip stage bounds the pre-adamw global norm."""
        from vdx.parallel.train import make_optimizer

        opt = make_optimizer(1e-2, warmup_steps=5, total_steps=20,
                             clip_norm=1.0)
        p = {"w": jnp.ones((4,)) * 2.0}
        st = opt.init(p)
        huge = {"w": jnp.ones((4,)) * 1e6}
        upd, st = opt.update(huge, st, p)
        # step 0 of the warmup: LR == 0 -> zero update regardless of grads
        assert float(jnp.abs(upd["w"]).max()) == 0.0
        upd, st = opt.update(huge, st, p)
        # step 1: LR = peak/5; adamw normalises, update magnitude ~ LR
        assert 0 < float(jnp.abs(upd["w"]).max()) < 1e-2

        # clipping alone: pre-adamw grads above the norm bound get scaled
        clip = optax.clip_by_global_norm(1.0)
        cst = clip.init(p)
        cupd, _ = clip.update(huge, cst, p)
        assert float(optax.global_norm(cupd)) <= 1.0 + 1e-5


class TestShardedBatchedGrid:
    def test_batched_runner_with_mesh(self, tmp_path):
        if len(jax.devices()) < 2:
            pytest.skip("needs 2 devices")
        from vdx.harness.batched import run_batched_experiments
        from vdx.harness.config import ExperimentConfig
        from vdx.models.clip_text import CLIPTextConfig
        from vdx.models.vae import VAEConfig
        from vdx.parallel.mesh import make_mesh
        from vdx.pipelines import AnimateDiffPipeline

        pipe = AnimateDiffPipeline.with_random_params(
            seed=0,
            unet_config=UNetMotionConfig.tiny(),
            vae_config=VAEConfig.tiny(),
            text_config=CLIPTextConfig.tiny(),
            policy=FP32_POLICY,
            scheduler="ddim",
        )
        mesh = make_mesh(2, 1, 1)
        cfgs = [
            ExperimentConfig(
                experiment_id=f"m{i}", video_name=f"v{i}", prompt=f"p {i}",
                negative_prompt="bad", guidance_scale=7.5,
                num_inference_steps=2, phase="cfg_ablation", seed=i,
                num_frames=2, height=64, width=64,
            )
            for i in range(2)
        ]
        run_batched_experiments(
            pipe, cfgs, tmp_path, scheduler="ddim", mesh=mesh,
            log=lambda *a: None,
        )
        for c in cfgs:
            assert (tmp_path / c.experiment_id / "config.json").exists()
