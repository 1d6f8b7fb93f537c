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
