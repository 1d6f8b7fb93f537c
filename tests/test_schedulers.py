"""Scheduler math tests.

Golden values are hand-derived from the closed-form definitions in the
reference docs (reference docs/01_diffusion_fundamentals.md) and the exact
configs the reference sets (experiments/01:76-80, 05:136-141), plus
self-consistency identities of the DDIM/Euler updates.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vdx.schedulers import ddim, dpm, euler
from vdx.schedulers.common import (
    ScheduleConfig,
    make_alphas_cumprod,
    make_betas,
    timesteps_leading,
    timesteps_linspace,
)


class TestSchedule:
    def test_linear_betas_endpoints(self):
        betas = make_betas(ScheduleConfig())
        assert betas.shape == (1000,)
        np.testing.assert_allclose(betas[0], 0.00085, rtol=1e-6)
        np.testing.assert_allclose(betas[-1], 0.012, rtol=1e-6)
        assert np.all(np.diff(betas) > 0)

    def test_scaled_linear_betas(self):
        betas = make_betas(ScheduleConfig(beta_schedule="scaled_linear"))
        np.testing.assert_allclose(betas[0], 0.00085, rtol=1e-5)
        np.testing.assert_allclose(betas[-1], 0.012, rtol=1e-5)

    def test_alphas_cumprod(self):
        acp = make_alphas_cumprod(ScheduleConfig())
        np.testing.assert_allclose(acp[0], 1 - 0.00085, rtol=1e-6)
        assert np.all(np.diff(acp) < 0)
        assert acp[-1] > 0

    def test_leading_spacing_25_steps_offset1(self):
        # T=1000, 25 steps, offset 1 -> step_ratio 40 -> [961, 921, ..., 1]
        ts = timesteps_leading(1000, 25, steps_offset=1)
        assert ts[0] == 961 and ts[-1] == 1
        assert len(ts) == 25
        assert np.all(np.diff(ts) == -40)

    def test_linspace_spacing_25_steps(self):
        ts = timesteps_linspace(1000, 25)
        assert ts[0] == 999 and ts[-1] == 0
        assert len(ts) == 25


class TestDDIM:
    def test_tables_reference_config(self):
        t = ddim.make_tables(25)
        assert t.timesteps.shape == (25,)
        assert int(t.timesteps[0]) == 961
        acp = make_alphas_cumprod(ScheduleConfig())
        np.testing.assert_allclose(t.alpha_prod_t[0], acp[961], rtol=1e-6)
        # set_alpha_to_one=False: the final prev-alpha is alphas_cumprod[0]
        np.testing.assert_allclose(t.alpha_prod_prev[-1], acp[0], rtol=1e-6)

    def test_step_identity_on_true_eps(self):
        """Feeding the true eps must land exactly on the x_{t-1} interpolant."""
        key = jax.random.PRNGKey(0)
        x0 = jax.random.normal(key, (2, 4, 8, 8))
        eps = jax.random.normal(jax.random.fold_in(key, 1), (2, 4, 8, 8))
        t = ddim.make_tables(25)
        for i in [0, 10, 24]:
            a_t, a_prev = t.alpha_prod_t[i], t.alpha_prod_prev[i]
            x_t = jnp.sqrt(a_t) * x0 + jnp.sqrt(1 - a_t) * eps
            out = ddim.step(x_t, eps, jnp.asarray(i), t)
            expected = jnp.sqrt(a_prev) * x0 + jnp.sqrt(1 - a_prev) * eps
            np.testing.assert_allclose(out, expected, atol=1e-5)

    def test_full_chain_recovers_x0(self):
        """With a perfect eps oracle, a full DDIM chain denoises to ~x0."""
        key = jax.random.PRNGKey(3)
        x0 = jax.random.normal(key, (1, 4, 4, 4))
        eps = jax.random.normal(jax.random.fold_in(key, 7), (1, 4, 4, 4))
        t = ddim.make_tables(50)
        a0 = t.alpha_prod_t[0]
        x = jnp.sqrt(a0) * x0 + jnp.sqrt(1 - a0) * eps
        for i in range(50):
            x = ddim.step(x, eps, jnp.asarray(i), t)
        # Terminal alpha_prod_prev = acp[0] ~ 0.99915, so x ~ sqrt(acp0)x0 + ...
        a_last = t.alpha_prod_prev[-1]
        expected = jnp.sqrt(a_last) * x0 + jnp.sqrt(1 - a_last) * eps
        np.testing.assert_allclose(x, expected, atol=1e-4)

    def test_v_prediction_equivalence(self):
        """v-pred with the v consistent with (x0, eps) matches eps-pred."""
        cfg_v = ddim.DDIMConfig(schedule=ScheduleConfig(prediction_type="v_prediction"))
        key = jax.random.PRNGKey(5)
        x0 = jax.random.normal(key, (1, 4, 4, 4))
        eps = jax.random.normal(jax.random.fold_in(key, 2), (1, 4, 4, 4))
        t = ddim.make_tables(25)
        i = 7
        a_t = t.alpha_prod_t[i]
        x_t = jnp.sqrt(a_t) * x0 + jnp.sqrt(1 - a_t) * eps
        v = jnp.sqrt(a_t) * eps - jnp.sqrt(1 - a_t) * x0
        out_eps = ddim.step(x_t, eps, jnp.asarray(i), t)
        out_v = ddim.step(x_t, v, jnp.asarray(i), t, cfg_v)
        np.testing.assert_allclose(out_v, out_eps, atol=1e-5)


class TestEuler:
    def test_tables_reference_config(self):
        t = euler.make_tables(25)
        assert t.sigmas.shape == (26,)
        assert float(t.sigmas[-1]) == 0.0
        assert np.all(np.diff(np.asarray(t.sigmas[:-1])) < 0)
        # linspace spacing: init noise sigma is max sigma = sigma(t=999)
        acp = make_alphas_cumprod(ScheduleConfig())
        sigma_max = float(np.sqrt((1 - acp[-1]) / acp[-1]))
        np.testing.assert_allclose(t.init_noise_sigma, sigma_max, rtol=1e-5)
        np.testing.assert_allclose(t.sigmas[0], sigma_max, rtol=1e-5)
        np.testing.assert_allclose(float(t.timesteps[0]), 999.0)
        np.testing.assert_allclose(float(t.timesteps[-1]), 0.0)

    def test_scale_model_input(self):
        t = euler.make_tables(25)
        x = jnp.ones((1, 4, 2, 2))
        scaled = euler.scale_model_input(x, 0, t)
        s = float(t.sigmas[0])
        np.testing.assert_allclose(scaled, x / np.sqrt(s**2 + 1), rtol=1e-5)

    def test_last_step_returns_denoised(self):
        """At sigma_next=0 the Euler update lands exactly on denoised."""
        t = euler.make_tables(10)
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (1, 4, 4, 4))
        eps = jax.random.normal(jax.random.fold_in(key, 1), (1, 4, 4, 4))
        i = 9
        out = euler.step(x, eps, jnp.asarray(i), t)
        sigma = t.sigmas[i]
        np.testing.assert_allclose(out, x - sigma * eps, atol=1e-5)

    def test_exactness_on_linear_ode(self):
        """Euler is exact when the denoiser output makes d constant in sigma.

        If the model always reports eps_hat = c (constant), then
        d = (x - (x - sigma c))/sigma = c, so the trajectory is
        x(sigma) = x0 + sigma*c, which single-step Euler follows exactly.
        """
        t = euler.make_tables(5)
        c = jnp.full((1, 2, 2, 2), 0.7)
        x = jnp.asarray(t.init_noise_sigma) * c  # on the line through 0
        for i in range(5):
            x = euler.step(x, c, jnp.asarray(i), t)
        np.testing.assert_allclose(x, jnp.zeros_like(x), atol=1e-4)


class TestDPM:
    def test_tables(self):
        t = dpm.make_tables(20)
        assert t.timesteps.shape == (20,)
        lam = np.asarray(t.lam)
        assert np.all(np.diff(lam) > 0)  # lambda increases as we denoise

    def test_chain_recovers_x0_with_oracle(self):
        key = jax.random.PRNGKey(11)
        x0 = jax.random.normal(key, (1, 4, 4, 4))
        t = dpm.make_tables(20)
        acp = make_alphas_cumprod(ScheduleConfig())
        eps = jax.random.normal(jax.random.fold_in(key, 3), (1, 4, 4, 4))
        a0 = t.alpha_prod[0]
        x = jnp.sqrt(a0) * x0 + jnp.sqrt(1 - a0) * eps
        prev_x0 = dpm.init_state(x)
        for i in range(20):
            # oracle: the eps consistent with the *current* x and the true x0
            a = t.alpha_prod[i]
            eps_i = (x - jnp.sqrt(a) * x0) / jnp.sqrt(1 - a)
            x, prev_x0 = dpm.step_multistep(x, eps_i, jnp.asarray(i), prev_x0, t)
        np.testing.assert_allclose(x, x0, atol=1e-2)


class TestScanCompatibility:
    def test_ddim_under_scan_and_jit(self):
        t = ddim.make_tables(25)
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (1, 4, 4, 4))
        eps = jax.random.normal(jax.random.fold_in(key, 1), (1, 4, 4, 4))

        @jax.jit
        def run(x):
            def body(carry, i):
                return ddim.step(carry, eps, i, t), None

            out, _ = jax.lax.scan(body, x, jnp.arange(25))
            return out

        out_scan = run(x)
        x_loop = x
        for i in range(25):
            x_loop = ddim.step(x_loop, eps, jnp.asarray(i), t)
        np.testing.assert_allclose(out_scan, x_loop, rtol=1e-4, atol=1e-4)
