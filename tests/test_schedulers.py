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

from vdx.schedulers import ddim, dpm, dpm_edm, edm, euler, unipc
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


class TestScheduleMods:
    """Checkpoint-family schedule knobs: SNR shift (CogVideoX), zero-terminal-
    SNR rescale (Lin et al. 2023), DDIM timestep_spacing variants."""

    def test_snr_shift_golden(self):
        s = 3.0
        base = make_alphas_cumprod(ScheduleConfig()).astype(np.float64)
        acp = make_alphas_cumprod(ScheduleConfig(snr_shift_scale=s))
        np.testing.assert_allclose(acp, base / (s - (s - 1) * base), rtol=1e-5)
        # the defining property: every SNR is divided by s
        snr, snr_s = base / (1 - base), acp / (1 - acp.astype(np.float64))
        np.testing.assert_allclose(snr_s, snr / s, rtol=1e-4)

    def test_zero_snr_rescale_properties(self):
        cfg = ScheduleConfig(rescale_zero_snr=True,
                             prediction_type="v_prediction")
        acp = make_alphas_cumprod(cfg)
        base = make_alphas_cumprod(ScheduleConfig())
        assert acp[-1] == 0.0  # terminal SNR exactly zero
        np.testing.assert_allclose(acp[0], base[0], rtol=1e-5)  # first kept
        assert np.all(np.diff(acp.astype(np.float64)) < 0)

    def test_dynamic_cfg_schedule(self):
        from vdx.schedulers.common import dynamic_cfg_schedule

        g = dynamic_cfg_schedule(6.0, 50)
        assert g.shape == (50,) and g.dtype == np.float32
        np.testing.assert_allclose(g[-1], 6.0, rtol=1e-6)  # full scale last
        assert g[0] == pytest.approx(1.0, abs=1e-5)  # ~no CFG at pure noise
        assert np.all(np.diff(g) >= 0)  # monotone ramp

    def test_ddim_trailing_spacing(self):
        cfg = ddim.DDIMConfig(timestep_spacing="trailing", steps_offset=0)
        t = ddim.make_tables(4, cfg)
        np.testing.assert_array_equal(
            np.asarray(t.timesteps), [999, 749, 499, 249]
        )

    def test_vpred_zero_snr_ddim_chain_recovers_x0(self):
        """The CogVideoX-style schedule (scaled_linear + SNR shift + zero-SNR
        rescale + v_prediction + set_alpha_to_one) run with a v oracle lands
        exactly on x0 — in particular the terminal sqrt(acp)=0 node divides
        by nothing on the v-prediction path."""
        sched = ScheduleConfig(
            beta_schedule="scaled_linear", prediction_type="v_prediction",
            snr_shift_scale=3.0, rescale_zero_snr=True,
        )
        cfg = ddim.DDIMConfig(schedule=sched, steps_offset=0,
                              set_alpha_to_one=True)
        t = ddim.make_tables(20, cfg)
        key = jax.random.PRNGKey(3)
        x0 = jax.random.normal(key, (1, 2, 4, 4))
        eps0 = jax.random.normal(jax.random.fold_in(key, 1), x0.shape)
        a0 = t.alpha_prod_t[0]
        x = jnp.sqrt(a0) * x0 + jnp.sqrt(1 - a0) * eps0
        for i in range(20):
            a = t.alpha_prod_t[i]
            sqrt_a, sqrt_1ma = jnp.sqrt(a), jnp.sqrt(1 - a)
            eps_i = (x - sqrt_a * x0) / jnp.maximum(sqrt_1ma, 1e-12)
            v_i = sqrt_a * eps_i - sqrt_1ma * x0
            x = ddim.step(x, v_i, jnp.asarray(i), t, cfg)
        np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-4)


class TestDPMEDM:
    """DPM-Solver++(2M) on the Karras/EDM grid (schedulers/dpm_edm.py)."""

    def test_tables_are_the_edm_grid(self):
        a, b = dpm_edm.make_tables(15), edm.make_tables(15)
        np.testing.assert_array_equal(np.asarray(a.sigmas), np.asarray(b.sigmas))
        np.testing.assert_array_equal(
            np.asarray(a.timesteps), np.asarray(b.timesteps)
        )
        assert a.init_noise_sigma == b.init_noise_sigma

    def test_oracle_recovers_x0_exactly(self):
        """With a model whose implied denoised prediction is the TRUE x0
        (delta data distribution), the exponential-integrator chain lands
        exactly on x0 — the terminal step returns D = x0 at sigma=0."""
        key = jax.random.PRNGKey(5)
        x0 = jax.random.normal(key, (1, 2, 4, 4, 4))
        t = dpm_edm.make_tables(6)
        x = x0 + t.init_noise_sigma * jax.random.normal(
            jax.random.fold_in(key, 1), x0.shape
        )
        prev = dpm_edm.init_state(x)
        for i in range(6):
            sigma = t.sigmas[i]
            c_skip = 1.0 / (sigma**2 + 1.0)
            c_out = -sigma / jnp.sqrt(sigma**2 + 1.0)
            f_oracle = (x0 - c_skip * x) / c_out  # denoised == x0
            x, prev = dpm_edm.step_multistep(x, f_oracle, jnp.asarray(i), prev, t)
        np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-4)

    @staticmethod
    def _integrate(mod, n, x_init, multistep):
        """Run the sigma-grid ODE with the fixed nonlinear test model
        F(model_in) = tanh(model_in)."""
        t = mod.make_tables(n)
        x = x_init
        prev = jnp.zeros_like(x)
        for i in range(n):
            f = jnp.tanh(mod.scale_model_input(x, i, t))
            if multistep:
                x, prev = mod.step_multistep(x, f, jnp.asarray(i), prev, t)
            else:
                x = mod.step(x, f, jnp.asarray(i), t)
        return x

    def test_second_order_convergence_vs_euler(self):
        """At equal step counts the multistep solver tracks the fine-grid
        ODE solution much closer than first-order Euler (the entire point:
        ~half the UNet evaluations for the same trajectory accuracy)."""
        key = jax.random.PRNGKey(9)
        x_init = 700.0 * jax.random.normal(key, (1, 2, 4, 4, 2))
        ref = self._integrate(edm, 2048, x_init, multistep=False)
        scale = float(jnp.mean(jnp.abs(ref)))

        def err(mod, n, multistep):
            out = self._integrate(mod, n, x_init, multistep)
            return float(jnp.mean(jnp.abs(out - ref))) / scale

        e_euler_32, e_euler_64 = err(edm, 32, False), err(edm, 64, False)
        e_dpm_32, e_dpm_64 = err(dpm_edm, 32, True), err(dpm_edm, 64, True)
        # second-order: each doubling should cut the error ~4x (allow 2.8x
        # for the coarse-grid preasymptotic regime); Euler halves it
        assert e_dpm_64 < e_dpm_32 / 2.8, (e_dpm_32, e_dpm_64)
        assert e_euler_32 / 2.6 < e_euler_64 < e_euler_32 / 1.6
        # and at equal step counts the multistep solver is far closer
        assert e_dpm_32 < 0.6 * e_euler_32, (e_dpm_32, e_euler_32)
        assert e_dpm_64 < 0.35 * e_euler_64, (e_dpm_64, e_euler_64)
        # measured on this fixed seed: euler .209/.102, dpm .0998/.0226
        # (this synthetic tanh model is stiffer than a trained denoiser —
        # its x0 swings across the FULL lambda range; where the crossover
        # sits for the real UNet is measured at the pipeline level,
        # tests/test_svd.py::test_dpm_edm_tracks_fine_reference)

    def test_under_scan_and_jit(self):
        t = dpm_edm.make_tables(10)
        key = jax.random.PRNGKey(2)
        x = 700.0 * jax.random.normal(key, (1, 2, 4, 4, 2))

        @jax.jit
        def run(x):
            def body(carry, i):
                lat, prev = carry
                f = jnp.tanh(dpm_edm.scale_model_input(lat, i, t))
                lat, x0 = dpm_edm.step_multistep(lat, f, i, prev, t)
                return (lat, x0), None

            (out, _), _ = jax.lax.scan(
                body, (x, jnp.zeros_like(x)), jnp.arange(10)
            )
            return out

        out_scan = run(x)
        out_loop = self._integrate(dpm_edm, 10, x, multistep=True)
        np.testing.assert_allclose(
            np.asarray(out_scan), np.asarray(out_loop), rtol=1e-4, atol=1e-4
        )


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


class TestUniPC:
    """UniPC order-2 predictor-corrector (schedulers/unipc.py)."""

    def test_tables_match_dpm_grid(self):
        a, b = unipc.make_tables(14), dpm.make_tables(14)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_chain_recovers_x0_with_oracle(self):
        """Constant-x0 oracle: the exponential integrator is exact for
        constant x0, so the chain lands on x0 to float noise — tighter
        than the dpm test's 1e-2 (the corrector contributes nothing here
        but must not perturb)."""
        key = jax.random.PRNGKey(11)
        x0 = jax.random.normal(key, (1, 4, 4, 4))
        t = unipc.make_tables(20)
        eps0 = jax.random.normal(jax.random.fold_in(key, 3), (1, 4, 4, 4))
        a0 = t.alpha_prod[0]
        x = jnp.sqrt(a0) * x0 + jnp.sqrt(1 - a0) * eps0
        state = unipc.init_state(x)
        for i in range(20):
            a = t.alpha_prod[i]
            eps_i = (x - jnp.sqrt(a) * x0) / jnp.sqrt(1 - a)
            x, state = unipc.step_multistep(x, eps_i, jnp.asarray(i), state, t)
        np.testing.assert_allclose(x, x0, atol=1e-3)

    @staticmethod
    def _integrate(mod, n, x_init, corrector=True):
        t = mod.make_tables(n)

        def oracle(x, i):
            # nonlinear ODE in x0-space: implied x0 = tanh(x)
            a = t.alpha_prod[i]
            return (x - jnp.sqrt(a) * jnp.tanh(x)) / jnp.sqrt(1 - a)

        x = x_init * float(t.init_noise_sigma)
        state = mod.init_state(x)
        kw = ({"cfg": unipc.UniPCConfig(corrector=corrector)}
              if mod is unipc else {})
        for i in range(n):
            x, state = mod.step_multistep(
                x, oracle(x, jnp.asarray(i)), jnp.asarray(i), state, t, **kw
            )
        return x

    def test_corrector_tightens_and_beats_dpm(self):
        """On a nonlinear oracle ODE (reference: an INDEPENDENT solver,
        128-step dpm — error floor ~1e-3 vs the ~0.03 signals):
        (a) error shrinks >= 2x per step-count doubling (the integer DDPM
        grid's uneven lambda gaps cap the observed rate below the clean
        4x the Karras-grid dpm_edm test sees — dpm measures the same here),
        (b) the UniC corrector strictly beats corrector-off,
        (c) UniPC <= DPM-Solver++(2M) error at equal evals (measured
        strictly better at 8/16/32 on this seed: .0914/.0334/.0189 vs
        .0959/.0490/.0302)."""
        key = jax.random.PRNGKey(5)
        x_init = jax.random.normal(key, (1, 2, 4, 4, 2))
        ref = self._integrate(dpm, 128, x_init)
        scale = float(jnp.mean(jnp.abs(ref)))

        def err(mod, n, **kw):
            out = self._integrate(mod, n, x_init, **kw)
            return float(jnp.mean(jnp.abs(out - ref))) / scale

        e8, e16 = err(unipc, 8), err(unipc, 16)
        assert e16 < e8 / 2.0, (e8, e16)
        e8_nc = err(unipc, 8, corrector=False)
        assert e8 < e8_nc, (e8, e8_nc)
        for n in (8, 16):
            assert err(unipc, n) < 1.05 * err(dpm, n), n

    def test_variable_steps_terminal_guard(self):
        """Padded tables (edge-repeat) keep the sigma-value terminal
        detection correct: running n<max steps through padded tables equals
        the unpadded n-step chain."""
        from vdx.schedulers.common import pad_tables

        n, mx = 6, 10
        t_pad = pad_tables(unipc.make_tables(n), n, mx)
        t = unipc.make_tables(n)
        key = jax.random.PRNGKey(2)
        x = jax.random.normal(key, (1, 3, 3, 2))
        xa, sa = x, unipc.init_state(x)
        xb, sb = x, unipc.init_state(x)
        for i in range(n):
            f = jnp.tanh(xa)
            xa, sa = unipc.step_multistep(xa, f, jnp.asarray(i), sa, t)
            xb, sb = unipc.step_multistep(xb, f, jnp.asarray(i), sb, t_pad)
        np.testing.assert_allclose(xa, xb, rtol=1e-6)
