"""Adaptive Dopri5 tests: accuracy vs tolerance, step adaptation, N-body
integration parity with fine-step RK4."""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the fast tier

import jax
import jax.numpy as jnp
import numpy as np

from jax_tpus_benchmark_physics_simulation_tpu.core.config import NBodyConfig, override
from jax_tpus_benchmark_physics_simulation_tpu.models import nbody_merger as nb
from jax_tpus_benchmark_physics_simulation_tpu.ops.integrators_adaptive import (
    dopri5_integrate,
)


class TestDopri5:
    def test_exponential(self):
        """y' = -y -> e^-t at requested tolerance."""
        ts = jnp.linspace(0.0, 3.0, 7)
        res = dopri5_integrate(lambda t, y: -y, jnp.array([1.0]), ts, rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(
            np.asarray(res.ys[:, 0]), np.exp(-np.asarray(ts)), rtol=1e-5
        )
        assert not bool(res.steps_exceeded)

    def test_harmonic_oscillator_energy(self):
        """x'' = -x: energy conserved to tolerance over many periods."""
        def ode(t, y):
            return jnp.array([y[1], -y[0]])

        ts = jnp.linspace(0.0, 20 * np.pi, 41)
        res = dopri5_integrate(ode, jnp.array([1.0, 0.0]), ts, rtol=1e-7, atol=1e-9)
        e = np.asarray(0.5 * (res.ys[:, 0] ** 2 + res.ys[:, 1] ** 2))
        np.testing.assert_allclose(e, 0.5, rtol=1e-4)

    def test_tolerance_controls_error(self):
        def ode(t, y):
            return jnp.array([y[1], -y[0]])

        ts = jnp.linspace(0.0, 10.0, 3)

        def final_err(rtol):
            res = dopri5_integrate(ode, jnp.array([1.0, 0.0]), ts, rtol=rtol, atol=rtol)
            return abs(float(res.ys[-1, 0]) - np.cos(10.0)), int(res.steps_taken)

        e_loose, n_loose = final_err(1e-3)
        e_tight, n_tight = final_err(1e-7)
        assert e_tight < e_loose
        assert n_tight > n_loose  # tighter tolerance takes more steps

    def test_stiff_burst_adapts(self):
        """Step count concentrates where dynamics are fast: y' = -100 y on
        [0, 0.1] vs y' ~ 0 later — must not blow up nor exceed bounds."""
        def ode(t, y):
            return -100.0 * y * jnp.exp(-50.0 * t)

        ts = jnp.linspace(0.0, 1.0, 5)
        res = dopri5_integrate(ode, jnp.array([1.0]), ts, rtol=1e-6, atol=1e-9)
        assert not bool(res.steps_exceeded)
        assert np.all(np.isfinite(np.asarray(res.ys)))

    def test_max_steps_flag(self):
        """Unreachable tolerance budget raises the loud flag."""
        res = dopri5_integrate(
            lambda t, y: -y,
            jnp.array([1.0]),
            jnp.array([0.0, 10.0]),
            rtol=1e-12,
            atol=1e-14,
            max_steps_per_interval=3,
        )
        assert bool(res.steps_exceeded)

    def test_fsal_eval_count(self):
        """FSAL: each attempted step costs 6 fresh ODE evals (not 7), plus
        the single k1 bootstrap — counted exactly by a traced call counter
        and reported in ``ode_evals``."""
        counter = {"n": 0}

        def ode(t, y):
            counter["n"] += 1  # trace-time count: while_loop body traces once
            return jnp.array([y[1], -y[0]])

        ts = jnp.linspace(0.0, 10.0, 3)
        res = dopri5_integrate(ode, jnp.array([1.0, 0.0]), ts, rtol=1e-7, atol=1e-9)
        # the traced body contains exactly 6 evals (k2..k7); k1 comes from
        # the carry, bootstrapped by 1 eval outside the loop
        assert counter["n"] == 6 + 1
        # ode_evals accounting: 1 bootstrap + 6 per attempted step, and at
        # least the accepted-step count's worth of attempts
        n_attempts = (int(res.ode_evals) - 1) // 6
        assert int(res.ode_evals) == 1 + 6 * n_attempts
        assert n_attempts >= int(res.steps_taken)
        # trajectory still correct with FSAL reuse
        np.testing.assert_allclose(float(res.ys[-1, 0]), np.cos(10.0), atol=1e-5)

    def test_jit_compatible(self):
        ts = jnp.linspace(0.0, 1.0, 4)
        f = jax.jit(
            lambda y0: dopri5_integrate(lambda t, y: -y, y0, ts, rtol=1e-6).ys
        )
        out = f(jnp.array([2.0]))
        np.testing.assert_allclose(float(out[-1, 0]), 2 * np.exp(-1.0), rtol=1e-4)


class TestNBodyDopri5:
    def test_matches_fine_rk4(self):
        """Adaptive trajectory ~ fixed RK4 at 10x resolution (pre-chaos)."""
        base = dict(sim_time=20.0, compute_chaos=False)
        cfg_d = override(NBodyConfig(), integrator="dopri5", num_steps=50, rtol=1e-8, atol=1e-10, **base)
        cfg_r = override(NBodyConfig(), integrator="rk4", num_steps=500, **base)
        masses = jnp.asarray(cfg_d.masses)
        y0 = nb.init_state_flat(cfg_d)
        ys_d = nb.simulate(cfg_d, y0, masses)
        ys_r = nb.simulate(cfg_r, y0, masses)
        np.testing.assert_allclose(
            np.asarray(ys_d[-1]), np.asarray(ys_r[-1]), rtol=1e-3, atol=1e-3
        )

    def test_waveform_pipeline(self):
        cfg = override(
            NBodyConfig(), integrator="dopri5", sim_time=20.0, num_steps=50,
            compute_chaos=False,
        )
        ys, t, pos, h = nb.simulate_with_waveform(
            cfg, nb.init_state_flat(cfg), jnp.asarray(cfg.masses)
        )
        assert h.shape == (51,)
        assert np.all(np.isfinite(np.asarray(h)))
