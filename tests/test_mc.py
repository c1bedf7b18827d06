"""VMC/DMC tests against the exact harmonic-oscillator ground state
(E_0 = D/2, alpha = 0.5 — the reference's physics oracle, vmc_dmc...:173-175,
printed there, asserted here)."""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the fast tier

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax_tpus_benchmark_physics_simulation_tpu.core.config import VMCDMCConfig, override
from jax_tpus_benchmark_physics_simulation_tpu.mc import (
    HarmonicOscillator,
    generic_local_energy,
    make_metropolis_sweep,
    equilibrate,
    resample_multinomial,
    resample_systematic,
    run_dmc,
    run_vmc,
)
from jax_tpus_benchmark_physics_simulation_tpu.models import quantum_oscillator


class TestModel:
    def test_local_energy_constant_at_exact_alpha(self):
        """At alpha = 0.5 the trial wavefunction is exact: E_L(x) = D/2 for
        every x (zero-variance principle)."""
        model = HarmonicOscillator(dim=3)
        x = jax.random.normal(jax.random.PRNGKey(0), (100, 3))
        e = model.local_energy(jnp.asarray(0.5), x)
        np.testing.assert_allclose(np.asarray(e), 1.5, rtol=1e-5)

    def test_closed_form_matches_autodiff(self):
        """Analytic E_L (vmc_dmc...:36-47) == generic autodiff E_L."""
        model = HarmonicOscillator(dim=3)
        e_l_generic = generic_local_energy(model.log_psi, model.potential)
        alpha = jnp.asarray(0.37)
        xs = jax.random.normal(jax.random.PRNGKey(1), (50, 3))
        e_closed = model.local_energy(alpha, xs)
        e_auto = jax.vmap(e_l_generic, in_axes=(None, 0))(alpha, xs)
        np.testing.assert_allclose(np.asarray(e_closed), np.asarray(e_auto), rtol=1e-4)

    def test_drift_force_is_grad_log_psi(self):
        model = HarmonicOscillator(dim=2)
        alpha = jnp.asarray(0.7)
        x = jnp.array([0.3, -1.2])
        expected = jax.grad(model.log_psi, argnums=1)(alpha, x)
        np.testing.assert_allclose(
            np.asarray(model.drift_force(alpha, x)), np.asarray(expected), rtol=1e-6
        )


class TestMetropolis:
    def test_samples_gaussian_density(self):
        """Metropolis on |psi|^2 = exp(-2 alpha x^2) gives Var = 1/(4 alpha)."""
        model = HarmonicOscillator(dim=1)
        sweep = make_metropolis_sweep(model.log_psi, step_size=2.0)
        alpha = jnp.asarray(0.5)
        key = jax.random.PRNGKey(2)
        walkers = jax.random.normal(key, (20000, 1))
        walkers, acc = jax.jit(lambda w, k: equilibrate(sweep, w, alpha, k, 200))(
            walkers, jax.random.PRNGKey(3)
        )
        var = float(jnp.var(walkers))
        np.testing.assert_allclose(var, 1.0 / (4 * 0.5), rtol=0.05)
        assert 0.1 < float(acc) < 0.9


class TestResampling:
    @pytest.mark.parametrize("resample", [resample_multinomial, resample_systematic])
    def test_uniform_weights_preserve_distribution(self, resample):
        walkers = jax.random.normal(jax.random.PRNGKey(4), (5000, 2))
        w = jnp.ones(5000)
        out = resample(jax.random.PRNGKey(5), walkers, w)
        assert out.shape == walkers.shape
        np.testing.assert_allclose(
            float(jnp.mean(out)), float(jnp.mean(walkers)), atol=0.05
        )

    @pytest.mark.parametrize("resample", [resample_multinomial, resample_systematic])
    def test_concentrated_weight_selects_walker(self, resample):
        walkers = jnp.arange(100, dtype=jnp.float32).reshape(100, 1)
        w = jnp.zeros(100).at[42].set(1.0)
        out = resample(jax.random.PRNGKey(6), walkers, w)
        np.testing.assert_allclose(np.asarray(out), 42.0)

    @pytest.mark.parametrize("resample", [resample_multinomial, resample_systematic])
    def test_nan_weights_sanitized(self, resample):
        walkers = jax.random.normal(jax.random.PRNGKey(7), (64, 1))
        w = jnp.full(64, jnp.nan)
        out = resample(jax.random.PRNGKey(8), walkers, w)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_systematic_expected_counts(self):
        """Systematic resampling: walker counts within 1 of N * w_i."""
        walkers = jnp.arange(4, dtype=jnp.float32).reshape(4, 1)
        w = jnp.array([0.4, 0.3, 0.2, 0.1])
        out = resample_systematic(jax.random.PRNGKey(9), jnp.tile(walkers, (25, 1))[:4], w)
        out = resample_systematic(jax.random.PRNGKey(9), walkers, w)
        counts = np.array([(np.asarray(out) == i).sum() for i in range(4)])
        expected = 4 * np.asarray(w)
        assert np.all(np.abs(counts - expected) <= 1.0)


class TestVMC:
    def test_converges_to_exact_alpha(self):
        cfg = override(
            VMCDMCConfig(),
            n_walkers=2000,
            n_epochs=300,
            n_equil=20,
            dim=3,
            epoch_chunk=100,
        )
        model = HarmonicOscillator(dim=3)
        res = run_vmc(model, cfg)
        assert abs(float(res.params) - 0.5) < 0.05, float(res.params)
        assert abs(float(res.energy_history[-1]) - 1.5) < 0.05
        assert res.energy_history.shape == (300,)

    def test_key_hygiene_no_reuse(self):
        """Different seeds give different trajectories; same seed reproduces."""
        cfg = override(VMCDMCConfig(), n_walkers=256, n_epochs=5, n_equil=5, epoch_chunk=5)
        model = HarmonicOscillator(dim=2)
        a = run_vmc(model, override(cfg, seed=1))
        b = run_vmc(model, override(cfg, seed=1))
        c = run_vmc(model, override(cfg, seed=2))
        np.testing.assert_allclose(
            np.asarray(a.energy_history), np.asarray(b.energy_history)
        )
        assert not np.allclose(np.asarray(a.energy_history), np.asarray(c.energy_history))


class TestDMC:
    @pytest.mark.parametrize("resampler", ["systematic", "multinomial"])
    def test_ground_state_energy(self, resampler):
        cfg = override(
            VMCDMCConfig(),
            n_walkers=4000,
            n_dmc=400,
            dmc_dt=0.01,
            dim=3,
            resampler=resampler,
        )
        model = HarmonicOscillator(dim=3)
        key = jax.random.PRNGKey(11)
        walkers = jax.random.normal(key, (cfg.n_walkers, 3))
        res = run_dmc(model, jnp.asarray(0.45), walkers, jax.random.PRNGKey(12), cfg)
        mean, err = res.mean_energy(burn_in=100)
        assert abs(float(mean) - 1.5) < 0.05, (resampler, float(mean))

    def test_snapshots(self):
        cfg = override(
            VMCDMCConfig(), n_walkers=128, n_dmc=50, dim=2, snapshot_every=10
        )
        model = HarmonicOscillator(dim=2)
        walkers = jax.random.normal(jax.random.PRNGKey(13), (128, 2))
        res = run_dmc(model, jnp.asarray(0.5), walkers, jax.random.PRNGKey(14), cfg)
        assert res.walker_snapshots.shape == (5, 128, 2)
        assert res.energy_history.shape == (50,)


def test_quantum_workload_end_to_end():
    cfg = override(
        VMCDMCConfig(),
        n_walkers=1000,
        n_epochs=150,
        n_equil=10,
        n_dmc=150,
        dim=2,
        epoch_chunk=50,
    )
    res = quantum_oscillator.run(cfg)
    assert abs(res.vmc_alpha - 0.5) < 0.1
    mean, _ = res.dmc.mean_energy(burn_in=50)
    assert abs(float(mean) - 1.0) < 0.1  # E_0 = D/2 = 1.0 for dim=2


class TestAnharmonic:
    """Beyond-reference model: V += lam*sum(x^4), autodiff local energy,
    pytree {alpha, beta} trial (VERDICT round 1, item 9)."""

    def test_local_energy_matches_generic_formula(self):
        from jax_tpus_benchmark_physics_simulation_tpu.mc.models import (
            AnharmonicOscillator,
        )

        m = AnharmonicOscillator(dim=2, lam=0.3)
        params = m.init_params(0.6)
        x = jax.random.normal(jax.random.PRNGKey(0), (64, 2))
        e = m.local_energy(params, x)
        # hand-derived check: for log psi = -a r^2 - b sum x^4,
        # grad_i = -2a x_i - 4b x_i^3; lap = sum(-2a - 12 b x_i^2)
        a, b = params["alpha"], params["beta"]
        g = -2 * a * x - 4 * b * x**3
        lap = jnp.sum(-2 * a - 12 * b * x**2, axis=-1)
        v = 0.5 * jnp.sum(x**2, axis=-1) + 0.3 * jnp.sum(x**4, axis=-1)
        expected = -0.5 * (lap + jnp.sum(g * g, axis=-1)) + v
        np.testing.assert_allclose(np.asarray(e), np.asarray(expected), rtol=1e-5)

    def test_oracle_limits(self):
        from jax_tpus_benchmark_physics_simulation_tpu.mc.models import (
            anharmonic_ground_state_1d,
        )

        # lam -> 0 recovers the harmonic E_0 = 0.5
        assert abs(anharmonic_ground_state_1d(0.0) - 0.5) < 1e-4
        # monotone in lam (stiffer well raises the ground state)
        assert anharmonic_ground_state_1d(0.3) > anharmonic_ground_state_1d(0.1)

    def test_vmc_dmc_converge_to_diagonalization_oracle(self):
        cfg = override(
            VMCDMCConfig(),
            potential="anharmonic",
            lam=0.2,
            dim=1,
            n_walkers=1000,
            n_epochs=200,
            n_equil=10,
            epoch_chunk=50,
            lr=0.05,
            n_dmc=150,
            prng_impl="threefry",
        )
        res = quantum_oscillator.run(cfg)
        assert res.exact_alpha is None
        assert abs(res.vmc_energy - res.exact_energy) < 2e-2
        mean, _ = res.dmc.mean_energy()
        assert abs(float(mean) - res.exact_energy) < 1e-2
        # beta learned away from its init (the quartic term is being used)
        assert float(res.vmc.params["beta"]) != 0.05
