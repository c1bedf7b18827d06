"""End-to-end tests for the LJ fluid MD workload: reference parity of the
step map, energy conservation, momentum, and RDF sanity."""

import jax
import jax.numpy as jnp
import numpy as np

from jax_tpus_benchmark_physics_simulation_tpu.core.config import MDConfig, override
from jax_tpus_benchmark_physics_simulation_tpu.models import lj_fluid
from jax_tpus_benchmark_physics_simulation_tpu.ops.forces import minimum_image


def reference_verlet_trajectory(cfg: MDConfig, r0, v0, n_steps):
    """Independent transcription of molecular_dynamics...:46-75."""
    box, sigma, epsilon, dt, n = cfg.box_size, cfg.sigma, cfg.epsilon, cfg.dt, cfg.n

    def total_energy(r):
        dr = r[:, None, :] - r[None, :, :]
        dr = minimum_image(dr, box)
        r2 = jnp.sum(dr**2, axis=-1)
        mask = ~jnp.eye(n, dtype=bool)
        r2s = jnp.where(mask, r2, 1.0)
        s6 = (sigma**2 / r2s) ** 3
        pair = 4.0 * epsilon * (s6**2 - s6)
        return 0.5 * jnp.sum(jnp.where(mask, pair, 0.0))

    force = jax.jit(jax.grad(lambda r: -total_energy(r)))

    r, v = r0, v0
    for _ in range(n_steps):
        f = force(r)
        v_half = v + 0.5 * f * dt
        r = jnp.mod(r + v_half * dt, box)
        f_new = force(r)
        v = v_half + 0.5 * f_new * dt
    return r, v


def small_cfg(**kw):
    # lattice init: no particle overlaps, so forces are O(1) and parity is
    # testable (uniform init can start with |F| ~ 1e20 from overlaps).
    base = dict(n=36, eq_steps=200, prod_steps=200, sample_every=20, init="lattice")
    base.update(kw)
    return override(MDConfig(), **base)


class TestReferenceParity:
    def test_step_map_matches_reference(self):
        """Our cached-force Verlet over the engine == reference transcription
        for 100 steps from the same IC."""
        cfg = small_cfg()
        state = lj_fluid.init_state(cfg)
        init_fn, step_fn, _ = lj_fluid.build_step(cfg)
        s = init_fn(state)
        for _ in range(100):
            s = step_fn(s)
        r_ref, v_ref = reference_verlet_trajectory(cfg, state.position, state.velocity, 100)
        np.testing.assert_allclose(np.asarray(s.position), np.asarray(r_ref), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(s.velocity), np.asarray(v_ref), rtol=2e-3, atol=2e-3)

    def test_init_state_matches_reference_prng(self):
        """Same key-split structure as molecular_dynamics...:133-136."""
        cfg = small_cfg(init="uniform")
        state = lj_fluid.init_state(cfg)
        key = jax.random.PRNGKey(cfg.seed)
        key, r_key, v_key = jax.random.split(key, 3)
        r_ref = jax.random.uniform(r_key, (cfg.n, 2)) * cfg.box_size
        v_ref = jax.random.normal(v_key, (cfg.n, 2)) * jnp.sqrt(cfg.kt)
        np.testing.assert_allclose(np.asarray(state.position), np.asarray(r_ref), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(state.velocity), np.asarray(v_ref), rtol=1e-6)


class TestPhysics:
    def test_energy_conservation_nve(self):
        """Total energy drift over the production run stays small (the
        BASELINE.md invariant the reference never checked)."""
        cfg = small_cfg(eq_steps=500, prod_steps=2000, sample_every=50, dt=5e-4)
        res = lj_fluid.run(cfg)
        assert res.energy_drift < 5e-3, f"drift {res.energy_drift}"

    def test_momentum_conservation(self):
        cfg = small_cfg()
        state = lj_fluid.init_state(cfg)
        init_fn, step_fn, _ = lj_fluid.build_step(cfg)
        s = init_fn(state)
        p0 = np.asarray(jnp.sum(s.velocity, axis=0))
        from jax_tpus_benchmark_physics_simulation_tpu.core.runner import run_steps

        s = jax.jit(lambda st: run_steps(step_fn, st, 500))(s)
        p1 = np.asarray(jnp.sum(s.velocity, axis=0))
        np.testing.assert_allclose(p1, p0, atol=1e-3)

    def test_pbc_invariance(self):
        """Shifting all particles by a box vector leaves forces unchanged.

        Uses a jittered lattice: on a perfect lattice some pairs sit at
        exactly box/2 where the minimum-image round() is ambiguous.
        """
        cfg = small_cfg()
        lj = lj_fluid.make_potential(cfg)
        r = lj_fluid.init_state(cfg).position
        r = r + 0.05 * jax.random.normal(jax.random.PRNGKey(9), r.shape)
        f0 = lj.force(r)
        f1 = lj.force(r + cfg.box_size)
        np.testing.assert_allclose(np.asarray(f0), np.asarray(f1), rtol=1e-3, atol=1e-3)


class TestRDF:
    def test_rdf_ideal_gas_is_flat(self):
        """Random (ideal-gas) configurations give g(r) ~ 1."""
        cfg = override(MDConfig(), n=256)
        key = jax.random.PRNGKey(0)
        snaps = jax.random.uniform(key, (64, cfg.n, 2)) * cfg.box_size
        r, g = lj_fluid.rdf(cfg, snaps)
        # away from r=0 noise, mean g(r) ~ 1
        sel = r > 0.5
        assert abs(float(jnp.mean(g[sel])) - 1.0) < 0.05

    def test_rdf_matches_reference_histogram(self):
        """Bucketize+segment-sum histogram == reference triu+jnp.histogram
        (molecular_dynamics...:108-131) on identical snapshots."""
        cfg = override(MDConfig(), n=64)
        box = cfg.box_size
        key = jax.random.PRNGKey(1)
        snaps = jax.random.uniform(key, (8, cfg.n, 2)) * box
        r_max = box / 2.0
        nbins = int(r_max / 0.05)

        ours_r, ours_g = lj_fluid.rdf(cfg, snaps)

        # reference transcription
        r_bins = jnp.linspace(0, r_max, nbins + 1)
        shell = jnp.pi * (r_bins[1:] ** 2 - r_bins[:-1] ** 2)
        rho_pairs = (cfg.n * (cfg.n - 1) / 2.0) / (box**2)
        ideal = rho_pairs * shell

        def hist(r_snap):
            dr = r_snap[:, None, :] - r_snap[None, :, :]
            dr = minimum_image(dr, box)
            r2 = jnp.sum(dr**2, axis=-1)
            iu = jnp.triu_indices(cfg.n, k=1)
            flat = jnp.sqrt(r2[iu])
            h, _ = jnp.histogram(flat, bins=r_bins)
            return h

        ref_g = jnp.mean(jnp.stack([hist(s) for s in snaps]), axis=0) / ideal
        np.testing.assert_allclose(np.asarray(ours_g), np.asarray(ref_g), rtol=1e-4, atol=1e-6)


def test_run_end_to_end():
    cfg = small_cfg()
    res = lj_fluid.run(cfg)
    assert res.r_history.shape == (10, 36, 2)
    assert np.all(np.isfinite(np.asarray(res.r_history)))
    assert res.particle_steps_per_sec > 0
    assert res.rdf_g.shape == res.rdf_r.shape
