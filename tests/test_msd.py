"""MSD / self-diffusion observable (observables/msd.py).

Oracles: (1) ballistic free streaming — MSD(t) = <v^2> t^2 exactly, and the
unwrapper must reconstruct paths that cross the periodic boundary many
times; (2) an exact random walk where D is known analytically.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax_tpus_benchmark_physics_simulation_tpu.ops.observables.msd import (
    diffusion_coefficient,
    mean_squared_displacement,
    unwrap_trajectory,
)


def test_unwrap_reconstructs_ballistic_paths():
    box = 10.0
    n, s, dim = 64, 50, 2
    key = jax.random.PRNGKey(0)
    r0 = jax.random.uniform(key, (n, dim)) * box
    v = jax.random.normal(jax.random.fold_in(key, 1), (n, dim))
    dt = 0.9  # many boundary crossings over 50 steps (|v| ~ 1, box 10)
    t = jnp.arange(s)[:, None, None] * dt
    true_traj = r0[None] + v[None] * t
    wrapped = jnp.mod(true_traj, box)
    u = unwrap_trajectory(wrapped, box)
    # unwrapped trajectory matches the true one up to the (wrapped) start
    np.testing.assert_allclose(
        np.asarray(u - u[0]), np.asarray(true_traj - true_traj[0]), atol=1e-4
    )


def test_ballistic_msd_is_quadratic():
    box = 10.0
    n, s, dim = 256, 40, 3
    key = jax.random.PRNGKey(2)
    r0 = jax.random.uniform(key, (n, dim)) * box
    v = jax.random.normal(jax.random.fold_in(key, 3), (n, dim))
    dt = 0.3
    t = jnp.arange(s)[:, None, None] * dt
    wrapped = jnp.mod(r0[None] + v[None] * t, box)
    msd = mean_squared_displacement(wrapped, box)
    v2 = float(jnp.mean(jnp.sum(v**2, axis=-1)))
    for k in (1, 5, 20, 39):
        assert float(msd[k]) == pytest.approx(v2 * (k * dt) ** 2, rel=1e-4)


def test_random_walk_diffusion_coefficient():
    # exact lattice-free random walk: step ~ N(0, 2 D dt) per axis
    d_true, dt, dim = 0.25, 0.1, 2
    n, s = 2048, 120
    box = 50.0
    key = jax.random.PRNGKey(4)
    steps = np.sqrt(2 * d_true * dt) * jax.random.normal(key, (s - 1, n, dim))
    traj = jnp.concatenate(
        [jnp.zeros((1, n, dim)), jnp.cumsum(steps, axis=0)], axis=0
    ) + box / 2
    wrapped = jnp.mod(traj, box)
    msd = mean_squared_displacement(wrapped, box)
    d_est, resid = diffusion_coefficient(msd, dt, dim)
    assert float(d_est) == pytest.approx(d_true, rel=0.1)
    assert float(resid) < 0.1 * float(msd[-1])


def test_subset_estimator_matches_full():
    box = 20.0
    n, s, dim = 3000, 20, 2
    key = jax.random.PRNGKey(5)
    steps = 0.05 * jax.random.normal(key, (s - 1, n, dim))
    traj = jnp.cumsum(jnp.concatenate([jnp.zeros((1, n, dim)), steps]), axis=0)
    wrapped = jnp.mod(traj + box / 2, box)
    full = mean_squared_displacement(wrapped, box, max_particles=0)
    sub = mean_squared_displacement(wrapped, box, max_particles=1000)
    np.testing.assert_allclose(
        np.asarray(sub[1:]), np.asarray(full[1:]), rtol=0.15
    )


def test_lj_fluid_transport_end_to_end():
    from jax_tpus_benchmark_physics_simulation_tpu.core.config import (
        MDConfig,
        override,
    )
    from jax_tpus_benchmark_physics_simulation_tpu.models import lj_fluid

    cfg = override(
        MDConfig(),
        n=1024,
        cutoff=2.5,
        force_impl="grid",
        init="lattice",
        eq_steps=500,
        prod_steps=1000,
        sample_every=100,
    )
    res = lj_fluid.run(cfg)
    msd, d_coef, resid = res.transport()
    assert msd is not None and msd.shape[0] == 10
    assert np.isfinite(d_coef)
    # dense LJ fluid: diffusion well below free streaming, above frozen
    assert 0.0 <= d_coef < 1.0
