"""Pallas blockwise kernels vs the dense XLA oracles (interpret mode on the
CPU test mesh; the identical kernel code compiles via Mosaic on TPU)."""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the fast tier

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax_tpus_benchmark_physics_simulation_tpu.ops.forces import Gravity, LennardJones
from jax_tpus_benchmark_physics_simulation_tpu.ops.kernels import (
    make_gravity_accel_pallas,
    make_lj_energy_pallas,
    make_lj_force_pallas,
)


def lattice_positions(n, box, dim=2, jitter=0.05, seed=0):
    per_side = int(np.ceil(n ** (1.0 / dim)))
    spacing = box / per_side
    grid = jnp.arange(per_side, dtype=jnp.float32) * spacing + 0.5 * spacing
    mesh = jnp.stack(jnp.meshgrid(*([grid] * dim), indexing="ij"), axis=-1)
    r = mesh.reshape(-1, dim)[:n]
    return r + jitter * jax.random.normal(jax.random.PRNGKey(seed), r.shape)


class TestLJPallas:
    @pytest.mark.parametrize("n,block", [(100, 64), (256, 128), (300, 128)])
    def test_matches_dense_oracle_pbc(self, n, block):
        box = float(np.sqrt(n / 0.8))
        pos = lattice_positions(n, box)
        lj = LennardJones(box=box)
        f_pallas = make_lj_force_pallas(n, box=box, block_size=block)(pos)
        f_dense = lj.force(pos)
        np.testing.assert_allclose(
            np.asarray(f_pallas), np.asarray(f_dense), rtol=1e-4, atol=1e-4
        )

    def test_matches_dense_no_pbc_3d(self):
        n = 128
        pos = lattice_positions(n, 8.0, dim=3)
        lj = LennardJones()
        f_pallas = make_lj_force_pallas(n, block_size=64)(pos)
        np.testing.assert_allclose(
            np.asarray(f_pallas), np.asarray(lj.force(pos)), rtol=1e-4, atol=1e-4
        )

    def test_cutoff_matches_dense(self):
        n, box = 144, float(np.sqrt(144 / 0.8))
        pos = lattice_positions(n, box, seed=3)
        lj = LennardJones(box=box, cutoff=2.5)
        f_pallas = make_lj_force_pallas(n, box=box, cutoff=2.5, block_size=64)(pos)
        np.testing.assert_allclose(
            np.asarray(f_pallas), np.asarray(lj.force(pos)), rtol=1e-4, atol=1e-4
        )

    def test_energy_and_grad(self):
        n, box = 64, float(np.sqrt(64 / 0.5))
        pos = lattice_positions(n, box, seed=5)
        lj = LennardJones(box=box)
        e_fn = make_lj_energy_pallas(n, box=box, block_size=64)
        np.testing.assert_allclose(float(e_fn(pos)), float(lj.energy(pos)), rtol=1e-5)
        g_pallas = jax.grad(e_fn)(pos)
        g_dense = jax.grad(lj.energy)(pos)
        np.testing.assert_allclose(
            np.asarray(g_pallas), np.asarray(g_dense), rtol=1e-4, atol=1e-4
        )

    def test_jit_and_vmap_compose(self):
        n, box = 64, 10.0
        f_fn = jax.jit(make_lj_force_pallas(n, box=box, block_size=64))
        pos = lattice_positions(n, box)
        f1 = f_fn(pos)
        f2 = f_fn(pos)
        np.testing.assert_allclose(np.asarray(f1), np.asarray(f2))


class TestGravityPallas:
    def test_matches_dense_oracle(self):
        n = 96
        key = jax.random.PRNGKey(7)
        pos = jax.random.normal(key, (n, 2)) * 10.0
        m = jnp.abs(jax.random.normal(jax.random.PRNGKey(8), (n,))) + 0.5
        grav = Gravity(mode="plummer", softening=0.1)
        a_pallas = make_gravity_accel_pallas(n, softening=0.1, block_size=64)(pos, m)
        np.testing.assert_allclose(
            np.asarray(a_pallas), np.asarray(grav.acceleration(pos, m)), rtol=1e-4, atol=1e-5
        )

    def test_potential_matches_dense(self):
        n = 64
        pos = jax.random.normal(jax.random.PRNGKey(9), (n, 3)) * 5.0
        m = jnp.ones((n,))
        grav = Gravity(mode="plummer", softening=0.2)
        accel_fn = make_gravity_accel_pallas(
            n, softening=0.2, block_size=64, with_potential=True
        )
        _, phi = accel_fn(pos, m)
        e_total = 0.5 * jnp.sum(m * phi)
        np.testing.assert_allclose(float(e_total), float(grav.energy(pos, m)), rtol=1e-4)
