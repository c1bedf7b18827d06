"""Unit tests for force fields against analytic results and autodiff.

Oracles per SURVEY.md §4: LJ pair force is zero at r = sigma * 2^(1/6);
analytic forces must equal -grad(energy); gravity modes must reproduce the
reference regularizations (nbody...:54-67, three_particles...:25-37).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax_tpus_benchmark_physics_simulation_tpu.ops.forces import (
    Gravity,
    LennardJones,
    Lorentz2D,
    minimum_image,
)


class TestLennardJones:
    def test_minimum_at_r_min(self):
        """F = 0 at the LJ minimum r = sigma * 2^(1/6)."""
        lj = LennardJones(sigma=1.0, epsilon=1.0)
        r_min = 2.0 ** (1.0 / 6.0)
        pos = jnp.array([[0.0, 0.0], [r_min, 0.0]])
        f = lj.force(pos)
        np.testing.assert_allclose(np.asarray(f), 0.0, atol=1e-5)

    def test_pair_energy_at_sigma(self):
        """U(sigma) = 0 and U(r_min) = -epsilon for a single pair."""
        lj = LennardJones(sigma=1.0, epsilon=1.0)
        e_sigma = lj.energy(jnp.array([[0.0, 0.0], [1.0, 0.0]]))
        np.testing.assert_allclose(float(e_sigma), 0.0, atol=1e-6)
        r_min = 2.0 ** (1.0 / 6.0)
        e_min = lj.energy(jnp.array([[0.0, 0.0], [r_min, 0.0]]))
        np.testing.assert_allclose(float(e_min), -1.0, atol=1e-6)

    @pytest.mark.parametrize("box", [None, 5.0])
    def test_force_is_minus_grad_energy(self, box):
        lj = LennardJones(sigma=1.0, epsilon=1.0, box=box)
        key = jax.random.PRNGKey(0)
        pos = jax.random.uniform(key, (16, 2), minval=0.0, maxval=4.0)
        f_analytic = lj.force(pos)
        f_grad = -jax.grad(lj.energy)(pos)
        np.testing.assert_allclose(
            np.asarray(f_analytic), np.asarray(f_grad), rtol=1e-4, atol=1e-4
        )

    def test_newton_third_law(self):
        lj = LennardJones()
        pos = jax.random.uniform(jax.random.PRNGKey(1), (32, 2), maxval=6.0)
        f = lj.force(pos)
        # Tolerance relative to the force scale: random configs can have
        # near-overlaps with |F| ~ 1e6+, so an absolute atol is meaningless.
        scale = float(jnp.max(jnp.abs(f)))
        np.testing.assert_allclose(
            np.asarray(jnp.sum(f, axis=0)), 0.0, atol=1e-5 * max(scale, 1.0)
        )

    def test_reference_energy_formula(self):
        """Dense energy matches an independent transcription of
        molecular_dynamics...:50-62 on random configurations."""
        n, box = 20, 5.0
        lj = LennardJones(box=box)
        pos = jax.random.uniform(jax.random.PRNGKey(2), (n, 2), maxval=box)

        dr = pos[:, None, :] - pos[None, :, :]
        dr = minimum_image(dr, box)
        r2 = jnp.sum(dr**2, axis=-1)
        mask = ~jnp.eye(n, dtype=bool)
        r2s = jnp.where(mask, r2, 1.0)
        s6 = (1.0 / r2s) ** 3
        e_ref = 0.5 * jnp.sum(jnp.where(mask, 4.0 * (s6**2 - s6), 0.0))
        np.testing.assert_allclose(float(lj.energy(pos)), float(e_ref), rtol=1e-6)

    def test_cutoff_energy_shift(self):
        """With a cutoff, U(r) -> 0 continuously at r_c."""
        lj = LennardJones(cutoff=2.5)
        eps = 1e-3
        e_in = lj.energy(jnp.array([[0.0, 0.0], [2.5 - eps, 0.0]]))
        e_out = lj.energy(jnp.array([[0.0, 0.0], [2.5 + eps, 0.0]]))
        assert abs(float(e_in)) < 1e-3
        assert float(e_out) == 0.0


class TestGravity:
    def test_two_body_inverse_square(self):
        """|a| = G m / r^2 for a pair."""
        grav = Gravity(g=2.0, mode="min_distance")
        pos = jnp.array([[0.0, 0.0], [3.0, 0.0]])
        m = jnp.array([5.0, 7.0])
        a = grav.acceleration(pos, m)
        np.testing.assert_allclose(float(a[0, 0]), 2.0 * 7.0 / 9.0, rtol=1e-6)
        np.testing.assert_allclose(float(a[1, 0]), -2.0 * 5.0 / 9.0, rtol=1e-6)

    def test_matches_reference_nbody_loop(self):
        """Vectorized acceleration == unrolled double loop of nbody...:54-67."""
        g = 1.0
        key = jax.random.PRNGKey(3)
        pos = jax.random.normal(key, (5, 2)) * 50.0
        m = jnp.abs(jax.random.normal(jax.random.PRNGKey(4), (5,))) * 30.0

        acc_ref = np.zeros((5, 2))
        pos_np, m_np = np.asarray(pos), np.asarray(m)
        for i in range(5):
            for j in range(5):
                if i == j:
                    continue
                r_vec = pos_np[j] - pos_np[i]
                r = np.linalg.norm(r_vec)
                if r >= 1e-6:
                    acc_ref[i] += g * m_np[j] / r**3 * r_vec

        acc = Gravity(g=g, mode="min_distance").acceleration(pos, m)
        np.testing.assert_allclose(np.asarray(acc), acc_ref, rtol=1e-5)

    def test_matches_reference_em_formulation(self):
        """mode='r2_floor' == three_particles...:25-37 arithmetic."""
        pos = jnp.array([[0.0, 0.0], [1.0, 0.0], [0.5, 0.866]])
        m = jnp.array([1.0, 1.0, 1.0])
        g = 1.0

        r_diff = pos[None, :, :] - pos[:, None, :]
        r_norm_sq = jnp.sum(r_diff**2, axis=-1) + jnp.eye(3)
        r_norm_sq_safe = jnp.where(r_norm_sq < 1e-12, 1e-12, r_norm_sq)
        inv3 = r_norm_sq_safe ** (-1.5)
        acc_ref = jnp.sum(g * m[None, :, None] * r_diff * inv3[..., None], axis=1)
        # The reference includes the j==i term with r^2=1 -> dr=0, so it's 0.
        acc = Gravity(g=g, mode="r2_floor").acceleration(pos, m)
        np.testing.assert_allclose(np.asarray(acc), np.asarray(acc_ref), rtol=1e-5, atol=1e-7)

    def test_momentum_conservation(self):
        grav = Gravity(mode="plummer", softening=0.1)
        pos = jax.random.normal(jax.random.PRNGKey(5), (8, 2))
        m = jnp.abs(jax.random.normal(jax.random.PRNGKey(6), (8,))) + 0.5
        f = grav.force(pos, m)
        np.testing.assert_allclose(np.asarray(jnp.sum(f, axis=0)), 0.0, atol=1e-5)

    def test_plummer_energy_grad(self):
        """Analytic force == -grad(E), checked in genuine f64 (x64 mode —
        without it the float64 cast silently truncates to f32)."""
        with jax.enable_x64(True):
            grav = Gravity(mode="plummer", softening=0.3)
            pos = jax.random.normal(jax.random.PRNGKey(7), (6, 2), dtype=jnp.float64)
            m = jnp.ones((6,), dtype=jnp.float64)
            f_grad = -jax.grad(grav.energy)(pos, m)
            f = grav.force(pos, m)
            assert f.dtype == jnp.float64
            np.testing.assert_allclose(
                np.asarray(f), np.asarray(f_grad), rtol=1e-10, atol=1e-12
            )


class TestLorentz2D:
    def test_uniform_b_rotation_direction(self):
        """q > 0, B_z > 0, v = +x => F = q v x B = -y direction."""
        em = Lorentz2D(bz=2.0)
        pos = jnp.zeros((1, 2))
        vel = jnp.array([[3.0, 0.0]])
        a = em.acceleration(pos, vel, jnp.ones(1), jnp.ones(1))
        np.testing.assert_allclose(np.asarray(a), [[0.0, -6.0]], atol=1e-7)

    def test_nonuniform_b(self):
        em = Lorentz2D(bz=1.0, bk=0.5)
        pos = jnp.array([[2.0, 0.0]])
        vel = jnp.array([[0.0, 1.0]])
        a = em.acceleration(pos, vel, jnp.ones(1), jnp.ones(1))
        # B_z(2) = 2.0; a = (v_y * B, -v_x * B) = (2, 0)
        np.testing.assert_allclose(np.asarray(a), [[2.0, 0.0]], atol=1e-7)

    def test_e_field(self):
        em = Lorentz2D(bz=0.0, ex=1.5, ey=-0.5)
        a = em.acceleration(jnp.zeros((2, 2)), jnp.zeros((2, 2)), jnp.ones(2) * 2.0, jnp.ones(2))
        np.testing.assert_allclose(np.asarray(a), [[0.75, -0.25]] * 2, atol=1e-7)
