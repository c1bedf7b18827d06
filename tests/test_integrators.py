"""Integrator property tests: convergence order, energy conservation,
reversibility, and parity with the reference schemes."""

import jax
import jax.numpy as jnp
import numpy as np

from jax_tpus_benchmark_physics_simulation_tpu.core.runner import run_steps, run_trajectory
from jax_tpus_benchmark_physics_simulation_tpu.core.state import ParticleState
from jax_tpus_benchmark_physics_simulation_tpu.ops.integrators import (
    boris2d,
    em_reference_step,
    rk4_step_fn,
    velocity_verlet,
)


def harmonic_force(pos):
    return -pos


class TestVelocityVerlet:
    def test_harmonic_oscillator_period(self):
        """x(t) = cos(t) for unit SHO starting at x=1, v=0."""
        dt = 1e-3
        init_fn, step_fn = velocity_verlet(harmonic_force, dt)
        state = ParticleState.create(jnp.array([[1.0, 0.0]]), jnp.zeros((1, 2)))
        state = init_fn(state)
        n_steps = int(round(2 * np.pi / dt))
        final = run_steps(step_fn, state, n_steps)
        np.testing.assert_allclose(float(final.position[0, 0]), 1.0, atol=1e-3)

    def test_energy_conservation_sho(self):
        dt = 1e-2
        init_fn, step_fn = velocity_verlet(harmonic_force, dt)
        state = ParticleState.create(jnp.array([[1.0, 0.5]]), jnp.array([[0.2, -0.3]]))
        state = init_fn(state)

        def energy(s):
            return 0.5 * jnp.sum(s.velocity**2) + 0.5 * jnp.sum(s.position**2)

        e0 = float(energy(state))
        _, es = run_trajectory(step_fn, state, 5000, 10, observe_fn=energy)
        drift = np.max(np.abs(np.asarray(es) - e0)) / abs(e0)
        assert drift < 1e-4, f"energy drift {drift}"

    def test_second_order_convergence(self):
        """Global error of velocity-Verlet is O(dt^2) (f64 oracle mode)."""
        t_end = 1.0

        with jax.enable_x64(True):
            def err(dt):
                init_fn, step_fn = velocity_verlet(harmonic_force, dt)
                s = ParticleState.create(
                    jnp.array([[1.0, 0.0]], dtype=jnp.float64),
                    jnp.zeros((1, 2), dtype=jnp.float64),
                )
                s = init_fn(s)
                s = run_steps(step_fn, s, int(round(t_end / dt)))
                return abs(float(s.position[0, 0]) - np.cos(t_end))

            e1, e2 = err(0.01), err(0.005)
        order = np.log2(e1 / e2)
        assert 1.7 < order < 2.3, f"measured order {order}"

    def test_matches_reference_two_eval_scheme(self):
        """Cached-force Verlet trajectory == reference's recompute-F scheme
        (molecular_dynamics...:66-75) step for step."""
        dt = 1e-3
        key = jax.random.PRNGKey(0)
        r0 = jax.random.normal(key, (4, 2))
        v0 = jax.random.normal(jax.random.PRNGKey(1), (4, 2))

        init_fn, step_fn = velocity_verlet(harmonic_force, dt)
        ours = init_fn(ParticleState.create(r0, v0))
        for _ in range(50):
            ours = step_fn(ours)

        # reference scheme: F recomputed at step start
        r, v = r0, v0
        for _ in range(50):
            f = harmonic_force(r)
            v_half = v + 0.5 * f * dt
            r = r + v_half * dt
            f_new = harmonic_force(r)
            v = v_half + 0.5 * f_new * dt

        np.testing.assert_allclose(np.asarray(ours.position), np.asarray(r), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ours.velocity), np.asarray(v), rtol=1e-5, atol=1e-6)


class TestRK4:
    def test_exponential_decay(self):
        """y' = -y integrates to e^-t with O(dt^4) error."""
        dt = 0.1
        step = rk4_step_fn(lambda t, y: -y, dt)
        y = jnp.array(1.0)
        for i in range(10):
            y = step(y, i * dt)
        np.testing.assert_allclose(float(y), np.exp(-1.0), rtol=1e-5)

    def test_fourth_order_convergence(self):
        with jax.enable_x64(True):
            def err(dt):
                step = rk4_step_fn(lambda t, y: y, dt)
                y = jnp.array(1.0, dtype=jnp.float64)
                n = int(round(2.0 / dt))
                for i in range(n):
                    y = step(y, i * dt)
                return abs(float(y) - np.exp(2.0))

            e1, e2 = err(0.1), err(0.05)
        order = np.log2(e1 / e2)
        assert 3.5 < order < 4.5, f"measured order {order}"

    def test_matches_reference_rk4_arithmetic(self):
        """Same k-combination as nbody...:79-85 on a vector ODE."""
        dt, t = 0.037, 0.5
        f = lambda t, y: jnp.sin(y) + t
        y0 = jnp.array([0.3, -0.7, 1.1])
        ours = rk4_step_fn(f, dt)(y0, t)
        k1 = f(t, y0)
        k2 = f(t + 0.5 * dt, y0 + 0.5 * dt * k1)
        k3 = f(t + 0.5 * dt, y0 + 0.5 * dt * k2)
        k4 = f(t + dt, y0 + dt * k3)
        ref = y0 + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-7)


class TestBoris:
    def test_cyclotron_orbit(self):
        """Uniform B_z, no E: circular orbit at omega_c = qB/m, radius v/omega.
        Boris conserves speed exactly."""
        bz, v0, dt = 1.5, 2.0, 0.01
        init_fn, step_fn = boris2d(
            position_accel_fn=lambda r: jnp.zeros_like(r),
            b_field_fn=lambda r: jnp.full((r.shape[0],), bz),
            dt=dt,
        )
        state = ParticleState.create(jnp.zeros((1, 2)), jnp.array([[v0, 0.0]]))
        state = init_fn(state)
        n = int(round(2 * np.pi / bz / dt))  # one cyclotron period
        state, speeds = run_trajectory(
            step_fn, state, n, 1, observe_fn=lambda s: jnp.linalg.norm(s.velocity)
        )
        # speed conserved to machine precision
        np.testing.assert_allclose(np.asarray(speeds), v0, rtol=1e-5)
        # back near start after one period
        assert float(jnp.linalg.norm(state.position)) < 0.05 * (v0 / bz)

    def test_exb_drift(self):
        """E x B drift velocity = E/B in +x for E = -y hat... with
        E=(0,Ey), B=Bz: v_drift = (Ey/Bz, 0)... E x B / B^2."""
        bz, ey, dt = 1.0, 0.5, 0.01
        init_fn, step_fn = boris2d(
            position_accel_fn=lambda r: jnp.broadcast_to(jnp.array([0.0, ey]), r.shape),
            b_field_fn=lambda r: jnp.full((r.shape[0],), bz),
            dt=dt,
        )
        # Start at drift velocity: should move in straight line.
        v_drift = jnp.array([[ey / bz, 0.0]])
        state = init_fn(ParticleState.create(jnp.zeros((1, 2)), v_drift))
        state = run_steps(step_fn, state, 1000)
        # y displacement stays ~0 (pure x drift)
        assert abs(float(state.position[0, 1])) < 1e-3
        np.testing.assert_allclose(float(state.position[0, 0]), ey / bz * 10.0, rtol=1e-2)


class TestEMReferenceStep:
    def test_matches_reference_transcription(self):
        """em_reference_step reproduces three_particles...:69-76 arithmetic."""
        dt = 0.01

        def accel(pos, vel):
            return -pos + 0.1 * jnp.stack([vel[:, 1], -vel[:, 0]], axis=1)

        state = ParticleState.create(
            jnp.array([[1.0, 0.0], [0.0, 1.0]]), jnp.array([[0.0, 0.5], [-0.5, 0.0]])
        )
        step = em_reference_step(accel, dt)
        s = state
        for _ in range(20):
            s = step(s)

        pos, vel = state.position, state.velocity
        for _ in range(20):
            acc = accel(pos, vel)
            vel_new = vel + 0.5 * dt * acc
            pos_new = pos + dt * vel_new
            acc_new = accel(pos_new, vel_new)
            vel_new = vel_new + 0.5 * dt * acc_new
            pos, vel = pos_new, vel_new

        np.testing.assert_allclose(np.asarray(s.position), np.asarray(pos), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(s.velocity), np.asarray(vel), rtol=1e-6)
