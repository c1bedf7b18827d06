"""End-to-end tests for the EM three-particle workload, golden-checked
against a direct transcription of the reference algorithm
(three_particles_em_nonuni_single-host_workload.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from jax_tpus_benchmark_physics_simulation_tpu.core.config import EM3Config, override
from jax_tpus_benchmark_physics_simulation_tpu.models import em_three_particles as em3


def reference_trajectory(cfg: EM3Config, pos, vel, masses, charges):
    """Independent transcription of three_particles...:23-85 (vectorized
    acceleration, pseudo-Verlet step, host loop)."""

    def acceleration(pos, vel):
        n = pos.shape[0]
        r_diff = pos[None, :, :] - pos[:, None, :]
        r_norm_sq = jnp.sum(r_diff**2, axis=-1) + jnp.eye(n)
        r_norm_sq_safe = jnp.where(r_norm_sq < 1e-12, 1e-12, r_norm_sq)
        inv3 = r_norm_sq_safe ** (-1.5)
        acc_grav = jnp.sum(cfg.g * masses[None, :, None] * r_diff * inv3[..., None], axis=1)
        qm = charges / masses
        bz = cfg.bz + cfg.bk * pos[:, 0]
        acc_mag = jnp.stack([qm * vel[:, 1] * bz, -qm * vel[:, 0] * bz], axis=1)
        acc_elec = qm[:, None] * jnp.array([cfg.ex, cfg.ey])
        return acc_grav + acc_mag + acc_elec

    traj = [pos]
    for _ in range(cfg.n_steps):
        acc = acceleration(pos, vel)
        vel = vel + 0.5 * cfg.dt * acc
        pos = pos + cfg.dt * vel
        acc_new = acceleration(pos, vel)
        vel = vel + 0.5 * cfg.dt * acc_new
        traj.append(pos)
    return jnp.stack(traj)


def test_reference_parity():
    """integrator='reference' reproduces the reference trajectory from the
    reference ICs (three_particles...:87-91)."""
    # 50 steps: past that a close three-body encounter amplifies f32
    # round-off chaotically (verified: divergence is ~3e-7 at step 50,
    # growing smoothly from 4e-9 at step 5 — not an algorithmic mismatch).
    cfg = override(EM3Config(), n_steps=50, integrator="reference")
    state = em3.default_initial_state()
    _, traj = em3.simulate(cfg, state)
    ref = reference_trajectory(
        cfg, state.position, state.velocity, state.mass, state.charge
    )
    np.testing.assert_allclose(np.asarray(traj), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_boris_and_reference_agree_at_small_dt():
    """Both integrators converge to the same trajectory as dt -> 0."""
    def final_pos(integrator, dt, n_steps):
        cfg = override(EM3Config(), dt=dt, n_steps=n_steps, integrator=integrator)
        _, traj = em3.simulate(cfg, em3.default_initial_state())
        return np.asarray(traj[-1])

    # t_end = 0.4, before the chaotic close encounter near t ~ 0.7
    p_boris = final_pos("boris", 0.001, 400)
    p_ref = final_pos("reference", 0.001, 400)
    np.testing.assert_allclose(p_boris, p_ref, atol=1e-3)


def test_trajectory_shape_and_finiteness():
    cfg = override(EM3Config(), n_steps=50)
    res = em3.run(cfg)
    assert res.trajectory.shape == (51, 3, 2)
    assert np.all(np.isfinite(np.asarray(res.trajectory)))


def test_pure_magnetic_conserves_energy():
    """With G=0, E=0 the magnetic force does no work: Boris conserves speed."""
    cfg = override(EM3Config(), g=0.0, bz=1.0, n_steps=2000, integrator="boris")
    state = em3.default_initial_state()
    final, _ = em3.simulate(cfg, state)
    ke0 = float(jnp.sum(state.velocity**2))
    ke1 = float(jnp.sum(final.velocity**2))
    np.testing.assert_allclose(ke1, ke0, rtol=1e-5)
