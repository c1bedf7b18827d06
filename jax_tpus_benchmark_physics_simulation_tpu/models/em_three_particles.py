"""Workload: N charged particles under mutual gravity + non-uniform EM field.

Reference: three_particles_em_nonuni_single-host_workload.py (112 LoC).
Its hot loop is a host Python loop with one device dispatch and one
trajectory-list append per step (:78-85 — 1000 round trips, the anti-pattern
specimen of SURVEY.md §3.4). Here the whole run is a single ``lax.scan``
device program.

Default integrator is a Boris push (correct for velocity-dependent magnetic
forces); ``integrator="reference"`` reproduces the reference's pseudo-Verlet
(:69-76) for parity testing.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from jax_tpus_benchmark_physics_simulation_tpu.core.config import EM3Config
from jax_tpus_benchmark_physics_simulation_tpu.core.runner import run_trajectory_with_initial
from jax_tpus_benchmark_physics_simulation_tpu.core.state import ParticleState
from jax_tpus_benchmark_physics_simulation_tpu.ops.forces import Gravity, Lorentz2D
from jax_tpus_benchmark_physics_simulation_tpu.ops.integrators import (
    boris2d,
    em_reference_step,
)


def default_initial_state(dtype=jnp.float32) -> ParticleState:
    """Reference initial conditions (three_particles...:87-91): unit-mass,
    unit-charge particles on an equilateral triangle with circulating
    velocities."""
    pos = jnp.array([[0.0, 0.0], [1.0, 0.0], [0.5, 0.866]], dtype=dtype)
    vel = jnp.array([[0.0, 0.1], [0.0, -0.1], [-0.1, 0.0]], dtype=dtype)
    return ParticleState.create(pos, vel, mass=jnp.ones(3, dtype), charge=jnp.ones(3, dtype))


def build_step(cfg: EM3Config, state: ParticleState):
    """Returns ``(init_fn, step_fn)`` for the configured integrator."""
    gravity = Gravity(g=cfg.g, mode="r2_floor")
    em = Lorentz2D(bz=cfg.bz, bk=cfg.bk, ex=cfg.ex, ey=cfg.ey)
    mass, charge = state.mass, state.charge

    if cfg.integrator == "boris":
        def pos_accel(r):
            qm = charge / mass
            return gravity.acceleration(r, mass) + qm[:, None] * em.e_field(r)

        def omega(r):  # q B_z / m per particle
            return (charge / mass) * em.b_field(r)

        return boris2d(pos_accel, omega, cfg.dt)

    if cfg.integrator == "reference":
        def accel(r, v):
            return gravity.acceleration(r, mass) + em.acceleration(r, v, mass, charge)

        return (lambda s: s), em_reference_step(accel, cfg.dt)

    raise ValueError(f"unknown integrator: {cfg.integrator}")


@partial(jax.jit, static_argnums=(0,))
def simulate(cfg: EM3Config, state: ParticleState):
    """Run ``cfg.n_steps`` steps in one device program.

    Returns ``(final_state, trajectory)`` with trajectory shape
    ``(n_steps + 1, N, 2)`` (initial frame prepended, matching the reference's
    output layout at :81-85).
    """
    init_fn, step_fn = build_step(cfg, state)
    state = init_fn(state)
    return run_trajectory_with_initial(step_fn, state, cfg.n_steps, observe_fn=lambda s: s.position)


@dataclass
class EM3Result:
    trajectory: jax.Array  # (n_steps + 1, N, 2)
    final_state: ParticleState
    wall_time_s: float


def run(cfg: Optional[EM3Config] = None, state: Optional[ParticleState] = None) -> EM3Result:
    """Timed end-to-end run (compile excluded via warmup, matching the
    reference's warmup-then-measure discipline, SURVEY.md §5)."""
    import time

    cfg = cfg or EM3Config()
    state = state if state is not None else default_initial_state()

    final, traj = simulate(cfg, state)  # warmup/compile
    jax.block_until_ready(traj)

    t0 = time.perf_counter()
    final, traj = simulate(cfg, state)
    jax.block_until_ready(traj)
    wall = time.perf_counter() - t0

    return EM3Result(trajectory=traj, final_state=final, wall_time_s=wall)
