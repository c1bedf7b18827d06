"""Integrators, all built as pure ``state -> state`` step functions that the
scan runners in ``core.runner`` fuse into single device programs.

Reference integrators replaced here:
- velocity-Verlet, molecular_dynamics...:66-75 (theirs recomputes F twice per
  step; ours carries the cached force — identical trajectory, half the force
  evaluations).
- classic RK4, nbody...:79-85.
- a pseudo-Verlet that feeds the *new* velocity back into the magnetic force
  (three_particles...:69-76) — not time-reversible for velocity-dependent
  forces; kept as ``em_reference_step`` for parity tests, with a proper Boris
  push as the default EM integrator.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from jax_tpus_benchmark_physics_simulation_tpu.core.state import ParticleState

ForceFn = Callable[[jax.Array], jax.Array]  # R -> F, shape (N, D)


# ---------------------------------------------------------------------------
# Velocity Verlet (position-dependent forces, e.g. Lennard-Jones MD)
# ---------------------------------------------------------------------------

def velocity_verlet(
    force_fn: ForceFn, dt: float, wrap_fn: Optional[Callable] = None
) -> Tuple[Callable, Callable]:
    """Returns ``(init_fn, step_fn)``.

    ``init_fn`` populates the cached force; ``step_fn`` performs one
    kick-drift-kick step using the cached force, evaluating ``force_fn``
    once per step.
    """

    def init_fn(state: ParticleState) -> ParticleState:
        return state.replace(force=force_fn(state.position))

    def step_fn(state: ParticleState) -> ParticleState:
        inv_m = 1.0 / state.mass[:, None]
        v_half = state.velocity + 0.5 * dt * state.force * inv_m
        r_new = state.position + dt * v_half
        if wrap_fn is not None:
            r_new = wrap_fn(r_new)
        f_new = force_fn(r_new)
        v_new = v_half + 0.5 * dt * f_new * inv_m
        return state.replace(
            position=r_new, velocity=v_new, force=f_new, time=state.time + dt
        )

    return init_fn, step_fn


# ---------------------------------------------------------------------------
# RK4 on a flat ODE vector (N-body merger)
# ---------------------------------------------------------------------------

def rk4_step_fn(ode_fn: Callable, dt: float) -> Callable:
    """Classic fixed-step RK4 for ``dy/dt = ode_fn(t, y)`` on any pytree ``y``.

    Matches nbody...:79-85 arithmetic exactly (same k-combination order).
    """

    def step(y, t):
        k1 = ode_fn(t, y)
        k2 = ode_fn(t + 0.5 * dt, jax.tree.map(lambda a, b: a + 0.5 * dt * b, y, k1))
        k3 = ode_fn(t + 0.5 * dt, jax.tree.map(lambda a, b: a + 0.5 * dt * b, y, k2))
        k4 = ode_fn(t + dt, jax.tree.map(lambda a, b: a + dt * b, y, k3))
        return jax.tree.map(
            lambda a, b1, b2, b3, b4: a + (dt / 6.0) * (b1 + 2 * b2 + 2 * b3 + b4),
            y, k1, k2, k3, k4,
        )

    return step


# ---------------------------------------------------------------------------
# Boris push (velocity-dependent magnetic forces, 2D with out-of-plane B_z)
# ---------------------------------------------------------------------------

def boris2d(
    position_accel_fn: Callable[[jax.Array], jax.Array],
    b_field_fn: Callable[[jax.Array], jax.Array],
    dt: float,
) -> Tuple[Callable, Callable]:
    """Boris push: half electric/gravity kick, magnetic rotation, half kick,
    drift. The standard volume-preserving integrator for Lorentz-force
    dynamics — replaces the reference's improper scheme
    (three_particles...:69-76; SURVEY.md §2d).

    ``position_accel_fn(R)`` gives velocity-independent acceleration
    (gravity + qE/m); ``b_field_fn(R)`` gives q B_z / m per particle, (N,).
    """

    def init_fn(state: ParticleState) -> ParticleState:
        return state

    def rotate(v: jax.Array, omega_dt_half: jax.Array) -> jax.Array:
        # Boris rotation: t = tan(theta/2) approx omega*dt/2, s = 2t/(1+t^2).
        # For B = B_z zhat, v x zhat = (v_y, -v_x); charge sign folds into omega.
        t = omega_dt_half
        s = 2.0 * t / (1.0 + t * t)
        v_cross = jnp.stack([v[:, 1], -v[:, 0]], axis=1)  # v x zhat
        v_prime = v + v_cross * t[:, None]
        vp_cross = jnp.stack([v_prime[:, 1], -v_prime[:, 0]], axis=1)
        return v + vp_cross * s[:, None]

    def step_fn(state: ParticleState) -> ParticleState:
        a_pos = position_accel_fn(state.position)
        omega = b_field_fn(state.position)  # q B_z / m
        v_minus = state.velocity + 0.5 * dt * a_pos
        v_plus = rotate(v_minus, 0.5 * dt * omega)
        v_new = v_plus + 0.5 * dt * a_pos
        r_new = state.position + dt * v_new
        return state.replace(position=r_new, velocity=v_new, time=state.time + dt)

    return init_fn, step_fn


# ---------------------------------------------------------------------------
# Reference-compat EM step (parity oracle only)
# ---------------------------------------------------------------------------

def em_reference_step(
    accel_fn: Callable[[jax.Array, jax.Array], jax.Array], dt: float
) -> Callable:
    """Bit-for-bit re-expression of three_particles...:69-76:
    half-kick, drift, recompute a(R_new, V_half), half-kick.
    """

    def step_fn(state: ParticleState) -> ParticleState:
        acc = accel_fn(state.position, state.velocity)
        v_half = state.velocity + 0.5 * dt * acc
        r_new = state.position + dt * v_half
        acc_new = accel_fn(r_new, v_half)
        v_new = v_half + 0.5 * dt * acc_new
        return state.replace(position=r_new, velocity=v_new, time=state.time + dt)

    return step_fn
