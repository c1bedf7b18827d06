"""Thermodynamic observables (on-device).

The reference computes no thermodynamics during runs (energy conservation is
never checked — SURVEY.md §4 lists it as a test gap). These run inside the
scan as observables and back the energy-drift regression tests that
BASELINE.md requires (<1e-4 relative drift).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from jax_tpus_benchmark_physics_simulation_tpu.core.state import ParticleState


def kinetic_energy(state: ParticleState) -> jax.Array:
    return 0.5 * jnp.sum(state.mass[:, None] * state.velocity**2)


def temperature(state: ParticleState) -> jax.Array:
    """Instantaneous kT from equipartition: 2 KE / (N * dim)."""
    n, d = state.position.shape
    return 2.0 * kinetic_energy(state) / (n * d)


def total_energy(state: ParticleState, potential_fn) -> jax.Array:
    return kinetic_energy(state) + potential_fn(state.position)


def momentum(state: ParticleState) -> jax.Array:
    return jnp.sum(state.mass[:, None] * state.velocity, axis=0)
