"""The five reference workloads as thin configs on the shared engine."""

from jax_tpus_benchmark_physics_simulation_tpu.models import (
    em_three_particles,
    lj_fluid,
    nbody_merger,
    quantum_oscillator,
)

__all__ = ["em_three_particles", "lj_fluid", "nbody_merger", "quantum_oscillator"]
