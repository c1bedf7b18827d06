from jax_tpus_benchmark_physics_simulation_tpu.core.state import ParticleState, WalkerState
from jax_tpus_benchmark_physics_simulation_tpu.core.runner import (
    run_steps,
    run_trajectory,
    run_trajectory_with_initial,
)
from jax_tpus_benchmark_physics_simulation_tpu.core import config

__all__ = [
    "ParticleState",
    "WalkerState",
    "run_steps",
    "run_trajectory",
    "run_trajectory_with_initial",
    "config",
]
