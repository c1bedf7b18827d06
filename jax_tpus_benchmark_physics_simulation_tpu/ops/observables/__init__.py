from jax_tpus_benchmark_physics_simulation_tpu.ops.observables.thermo import (
    kinetic_energy,
    temperature,
    total_energy,
    momentum,
)
from jax_tpus_benchmark_physics_simulation_tpu.ops.observables.rdf import radial_distribution
from jax_tpus_benchmark_physics_simulation_tpu.ops.observables.gw import gw_strain
from jax_tpus_benchmark_physics_simulation_tpu.ops.observables.lyapunov import (
    lyapunov_tangent,
    lyapunov_two_trajectory,
)
from jax_tpus_benchmark_physics_simulation_tpu.ops.observables.msd import (
    diffusion_coefficient,
    mean_squared_displacement,
    unwrap_trajectory,
)

__all__ = [
    "kinetic_energy",
    "temperature",
    "total_energy",
    "momentum",
    "radial_distribution",
    "gw_strain",
    "lyapunov_tangent",
    "lyapunov_two_trajectory",
    "mean_squared_displacement",
    "diffusion_coefficient",
    "unwrap_trajectory",
]
