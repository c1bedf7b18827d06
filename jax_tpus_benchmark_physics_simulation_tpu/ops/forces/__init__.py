from jax_tpus_benchmark_physics_simulation_tpu.ops.forces.lennard_jones import LennardJones
from jax_tpus_benchmark_physics_simulation_tpu.ops.forces.gravity import Gravity
from jax_tpus_benchmark_physics_simulation_tpu.ops.forces.em import Lorentz2D
from jax_tpus_benchmark_physics_simulation_tpu.ops.forces.pbc import (
    minimum_image,
    wrap,
    pair_displacements,
)

__all__ = [
    "LennardJones",
    "Gravity",
    "Lorentz2D",
    "minimum_image",
    "wrap",
    "pair_displacements",
]
