from jax_tpus_benchmark_physics_simulation_tpu.parallel.mesh import (
    make_mesh,
    shard_along,
    replicated,
    pad_to_multiple,
)
from jax_tpus_benchmark_physics_simulation_tpu.parallel.ring import (
    make_ring_lj_force,
    make_ring_lj_energy,
    make_ring_gravity_accel,
)

__all__ = [
    "make_mesh",
    "shard_along",
    "replicated",
    "pad_to_multiple",
    "make_ring_lj_force",
    "make_ring_lj_energy",
    "make_ring_gravity_accel",
]
