from jax_tpus_benchmark_physics_simulation_tpu.ops import forces, integrators, observables

__all__ = ["forces", "integrators", "observables"]
