from jax_tpus_benchmark_physics_simulation_tpu.utils.deps import check_dependencies

__all__ = ["check_dependencies"]
