from jax_tpus_benchmark_physics_simulation_tpu.utils.deps import check_dependencies
from jax_tpus_benchmark_physics_simulation_tpu.utils.prng import make_key
from jax_tpus_benchmark_physics_simulation_tpu.utils import debug, profiling

__all__ = ["check_dependencies", "make_key", "debug", "profiling"]
