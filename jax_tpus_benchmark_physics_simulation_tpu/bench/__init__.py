from jax_tpus_benchmark_physics_simulation_tpu.bench.runners import (
    run_sweep,
    compute_core_candidates,
    BenchContext,
)
from jax_tpus_benchmark_physics_simulation_tpu.bench.sysinfo import (
    system_info,
    device_rows,
    safe_device_count,
)
from jax_tpus_benchmark_physics_simulation_tpu.bench import ops, flops

__all__ = [
    "run_sweep",
    "compute_core_candidates",
    "BenchContext",
    "system_info",
    "device_rows",
    "safe_device_count",
    "ops",
    "flops",
]
