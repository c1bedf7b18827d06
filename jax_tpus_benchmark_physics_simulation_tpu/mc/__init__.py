from jax_tpus_benchmark_physics_simulation_tpu.mc.models import (
    HarmonicOscillator,
    generic_local_energy,
)
from jax_tpus_benchmark_physics_simulation_tpu.mc.metropolis import (
    make_metropolis_sweep,
    equilibrate,
)
from jax_tpus_benchmark_physics_simulation_tpu.mc.resampling import (
    resample_multinomial,
    resample_systematic,
    RESAMPLERS,
)
from jax_tpus_benchmark_physics_simulation_tpu.mc.vmc import run_vmc, VMCResult
from jax_tpus_benchmark_physics_simulation_tpu.mc.dmc import run_dmc, DMCResult

__all__ = [
    "HarmonicOscillator",
    "generic_local_energy",
    "make_metropolis_sweep",
    "equilibrate",
    "resample_multinomial",
    "resample_systematic",
    "RESAMPLERS",
    "run_vmc",
    "VMCResult",
    "run_dmc",
    "DMCResult",
]
