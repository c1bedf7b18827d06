"""Workload: VMC -> DMC for the D-dimensional quantum harmonic oscillator.

Reference: vmc_dmc_jax_quantum_harmonic_oscillator.py (361 LoC). Pipeline
identical (VMC optimizes alpha, DMC refines the ground-state energy from the
optimized ensemble, vmc_dmc...:217-221); execution model differs: VMC epochs
are scanned on device in chunks instead of 3000 host dispatches, and DMC uses
a systematic resampler by default (multinomial option for reference parity).

Physics oracle: exact E_0 = D/2 at alpha = 0.5 (vmc_dmc...:173-175).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, Optional

import jax

from jax_tpus_benchmark_physics_simulation_tpu.core.config import VMCDMCConfig
from jax_tpus_benchmark_physics_simulation_tpu.mc.dmc import DMCResult, run_dmc
from jax_tpus_benchmark_physics_simulation_tpu.mc.models import (
    AnharmonicOscillator,
    HarmonicOscillator,
)
from jax_tpus_benchmark_physics_simulation_tpu.mc.vmc import VMCResult, run_vmc


@dataclass
class QuantumResult:
    vmc: VMCResult
    dmc: DMCResult
    exact_energy: float
    exact_alpha: Optional[float]
    vmc_wall_s: float
    dmc_wall_s: float

    @property
    def vmc_energy(self) -> float:
        return float(self.vmc.energy_history[-1])

    @property
    def vmc_alpha(self) -> float:
        return float(jax.tree.leaves(self.vmc.params)[0])


def make_model(cfg: VMCDMCConfig):
    """Model dispatch: 'harmonic' is the reference (vmc_dmc...:30-47);
    'anharmonic' is the beyond-reference generic-trial-psi path."""
    if cfg.potential == "harmonic":
        return HarmonicOscillator(dim=cfg.dim)
    if cfg.potential == "anharmonic":
        return AnharmonicOscillator(dim=cfg.dim, lam=cfg.lam)
    raise ValueError(f"unknown potential: {cfg.potential!r}")


def run(
    cfg: Optional[VMCDMCConfig] = None,
    progress_cb: Optional[Callable[[int, float, float], None]] = None,
    ckpt_dir: Optional[str] = None,
    walker_sharding=None,
) -> QuantumResult:
    """``walker_sharding``: optional NamedSharding splitting the walker axis
    over a device mesh — the WHOLE pipeline shards: GSPMD-sharded VMC
    (mc/vmc.py) feeding shard_map'd DMC with shard-local branching
    (mc/dmc.py)."""
    cfg = cfg or VMCDMCConfig()
    model = make_model(cfg)

    t0 = time.perf_counter()
    vmc_res = run_vmc(
        model, cfg, progress_cb=progress_cb, ckpt_dir=ckpt_dir,
        walker_sharding=walker_sharding,
    )
    jax.block_until_ready(vmc_res.energy_history)
    vmc_wall = time.perf_counter() - t0

    # DMC continues from the VMC-optimized ensemble (vmc_dmc...:219-221).
    t0 = time.perf_counter()
    dmc_res = run_dmc(
        model, vmc_res.params, vmc_res.walkers, vmc_res.key, cfg,
        walker_sharding=walker_sharding,
    )
    jax.block_until_ready(dmc_res.energy_history)
    dmc_wall = time.perf_counter() - t0

    return QuantumResult(
        vmc=vmc_res,
        dmc=dmc_res,
        exact_energy=model.exact_energy(),  # anharmonic: 1D diagonalization oracle
        exact_alpha=model.exact_params(),
        vmc_wall_s=vmc_wall,
        dmc_wall_s=dmc_wall,
    )
