"""Diffusion Monte Carlo with on-device branching.

Reference: ``dmc_step_body`` + single ``lax.scan`` at vmc_dmc...:238-280 (the
one fully device-fused driver in the reference — the pattern generalized
here). Per step: local energies -> weights exp(-(E_L - E_ref) dt) ->
sanitize -> resample (branching, population fixed) -> drift + diffusion move.

TPU-native changes: resampler is pluggable (systematic by default — the
reference's ``random.choice`` multinomial is kept as an option), and walker
snapshots are emitted at a configurable stride instead of the full
(n_steps, n_walkers, dim) history.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax, random

from jax_tpus_benchmark_physics_simulation_tpu.core.config import VMCDMCConfig
from jax_tpus_benchmark_physics_simulation_tpu.mc.resampling import RESAMPLERS


@dataclass
class DMCResult:
    walkers: jax.Array  # final ensemble (n_walkers, dim)
    energy_history: jax.Array  # E_ref per step, (n_steps,)
    walker_snapshots: Optional[jax.Array]  # (n_snaps, n_walkers, dim) or None

    def mean_energy(self, burn_in: int = 100):
        """Mean +- standard error after burn-in (vmc_dmc...:317-321)."""
        e = self.energy_history[burn_in:]
        return jnp.mean(e), jnp.std(e) / jnp.sqrt(e.shape[0])


def make_dmc_step(model, params, dt: float, resampler: str = "systematic"):
    """One DMC step: ``(walkers, key) -> ((walkers, key), E_ref)``."""
    resample = RESAMPLERS[resampler]

    def step(carry, _):
        walkers, key = carry
        n, dim = walkers.shape

        e_local = model.local_energy(params, walkers)
        e_ref = jnp.mean(e_local)
        weights = jnp.exp(-(e_local - e_ref) * dt)

        key, k_resample, k_diffuse = random.split(key, 3)
        walkers = resample(k_resample, walkers, weights)

        drift = model.drift_force(params, walkers) * dt
        diffusion = random.normal(k_diffuse, (n, dim), dtype=walkers.dtype) * jnp.sqrt(dt)
        walkers = walkers + drift + diffusion

        return (walkers, key), e_ref

    return step


def run_dmc(
    model,
    params,
    walkers: jax.Array,
    key: jax.Array,
    cfg: VMCDMCConfig,
) -> DMCResult:
    """Whole DMC run as one device program (reference pattern vmc_dmc...:275-280)."""
    step = make_dmc_step(model, params, cfg.dmc_dt, cfg.resampler)
    snap_every = cfg.snapshot_every

    @jax.jit
    def program(walkers, key):
        if snap_every and 0 < snap_every <= cfg.n_dmc:
            n_outer = cfg.n_dmc // snap_every

            def outer(carry, _):
                carry, e_refs = lax.scan(step, carry, length=snap_every)
                return carry, (e_refs, carry[0])

            carry, (e_refs, snaps) = lax.scan(outer, (walkers, key), length=n_outer)
            e_hist = e_refs.reshape(-1)
            rem = cfg.n_dmc - n_outer * snap_every
            if rem:
                carry, e_tail = lax.scan(step, carry, length=rem)
                e_hist = jnp.concatenate([e_hist, e_tail])
            return carry[0], e_hist, snaps
        carry, e_hist = lax.scan(step, (walkers, key), length=cfg.n_dmc)
        return carry[0], e_hist, None

    walkers, e_hist, snaps = program(walkers, key)
    return DMCResult(walkers=walkers, energy_history=e_hist, walker_snapshots=snaps)
