"""Metropolis sampling kernel for walker ensembles.

Reference: ``metropolis_step`` / ``vmap_metropolis_step`` at vmc_dmc...:51-67.
Physics is identical (uniform +-step/2 proposal, accept with
exp(2 delta log psi)). The reference's equilibration loop carries
``keys_for_walkers[0]`` back as the loop key (vmc_dmc...:77) — key *reuse*
across sweeps; here every sweep folds fresh entropy from one master key.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax import lax, random


def make_metropolis_sweep(
    log_psi: Callable[[jax.Array, jax.Array], jax.Array],
    step_size: float,
):
    """Returns ``sweep(walkers, params, key) -> (walkers, accept_rate)``:
    one Metropolis update of every walker, vectorized (no per-walker key
    arrays materialized on host)."""

    def sweep(walkers: jax.Array, params, key: jax.Array) -> Tuple[jax.Array, jax.Array]:
        n, dim = walkers.shape
        k_prop, k_accept = random.split(key)
        proposal = walkers + step_size * random.uniform(
            k_prop, (n, dim), dtype=walkers.dtype, minval=-0.5, maxval=0.5
        )
        log_ratio = 2.0 * (log_psi(params, proposal) - log_psi(params, walkers))
        accept = random.uniform(k_accept, (n,), dtype=walkers.dtype) < jnp.exp(log_ratio)
        new_walkers = jnp.where(accept[:, None], proposal, walkers)
        return new_walkers, jnp.mean(accept.astype(walkers.dtype))

    return sweep


def equilibrate(
    sweep: Callable,
    walkers: jax.Array,
    params,
    key: jax.Array,
    n_sweeps: int,
) -> Tuple[jax.Array, jax.Array]:
    """Run ``n_sweeps`` Metropolis sweeps on device (vmc_dmc...:73-80
    equivalent, with per-sweep key folding). Returns (walkers, mean accept)."""

    def body(i, carry):
        w, k, acc = carry
        k, sub = random.split(k)
        w, a = sweep(w, params, sub)
        return (w, k, acc + a)

    walkers, key, acc = lax.fori_loop(0, n_sweeps, body, (walkers, key, jnp.array(0.0, walkers.dtype)))
    return walkers, acc / jnp.maximum(n_sweeps, 1)
