"""Gravitational-wave quadrupole strain, computed on device.

Reference: ``multi_gw_strain`` at nbody...:147-171 — a host-side NumPy double
loop over pairs with per-pair cumsum phase integration. Here the same
quadrupole formula is vectorized over all pairs with ``vmap`` and runs as part
of the device program (positions never need to leave HBM). Matches the
reference output to float tolerance (tests/test_nbody.py).

Physics (per pair i<j, G=c=1 units with D in meters):
  chirp mass  M_c = mu^(3/5) (m_i + m_j)^(2/5)
  Keplerian   omega = sqrt(G (m_i + m_j) / r^3)
  phase       phi(t) = int omega dt      (cumulative, matching :163-165)
  amplitude   A = 4 (G M_c)^(5/3) / (c^4 D) * omega^(2/3)
  strain      h_+ = mean over pairs of A cos(2 phi)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

MPC_TO_M = 3.086e22  # nbody...:150


@partial(jax.jit, static_argnames=("g", "c"))
def gw_strain(
    t: jax.Array,  # (T,)
    positions_t: jax.Array,  # (T, n, 2)
    masses: jax.Array,  # (n,)
    d_gw_mpc: float | jax.Array,
    g: float = 1.0,
    c: float = 1.0,
) -> jax.Array:
    """Plus-polarization strain h_+(t), shape (T,)."""
    n = positions_t.shape[1]
    d_meters = d_gw_mpc * MPC_TO_M
    ii, jj = jnp.triu_indices(n, k=1)
    n_pairs = ii.shape[0]

    dt = jnp.diff(t, prepend=t[0])

    def pair_strain(i, j):
        r = jnp.linalg.norm(positions_t[:, i] - positions_t[:, j], axis=1)
        r = jnp.maximum(r, 1e-6)  # floor, nbody...:156
        m_sum = masses[i] + masses[j]
        mu = masses[i] * masses[j] / m_sum
        chirp = mu ** (3.0 / 5.0) * m_sum ** (2.0 / 5.0)
        omega = jnp.sqrt(g * m_sum / r**3)
        # phi[0] = 0; phi[k] = sum_{1..k} omega[k] dt[k]  (matches :163-165)
        phi = jnp.cumsum(omega * dt) - omega[0] * dt[0]
        amp = (4.0 * (g * chirp) ** (5.0 / 3.0) / (c**4 * d_meters)) * omega ** (2.0 / 3.0)
        return amp * jnp.cos(2.0 * phi)

    h = jax.vmap(pair_strain)(ii, jj)  # (n_pairs, T)
    return jnp.sum(h, axis=0) / jnp.maximum(n_pairs, 1)
