"""Radial distribution function g(r), fully on device.

Reference: ``_calculate_g_r_internal`` at molecular_dynamics...:108-131
(per-snapshot O(N^2) distances + ``jnp.histogram`` over ``triu_indices``,
vmapped over snapshots, normalized by ideal-gas shell counts).

TPU-native differences: the histogram is computed by bucketize + segment-sum
over the full masked pair matrix (no host ``triu_indices`` gather of a
dynamic-length vector), which XLA maps onto the VPU without materializing a
flat (N*(N-1)/2,) array. Normalization is identical; output matches the
reference to float tolerance (tests/test_md.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from jax_tpus_benchmark_physics_simulation_tpu.ops.forces.pbc import pair_displacements


@partial(jax.jit, static_argnums=(2, 4))
def radial_distribution(
    r_history: jax.Array,  # (S, N, dim)
    box: jax.Array | float,
    nbins: int,
    r_max: jax.Array | float,
    dim: int = 2,
):
    """Returns ``(bin_centers, g_r)``, each shape (nbins,)."""
    s, n, _ = r_history.shape
    r_bins = jnp.linspace(0.0, r_max, nbins + 1)
    bin_centers = 0.5 * (r_bins[:-1] + r_bins[1:])
    if dim == 2:
        shell = jnp.pi * (r_bins[1:] ** 2 - r_bins[:-1] ** 2)
    elif dim == 3:
        shell = (4.0 / 3.0) * jnp.pi * (r_bins[1:] ** 3 - r_bins[:-1] ** 3)
    else:
        raise ValueError(f"dim must be 2 or 3, got {dim}")
    rho_pairs = (n * (n - 1) / 2.0) / (box**dim)
    ideal_counts = rho_pairs * shell

    iu = jnp.triu(jnp.ones((n, n), dtype=bool), k=1)

    def snapshot_hist(r_snap):
        dr = pair_displacements(r_snap, box)
        r2 = jnp.sum(dr * dr, axis=-1)
        r2 = jnp.where(iu, r2, jnp.inf).ravel()  # (n*n,)
        # Comparison-based histogram: counts[b] = #(r < edge[b+1]) - #(r < edge[b]).
        # Pure VPU compare+reduce — no scatter (TPU scatters are descriptor-
        # serial and dominated the RDF wall time in the bucketize version).
        edges2 = r_bins * r_bins  # monotone, so compare in r^2 (no sqrt)
        below = jnp.sum(r2[None, :] < edges2[:, None], axis=1).astype(jnp.float32)
        return below[1:] - below[:-1]

    # Sequential over snapshots (lax.map): the per-snapshot compare block is
    # (nbins+1, n^2); batching it over all snapshots at once (vmap) would
    # materialize an O(S * nbins * n^2) intermediate.
    all_hists = jax.lax.map(snapshot_hist, r_history)
    g_r = jnp.mean(all_hists, axis=0) / ideal_counts
    return bin_centers, g_r
