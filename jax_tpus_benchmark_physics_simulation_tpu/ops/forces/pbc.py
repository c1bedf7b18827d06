"""Periodic boundary condition helpers (minimum-image convention).

Reference: ``periodic_displacement`` at molecular_dynamics...:46-48 and the
position wrap ``jnp.mod(R, box)`` at :72.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def minimum_image(dr: jax.Array, box: jax.Array | float) -> jax.Array:
    """Minimum-image displacement: ``dr - box * round(dr / box)``."""
    return dr - box * jnp.round(dr / box)


def wrap(position: jax.Array, box: jax.Array | float) -> jax.Array:
    """Wrap positions into ``[0, box)``."""
    return jnp.mod(position, box)


def pair_displacements(position: jax.Array, box=None) -> jax.Array:
    """All-pairs displacement tensor ``dr[i, j] = R_i - R_j``, shape (N, N, D).

    With ``box`` set, applies minimum image. This is the dense O(N^2) path
    (the reference's only path, molecular_dynamics...:51-52); the Pallas
    kernels in ``ops.kernels`` compute the same physics blockwise without
    ever materializing (N, N, D).
    """
    dr = position[:, None, :] - position[None, :, :]
    if box is not None:
        dr = minimum_image(dr, box)
    return dr
