"""Quantum models for variational / diffusion Monte Carlo.

Reference model: D-dimensional harmonic oscillator with Gaussian trial
wavefunction (vmc_dmc...:30-47): V = 0.5 |x|^2, log psi = -alpha |x|^2,
closed-form local kinetic energy. Exact ground state: E_0 = D/2 at
alpha = 0.5 — the built-in physics oracle used by our tests.

Beyond the reference, ``generic_local_energy`` derives E_L for *any* log-psi
via forward-over-reverse autodiff (Laplacian of log psi + |grad log psi|^2),
so new trial wavefunctions need only a ``log_psi``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class HarmonicOscillator:
    """V(x) = 0.5 |x|^2 with trial psi_alpha(x) = exp(-alpha |x|^2)."""

    dim: int = struct.field(pytree_node=False, default=3)

    def potential(self, x: jax.Array) -> jax.Array:
        return 0.5 * jnp.sum(x**2, axis=-1)

    def log_psi(self, params: jax.Array, x: jax.Array) -> jax.Array:
        return -params * jnp.sum(x**2, axis=-1)

    def local_energy(self, params: jax.Array, x: jax.Array) -> jax.Array:
        """Closed form (vmc_dmc...:36-47):
        KE = -0.5 (lap log psi + |grad log psi|^2) = -0.5 (-2 a D + 4 a^2 r^2)."""
        r2 = jnp.sum(x**2, axis=-1)
        ke = -0.5 * (-2.0 * params * self.dim + 4.0 * params**2 * r2)
        return ke + self.potential(x)

    def drift_force(self, params: jax.Array, x: jax.Array) -> jax.Array:
        """Quantum drift grad log psi = -2 alpha x (vmc_dmc...:230-233)."""
        return -2.0 * params * x

    def exact_energy(self) -> float:
        return 0.5 * self.dim

    def exact_params(self) -> float:
        return 0.5


def generic_local_energy(
    log_psi: Callable[[jax.Array, jax.Array], jax.Array],
    potential: Callable[[jax.Array], jax.Array],
) -> Callable[[jax.Array, jax.Array], jax.Array]:
    """E_L(x) = -0.5 (lap log psi + |grad log psi|^2) + V(x) for a single
    walker x of shape (dim,), any differentiable log_psi(params, x)."""

    def e_l(params, x):
        g_fn = jax.grad(log_psi, argnums=1)
        g = g_fn(params, x)
        # Laplacian: trace of the Hessian of log psi via forward-over-reverse.
        lap = jnp.trace(jax.jacfwd(g_fn, argnums=1)(params, x))
        return -0.5 * (lap + jnp.sum(g * g)) + potential(x)

    return e_l
