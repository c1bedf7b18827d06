"""Blockwise O(N^2) pairwise-interaction kernels in Pallas (Mosaic/TPU).

The reference materializes the full (N, N, D) displacement tensor in HBM for
every force evaluation (molecular_dynamics...:51-53, three_particles...:25-28)
— at N = 100k that is 240 GB and simply cannot run. These kernels tile the
pair matrix into (TI, TJ) VMEM blocks, computing forces and per-particle
energies in one pass without ever materializing O(N^2) data — the
ring-attention dataflow applied to forces (SURVEY.md §2g/§5).

Layout notes (see pallas guide "Tiling Constraints"):
- positions are passed in two layouts: row-major (Npad, 8) for the i-block
  and transposed (8, Npad) for the j-block, so the (TI, TJ) broadcast
  ``xi[:, d:d+1] - xj[d:d+1, :]`` is a pure 2D VPU op;
- the coordinate dimension is padded to 8 sublanes (rows >= D are zero and
  contribute nothing to r^2);
- output is (Npad, 8): columns 0..D-1 force/acceleration, column D
  per-particle energy/potential.
- grid is (n_i, n_j) with the j axis innermost; the output block depends only
  on i, so Mosaic keeps it VMEM-resident across the j sweep (matmul-style
  accumulation).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

COORD_PAD = 8  # sublane padding for the coordinate axis


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_positions(position: jax.Array, n_pad: int) -> tuple[jax.Array, jax.Array]:
    """(N, D) -> row layout (n_pad, 8) and column layout (8, n_pad)."""
    n, d = position.shape
    rows = jnp.zeros((n_pad, COORD_PAD), dtype=position.dtype)
    rows = rows.at[:n, :d].set(position)
    return rows, rows.T


def _lj_kernel(
    xi_ref, xj_ref, out_ref, *, n, dim, ti, tj, sigma, epsilon, box, cutoff, shift
):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    row_ids = i * ti + jax.lax.broadcasted_iota(jnp.int32, (ti, tj), 0)
    col_ids = j * tj + jax.lax.broadcasted_iota(jnp.int32, (ti, tj), 1)
    valid = (row_ids != col_ids) & (row_ids < n) & (col_ids < n)

    dxs = []
    r2 = jnp.zeros((ti, tj), dtype=xi_ref.dtype)
    for d in range(dim):
        dx = xi_ref[:, d : d + 1] - xj_ref[d : d + 1, :]  # (TI, TJ)
        if box is not None:
            dx = dx - box * jnp.round(dx * (1.0 / box))
        dxs.append(dx)
        r2 = r2 + dx * dx

    if cutoff is not None:
        valid = valid & (r2 < cutoff * cutoff)

    r2_safe = jnp.where(valid, r2, 1.0)
    inv_r2 = (sigma * sigma) / r2_safe
    s6 = inv_r2 * inv_r2 * inv_r2
    s12 = s6 * s6

    fmag = jnp.where(valid, 24.0 * epsilon * (2.0 * s12 - s6) / r2_safe, 0.0)
    e_pair = jnp.where(valid, 4.0 * epsilon * (s12 - s6) - shift, 0.0)

    for d in range(dim):
        out_ref[:, d : d + 1] += jnp.sum(fmag * dxs[d], axis=1, keepdims=True)
    out_ref[:, dim : dim + 1] += jnp.sum(e_pair, axis=1, keepdims=True)


def make_lj_force_pallas(
    n: int,
    sigma: float = 1.0,
    epsilon: float = 1.0,
    box: Optional[float] = None,
    cutoff: Optional[float] = None,
    block_size: int = 256,
    interpret: Optional[bool] = None,
    with_energy: bool = False,
):
    """Returns ``force_fn(R) -> F`` (or ``(F, E_total)`` with
    ``with_energy=True``) computing the same physics as
    ``LennardJones(...).force`` blockwise.

    ``interpret=None`` auto-enables Pallas interpreter mode off-TPU so the
    same code path is testable on the CPU mesh.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    shift = 0.0
    if cutoff is not None:
        sc6 = (sigma / cutoff) ** 6
        shift = 4.0 * epsilon * (sc6 * sc6 - sc6)

    ti = tj = block_size
    n_pad = _round_up(max(n, block_size), block_size)
    grid = (n_pad // ti, n_pad // tj)

    kernel = functools.partial(
        _lj_kernel,
        n=n,
        ti=ti,
        tj=tj,
        sigma=float(sigma),
        epsilon=float(epsilon),
        box=None if box is None else float(box),
        cutoff=None if cutoff is None else float(cutoff),
        shift=float(shift),
    )

    def call(rows, cols, dim):
        return pl.pallas_call(
            functools.partial(kernel, dim=dim),
            grid=grid,
            in_specs=[
                pl.BlockSpec((ti, COORD_PAD), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((COORD_PAD, tj), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((ti, COORD_PAD), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_pad, COORD_PAD), rows.dtype),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=int(grid[0]) * int(grid[1]) * ti * tj * (dim * 4 + 12),
                bytes_accessed=n_pad * COORD_PAD * 4 * 3,
                transcendentals=0,
            ),
        )(rows, cols)

    def force_fn(position: jax.Array) -> jax.Array:
        nn, dim = position.shape
        assert nn == n, f"kernel built for N={n}, got {nn}"
        rows, cols = _pad_positions(position, n_pad)
        out = call(rows, cols, dim)
        f = out[:n, :dim]
        if with_energy:
            return f, 0.5 * jnp.sum(out[:n, dim])
        return f

    return force_fn


def make_lj_energy_pallas(
    n: int,
    sigma: float = 1.0,
    epsilon: float = 1.0,
    box: Optional[float] = None,
    cutoff: Optional[float] = None,
    block_size: int = 256,
    interpret: Optional[bool] = None,
):
    """Total LJ energy with a custom VJP (gradient = -force, both from the
    blockwise kernel) so ``jax.grad`` works without an O(N^2) residual —
    preserving the reference's forces-by-autodiff idiom
    (molecular_dynamics...:64) at Pallas speed."""
    fe_fn = make_lj_force_pallas(
        n, sigma, epsilon, box, cutoff, block_size, interpret, with_energy=True
    )

    @jax.custom_vjp
    def energy(position):
        _, e = fe_fn(position)
        return e

    def fwd(position):
        f, e = fe_fn(position)
        return e, f

    def bwd(f, g):
        return (-g * f,)

    energy.defvjp(fwd, bwd)
    return energy


# ---------------------------------------------------------------------------
# Gravity (softened) blockwise kernel
# ---------------------------------------------------------------------------

def _gravity_kernel(xi_ref, xj_ref, mj_ref, out_ref, *, n, dim, ti, tj, g, softening2):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    row_ids = i * ti + jax.lax.broadcasted_iota(jnp.int32, (ti, tj), 0)
    col_ids = j * tj + jax.lax.broadcasted_iota(jnp.int32, (ti, tj), 1)
    valid = (row_ids != col_ids) & (row_ids < n) & (col_ids < n)

    dxs = []
    r2 = jnp.zeros((ti, tj), dtype=xi_ref.dtype)
    for d in range(dim):
        dx = xj_ref[d : d + 1, :] - xi_ref[:, d : d + 1]  # r_j - r_i: (TI, TJ)
        dxs.append(dx)
        r2 = r2 + dx * dx

    r2 = r2 + softening2
    r2_safe = jnp.where(valid, r2, 1.0)
    inv_r = jax.lax.rsqrt(r2_safe)
    inv_r3 = inv_r * inv_r * inv_r
    mj = mj_ref[0:1, :]  # (1, TJ)
    amag = jnp.where(valid, g * mj * inv_r3, 0.0)
    phi = jnp.where(valid, -g * mj * inv_r, 0.0)

    for d in range(dim):
        out_ref[:, d : d + 1] += jnp.sum(amag * dxs[d], axis=1, keepdims=True)
    out_ref[:, dim : dim + 1] += jnp.sum(phi, axis=1, keepdims=True)


def make_gravity_accel_pallas(
    n: int,
    g: float = 1.0,
    softening: float = 0.0,
    block_size: int = 256,
    interpret: Optional[bool] = None,
    with_potential: bool = False,
):
    """Returns ``accel_fn(R, masses) -> A`` (plummer-softened), optionally
    also the per-particle potential-per-unit-mass phi_i (total potential
    energy = 0.5 * sum_i m_i phi_i). Blockwise equivalent of
    ``Gravity(mode='plummer').acceleration``."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    ti = tj = block_size
    n_pad = _round_up(max(n, block_size), block_size)
    grid = (n_pad // ti, n_pad // tj)

    def call(rows, cols, masses_pad, dim):
        kernel = functools.partial(
            _gravity_kernel,
            n=n,
            dim=dim,
            ti=ti,
            tj=tj,
            g=float(g),
            softening2=float(softening) ** 2,
        )
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((ti, COORD_PAD), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((COORD_PAD, tj), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((COORD_PAD, tj), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((ti, COORD_PAD), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_pad, COORD_PAD), rows.dtype),
            interpret=interpret,
        )(rows, cols, masses_pad)

    def accel_fn(position: jax.Array, masses: jax.Array):
        nn, dim = position.shape
        assert nn == n, f"kernel built for N={n}, got {nn}"
        rows, cols = _pad_positions(position, n_pad)
        m_pad = jnp.zeros((COORD_PAD, n_pad), dtype=position.dtype)
        m_pad = m_pad.at[0, :nn].set(masses)
        out = call(rows, cols, m_pad, dim)
        a = out[:n, :dim]
        if with_potential:
            return a, out[:n, dim]
        return a

    return accel_fn
