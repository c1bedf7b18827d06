"""Pallas cell-grid LJ force kernel (2D, packed rows) — lane packing for
medium grids.

The base 2D kernel (cell_pallas.py) stores the cell grid as
``(ncx, C, ncy_pad)`` with ``ncy_pad = round_up(ncy, 128)``: at N=16k
(ncy = 49) that wastes 62% of every lane vector. Here ``R`` consecutive
cell ROWS are packed into the lane axis — layout ``(G, C, P)`` with
``G = ncx / R`` blocks, lane ``r * ncy + cy``, ``P = round_up(R*ncy, 128)``
— the same packed-plane idea as the 3D kernel (cell_pallas3.py), applied to
(row-in-group, column) instead of (y, z). Lane utilization goes from
``ncy/128`` to ``R*ncy/P`` (89-100%).

Everything that makes the base kernel fast carries over (see its docstring
for the measurements): x-sentinel empty slots, per-block periodic-seam
patches, single reciprocal, Newton's third law (5 pair blocks), BlockSpec
index-map neighbor blocks. Packing specifics:

- **(0,+1) column offset**: an in-plane y-roll with the per-sub-row wrap
  column patched (±box on the y coordinate) — the 3D kernel's z-shift with
  ``ncz = ncy``.
- **(+1, dy) row offsets**: the partner plane is assembled from a roll of
  the SELF block (sub-rows 0..R-2 read sub-row+1) with sub-row R-1 patched
  from the NEXT block's sub-row 0 (x pre-adjusted by +box on the last
  program, which owns the periodic x seam). Reactions split the same way:
  the in-block part (sub-rows >= 1) folds into the self force output; the
  block-crossing part (sub-row 0 of the next block) accumulates into the
  reaction output written at block (i+1) % G. With R = 1 both reduce
  exactly to the base kernel's row handling.

Physics is the reference's LJ 6-12 (molecular_dynamics_jax_single-host_
workload.py:50-62) — cross-checked against the dense oracle in
tests/test_grid_md.py.

Interface (``make_grid_force_kernel_packed``): ``(xg, yg) -> (fx, fy)``
totals (or ``(fx, fy, e, w)``) on the packed (G, C, P) layout.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jax_tpus_benchmark_physics_simulation_tpu.ops.kernels.cell_dense import CellGridFn
from jax_tpus_benchmark_physics_simulation_tpu.ops.kernels.cell_pallas import _round_up


def choose_rows_per_block(cps: int, max_lanes: int = 4096) -> int:
    """Packing factor for a (cps x cps) cell grid: the divisor R of cps
    maximizing lane utilization ``R*cps / round_up(R*cps, 128)`` subject to
    ``R*cps <= max_lanes`` (pair-block VMEM budget), smallest R on ties.
    Returns 1 when packing would gain < 5% (e.g. cps >= 121, already
    94.5%+ utilized)."""
    base_u = cps / _round_up(cps, 128)
    best_r, best_u = 1, base_u
    for r in range(2, cps + 1):
        if cps % r or r * cps > max_lanes:
            continue
        u = (r * cps) / _round_up(r * cps, 128)
        if u > best_u + 1e-9:
            best_r, best_u = r, u
    if best_u < base_u + 0.05:
        return 1
    return best_r


def _shift_col(block: jax.Array, dy: int, ncy: int, delta: float = 0.0) -> jax.Array:
    """``out[:, r*ncy + y] = block[:, r*ncy + (y+dy)%ncy]`` on the packed
    plane (per-sub-row periodic y shift). The wrap column of every sub-row
    gets ``±delta`` (pass ``box`` when shifting the y coordinate)."""
    if dy == 0:
        return block
    n = block.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, block.shape, 1)
    main = pltpu.roll(block, (-dy) % n, axis=1)
    if dy == 1:
        wrap = pltpu.roll(block, (ncy - 1) % n, axis=1)
        return jnp.where(col % ncy == ncy - 1, wrap + delta, main)
    wrap = pltpu.roll(block, (-(ncy - 1)) % n, axis=1)
    return jnp.where(col % ncy == 0, wrap - delta, main)


def _next_row_plane(self_b: jax.Array, next_b: jax.Array, ncy: int, rpb: int) -> jax.Array:
    """Partner plane for the (+1, 0) row offset: sub-rows 0..R-2 read the
    self block's sub-row+1; sub-row R-1 reads the next block's sub-row 0
    (the caller pre-adjusts next_b's x by +box on the seam program)."""
    n = self_b.shape[1]
    main = pltpu.roll(self_b, (-ncy) % n, axis=1)
    cross = pltpu.roll(next_b, ((rpb - 1) * ncy) % n, axis=1)
    sub = jax.lax.broadcasted_iota(jnp.int32, self_b.shape, 1) // ncy
    return jnp.where(sub == rpb - 1, cross, main)


def _split_reaction(q: jax.Array, ncy: int, rpb: int):
    """Reaction sums of a (+1, dy) block (already y-unshifted), expressed in
    the partner rows' own frames: ``(self_part, next_part)`` where self_part
    lands on the self block's sub-rows >= 1 and next_part on the NEXT
    block's sub-row 0."""
    n = q.shape[1]
    sub = jax.lax.broadcasted_iota(jnp.int32, q.shape, 1) // ncy
    zero = jnp.zeros_like(q)
    self_part = jnp.where(sub >= 1, pltpu.roll(q, ncy % n, axis=1), zero)
    next_part = jnp.where(sub == 0, pltpu.roll(q, (-(rpb - 1) * ncy) % n, axis=1), zero)
    return self_part, next_part


def _packed_kernel(
    *refs,
    cap,
    ncy,
    rpb,
    box,
    cutoff2,
    sigma2,
    epsilon,
    shift,
    n_blocks,
    with_energy,
):
    """Packed Newton cell kernel. Ref order:
    (xs, xn, ys, yn) -> (fx, fy, rfx, rfy[, e, re, w, rw])."""
    if with_energy:
        (xs_ref, xn_ref, ys_ref, yn_ref, fx_ref, fy_ref, rfx_ref, rfy_ref,
         e_ref, re_ref, w_ref, rw_ref) = refs
    else:
        xs_ref, xn_ref, ys_ref, yn_ref, fx_ref, fy_ref, rfx_ref, rfy_ref = refs
        e_ref = re_ref = w_ref = rw_ref = None

    x_self = xs_ref[0]  # (C, P)
    y_self = ys_ref[0]
    x_next = xn_ref[0]
    y_next = yn_ref[0]
    pid = pl.program_id(0)
    # periodic x seam: the last program's next block is physical row 0
    x_next = x_next + jnp.where(pid == n_blocks - 1, box, 0.0).astype(x_next.dtype)

    lanes = x_self.shape[1]
    kk = (cap * cap, lanes)
    sh3 = (cap, cap, lanes)
    fscale = 24.0 * epsilon / sigma2

    def rep_a(v):
        return jnp.broadcast_to(v[:, None, :], sh3).reshape(kk)

    def rep_b(v):
        return jnp.broadcast_to(v[None, :, :], sh3).reshape(kk)

    x_i = rep_a(x_self)
    y_i = rep_a(y_self)

    def pair(x_o, y_o, self_block=False):
        x_j = rep_b(x_o)
        y_j = rep_b(y_o)
        dx = x_i - x_j
        dyy = y_i - y_j
        r2 = dx * dx + dyy * dyy
        valid = (r2 < cutoff2) & (r2 > 0.0)
        if self_block:
            sub = jax.lax.broadcasted_iota(jnp.int32, kk, 0)
            valid = valid & (sub // cap < sub % cap)
        # approx-reciprocal + one Newton step instead of divide+guard-select
        # (~1 fma-slot/pair saved; ~1e-7 rel err — see cell_pallas.py)
        inv = pl.reciprocal(r2, approx=True)
        inv = inv * (2.0 - r2 * inv)
        if sigma2 != 1.0:
            inv = sigma2 * inv
        s6 = inv * inv * inv
        s12 = s6 * s6
        fmag = jnp.where(valid, (2.0 * s12 - s6) * inv, 0.0) * fscale
        fxb = (fmag * dx).reshape(sh3)
        fyb = (fmag * dyy).reshape(sh3)
        out = [
            jnp.sum(fxb, axis=1),
            jnp.sum(fyb, axis=1),
            jnp.sum(fxb, axis=0),
            jnp.sum(fyb, axis=0),
        ]
        if with_energy:
            eb = jnp.where(valid, 4.0 * epsilon * (s12 - s6) - shift, 0.0).reshape(sh3)
            out += [jnp.sum(eb, axis=1), jnp.sum(eb, axis=0)]
            # pair virial r.f = 24*eps*(2*s12 - s6) (pressure observable)
            wb = jnp.where(valid, (2.0 * s12 - s6), 0.0).reshape(sh3) * (
                fscale * sigma2
            )
            out += [jnp.sum(wb, axis=1), jnp.sum(wb, axis=0)]
        return out

    # (0,0): same cell, each pair counted once (a < b), reaction in-block
    out = pair(x_self, y_self, self_block=True)
    fx_acc = out[0] - out[2]
    fy_acc = out[1] - out[3]
    if with_energy:
        e_acc = out[4] + out[5]
        w_acc = out[6] + out[7]

    # (0,+1): next column, same physical row; reaction shifted back in-plane
    out = pair(_shift_col(x_self, 1, ncy), _shift_col(y_self, 1, ncy, box))
    fx_acc += out[0] - _shift_col(out[2], -1, ncy)
    fy_acc += out[1] - _shift_col(out[3], -1, ncy)
    if with_energy:
        e_acc += out[4] + _shift_col(out[5], -1, ncy)
        w_acc += out[6] + _shift_col(out[7], -1, ncy)

    # (+1, dy): next physical row — partner plane assembled from the self
    # block (sub-rows 0..R-2) and the next block's first sub-row.
    px_row = _next_row_plane(x_self, x_next, ncy, rpb)
    py_row = _next_row_plane(y_self, y_next, ncy, rpb)
    rfx_acc = rfy_acc = re_acc = rw_acc = None
    for dy in (-1, 0, 1):
        out = pair(_shift_col(px_row, dy, ncy), _shift_col(py_row, dy, ncy, box))
        fx_acc += out[0]
        fy_acc += out[1]
        sx, nx = _split_reaction(_shift_col(out[2], -dy, ncy), ncy, rpb)
        sy, ny = _split_reaction(_shift_col(out[3], -dy, ncy), ncy, rpb)
        fx_acc -= sx
        fy_acc -= sy
        if rfx_acc is None:
            rfx_acc, rfy_acc = -nx, -ny
        else:
            rfx_acc -= nx
            rfy_acc -= ny
        if with_energy:
            e_acc += out[4]
            se, ne = _split_reaction(_shift_col(out[5], -dy, ncy), ncy, rpb)
            e_acc += se
            re_acc = ne if re_acc is None else re_acc + ne
            w_acc += out[6]
            sw, nw = _split_reaction(_shift_col(out[7], -dy, ncy), ncy, rpb)
            w_acc += sw
            rw_acc = nw if rw_acc is None else rw_acc + nw

    # zero the padding lanes (rolls duplicate seam values into them)
    live = jax.lax.broadcasted_iota(jnp.int32, fx_acc.shape, 1) < rpb * ncy
    zero = jnp.zeros_like(fx_acc)
    fx_ref[0] = jnp.where(live, fx_acc, zero)
    fy_ref[0] = jnp.where(live, fy_acc, zero)
    rfx_ref[0] = jnp.where(live, rfx_acc, zero)
    rfy_ref[0] = jnp.where(live, rfy_acc, zero)
    if with_energy:
        e_ref[0] = jnp.where(live, e_acc, zero)
        re_ref[0] = jnp.where(live, re_acc, zero)
        w_ref[0] = jnp.where(live, w_acc, zero)
        rw_ref[0] = jnp.where(live, rw_acc, zero)


def make_grid_force_kernel_packed(
    grid_fn: CellGridFn,
    rows_per_block: int,
    sigma: float = 1.0,
    epsilon: float = 1.0,
    interpret: Optional[bool] = None,
    with_energy: bool = False,
):
    """Packed-layout grid entry point: ``(xg, yg) -> (fx, fy)`` (or
    ``(fx, fy, e, w)``) where the arrays have the packed (G, C, P) layout with
    x-sentinels at empty slots (grid_md.GridMD with rows_per_block > 1).
    Forces/energies are reaction-folded totals; base-layout counterpart:
    cell_pallas.make_grid_force_kernel."""
    assert grid_fn.dim == 2, "packed cell kernel is 2D"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    cps, cap, box, cutoff = (
        grid_fn.cells_per_side,
        grid_fn.capacity,
        grid_fn.box,
        grid_fn.cutoff,
    )
    rpb = rows_per_block
    assert cps % rpb == 0, f"rows_per_block {rpb} must divide cells_per_side {cps}"
    n_blocks = cps // rpb
    lanes = _round_up(rpb * cps, 128)
    sc6 = (sigma / cutoff) ** 6
    shift = 4.0 * epsilon * (sc6 * sc6 - sc6)
    params = dict(
        cap=cap,
        ncy=cps,
        rpb=rpb,
        box=float(box),
        cutoff2=float(cutoff) ** 2,
        sigma2=float(sigma) ** 2,
        epsilon=float(epsilon),
        shift=float(shift),
        n_blocks=n_blocks,
        with_energy=with_energy,
    )
    n_out = 8 if with_energy else 4

    def block(index_map):
        return pl.BlockSpec((1, cap, lanes), index_map, memory_space=pltpu.VMEM)

    self_blk = block(lambda i: (i, 0, 0))
    next_blk = block(lambda i: ((i + 1) % n_blocks, 0, 0))
    out_struct = jax.ShapeDtypeStruct((n_blocks, cap, lanes), jnp.float32)
    cost = pl.CostEstimate(
        flops=n_blocks * 5 * cap * cap * lanes * 22,
        bytes_accessed=(4 + n_out) * n_blocks * cap * lanes * 4,
        transcendentals=0,
    )

    kernel = functools.partial(_packed_kernel, **params)
    out_specs = [self_blk, self_blk, next_blk, next_blk]
    if with_energy:
        out_specs += [self_blk, next_blk, self_blk, next_blk]
    call = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[self_blk, next_blk, self_blk, next_blk],
        out_specs=out_specs,
        out_shape=[out_struct] * n_out,
        interpret=interpret,
        cost_estimate=cost,
        # ~10 live (cap*cap, P) temporaries at P up to 4096: above Mosaic's
        # 16 MB default scoped limit, far under the chip's 128 MB VMEM
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )

    def grid_force(xg, yg):
        out = call(xg, xg, yg, yg)
        fx = out[0] + out[2]
        fy = out[1] + out[3]
        if with_energy:
            return fx, fy, out[4] + out[5], out[6] + out[7]
        return fx, fy

    return grid_force
