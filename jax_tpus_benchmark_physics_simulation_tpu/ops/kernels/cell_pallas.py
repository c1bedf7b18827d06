"""Pallas cell-grid LJ force kernel (2D) — the speed-of-light MD hot path.

Refines the XLA cell-dense path (cell_dense.py): instead of materializing
(n_cells, C, C) pair blocks in HBM, each Pallas program owns one row of the
cell grid and computes all 9 neighbor-offset pair blocks entirely in VMEM.

Layout: the cell grid is stored as (ncx, C, ncy_pad) with the *cell-column*
axis in lanes (padded to 128) and slots in sublanes — so a pair block is a
(C*C, ncy_pad) 2D array: 256 sublanes x 128+ lanes, exactly what the VPU
wants. Row adjacency (x +- 1) comes from whole-grid rolls prepared outside
the kernel; column adjacency (y +- 1) from an in-kernel lane roll with an
explicit periodic patch at the wrap column (the lane axis is padded, so a
bare roll would wrap through padding).

Per MD step the host-side wrapper does one (N,) scatter in, one (N,) gather
out; everything else is regular VPU work.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jax_tpus_benchmark_physics_simulation_tpu.ops.kernels.cell_dense import CellGridFn


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _shift_wrap(block: jax.Array, dy: int, ncy: int) -> jax.Array:
    """out[:, j] = block[:, (j + dy) % ncy] on a lane-padded block."""
    if dy == 0:
        return block
    n_lanes = block.shape[1]
    shifted = pltpu.roll(block, (-dy) % n_lanes, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, block.shape, 1)
    if dy == 1:
        return jnp.where(col == ncy - 1, block[:, 0:1], shifted)
    return jnp.where(col == 0, block[:, ncy - 1 : ncy], shifted)


def _cell_kernel(
    xs_ref, xp_ref, xn_ref, ys_ref, yp_ref, yn_ref, os_ref, op_ref, on_ref,
    fx_ref, fy_ref, e_ref,
    *, cap, ncy, box, cutoff2, sigma2, epsilon, shift,
):
    x_self = xs_ref[0]  # (C, ncy_pad)
    y_self = ys_ref[0]
    o_self = os_ref[0]
    lanes = x_self.shape[1]
    kk = (cap * cap, lanes)

    def rep_a(v):  # self coords, a-major: row k = a*C + b holds v[a]
        return jnp.broadcast_to(v[:, None, :], (cap, cap, lanes)).reshape(kk)

    def rep_b(v):  # partner coords: row k = a*C + b holds v[b]
        return jnp.broadcast_to(v[None, :, :], (cap, cap, lanes)).reshape(kk)

    x_i = rep_a(x_self)
    y_i = rep_a(y_self)
    o_i = rep_a(o_self)

    sub = jax.lax.broadcasted_iota(jnp.int32, kk, 0)
    a_ids = sub // cap
    b_ids = sub % cap

    fx_acc = jnp.zeros_like(x_self)
    fy_acc = jnp.zeros_like(x_self)
    e_acc = jnp.zeros_like(x_self)

    for xb, yb, ob, is_self_row in (
        (xp_ref[0], yp_ref[0], op_ref[0], False),
        (x_self, y_self, o_self, True),
        (xn_ref[0], yn_ref[0], on_ref[0], False),
    ):
        for dy in (-1, 0, 1):
            x_o = _shift_wrap(xb, dy, ncy)
            y_o = _shift_wrap(yb, dy, ncy)
            o_o = _shift_wrap(ob, dy, ncy)

            x_j = rep_b(x_o)
            y_j = rep_b(y_o)
            o_j = rep_b(o_o)

            dx = x_i - x_j
            dx = dx - box * jnp.round(dx * (1.0 / box))
            dy_ = y_i - y_j
            dy_ = dy_ - box * jnp.round(dy_ * (1.0 / box))
            r2 = dx * dx + dy_ * dy_

            valid = (o_i > 0.5) & (o_j > 0.5) & (r2 < cutoff2)
            if is_self_row and dy == 0:
                valid = valid & (a_ids != b_ids)

            r2_safe = jnp.where(valid, r2, 1.0)
            inv_r2 = sigma2 / r2_safe
            s6 = inv_r2 * inv_r2 * inv_r2
            s12 = s6 * s6
            fmag = jnp.where(valid, 24.0 * epsilon * (2.0 * s12 - s6) / r2_safe, 0.0)
            e_pair = jnp.where(valid, 4.0 * epsilon * (s12 - s6) - shift, 0.0)

            # reduce over partner slots b: (C*C, L) -> (C, C, L) -> sum axis 1
            shape3 = (cap, cap, x_i.shape[1])
            fx_acc += jnp.sum((fmag * dx).reshape(shape3), axis=1)
            fy_acc += jnp.sum((fmag * dy_).reshape(shape3), axis=1)
            e_acc += jnp.sum(e_pair.reshape(shape3), axis=1)

    fx_ref[0] = fx_acc
    fy_ref[0] = fy_acc
    e_ref[0] = e_acc


def _cell_kernel_newton(
    xs_ref, xn_ref, ys_ref, yn_ref, os_ref, on_ref,
    fx_ref, fy_ref, e_ref, rfx_ref, rfy_ref, re_ref,
    *, cap, ncy, box, cutoff2, sigma2, epsilon, shift,
):
    """Newton's-third-law variant: each program computes 5 pair blocks
    instead of 9 — the same-cell block, the (0,+1) column block (reaction
    folded back in-row), and the three (+1, dy) row blocks whose reactions
    are emitted into a per-row reaction buffer that the caller rolls onto
    row i+1. ~45% less pair compute than the symmetric kernel."""
    x_self = xs_ref[0]
    y_self = ys_ref[0]
    o_self = os_ref[0]
    lanes = x_self.shape[1]
    kk = (cap * cap, lanes)

    def rep_a(v):
        return jnp.broadcast_to(v[:, None, :], (cap, cap, lanes)).reshape(kk)

    def rep_b(v):
        return jnp.broadcast_to(v[None, :, :], (cap, cap, lanes)).reshape(kk)

    x_i = rep_a(x_self)
    y_i = rep_a(y_self)
    o_i = rep_a(o_self)

    sub = jax.lax.broadcasted_iota(jnp.int32, kk, 0)
    a_ids = sub // cap
    b_ids = sub % cap
    shape3 = (cap, cap, lanes)

    def pair(x_o, y_o, o_o, extra_mask=None):
        """Returns (f_self_x, f_self_y, e_self, r_x, r_y, r_e): forces on the
        a-side and the (negated-later) reaction sums on the b-side."""
        x_j = rep_b(x_o)
        y_j = rep_b(y_o)
        o_j = rep_b(o_o)
        dx = x_i - x_j
        dx = dx - box * jnp.round(dx * (1.0 / box))
        dy_ = y_i - y_j
        dy_ = dy_ - box * jnp.round(dy_ * (1.0 / box))
        r2 = dx * dx + dy_ * dy_
        valid = (o_i > 0.5) & (o_j > 0.5) & (r2 < cutoff2)
        if extra_mask is not None:
            valid = valid & extra_mask
        r2_safe = jnp.where(valid, r2, 1.0)
        inv_r2 = sigma2 / r2_safe
        s6 = inv_r2 * inv_r2 * inv_r2
        s12 = s6 * s6
        fmag = jnp.where(valid, 24.0 * epsilon * (2.0 * s12 - s6) / r2_safe, 0.0)
        e_pair = jnp.where(valid, 4.0 * epsilon * (s12 - s6) - shift, 0.0)
        fxb = (fmag * dx).reshape(shape3)
        fyb = (fmag * dy_).reshape(shape3)
        eb = e_pair.reshape(shape3)
        return (
            jnp.sum(fxb, axis=1), jnp.sum(fyb, axis=1), jnp.sum(eb, axis=1),
            jnp.sum(fxb, axis=0), jnp.sum(fyb, axis=0), jnp.sum(eb, axis=0),
        )

    # (0,0): same cell, count each pair once (a < b), reaction in-block
    fx, fy, e, rx, ry, re_ = pair(x_self, y_self, o_self, extra_mask=(a_ids < b_ids))
    fx_acc = fx - rx
    fy_acc = fy - ry
    e_acc = e + re_

    # (0,+1): same row, next column; reaction shifted back one column
    x_o = _shift_wrap(x_self, 1, ncy)
    y_o = _shift_wrap(y_self, 1, ncy)
    o_o = _shift_wrap(o_self, 1, ncy)
    fx, fy, e, rx, ry, re_ = pair(x_o, y_o, o_o)
    fx_acc += fx
    fy_acc += fy
    e_acc += e
    fx_acc -= _shift_wrap(rx, -1, ncy)
    fy_acc -= _shift_wrap(ry, -1, ncy)
    e_acc += _shift_wrap(re_, -1, ncy)

    # (+1, dy): next row; reactions accumulate into the reaction buffer,
    # expressed in the next row's own lane frame (shift back by dy)
    x_next = xn_ref[0]
    y_next = yn_ref[0]
    o_next = on_ref[0]
    rfx_acc = jnp.zeros_like(x_self)
    rfy_acc = jnp.zeros_like(x_self)
    re_acc = jnp.zeros_like(x_self)
    for dy in (-1, 0, 1):
        x_o = _shift_wrap(x_next, dy, ncy)
        y_o = _shift_wrap(y_next, dy, ncy)
        o_o = _shift_wrap(o_next, dy, ncy)
        fx, fy, e, rx, ry, re_ = pair(x_o, y_o, o_o)
        fx_acc += fx
        fy_acc += fy
        e_acc += e
        rfx_acc -= _shift_wrap(rx, -dy, ncy)
        rfy_acc -= _shift_wrap(ry, -dy, ncy)
        re_acc += _shift_wrap(re_, -dy, ncy)

    fx_ref[0] = fx_acc
    fy_ref[0] = fy_acc
    e_ref[0] = e_acc
    rfx_ref[0] = rfx_acc
    rfy_ref[0] = rfy_acc
    re_ref[0] = re_acc


def make_grid_force_kernel(
    grid_fn: CellGridFn,
    sigma: float = 1.0,
    epsilon: float = 1.0,
    interpret: Optional[bool] = None,
    newton: bool = True,
    n_rows: Optional[int] = None,
):
    """Grid-level entry point: ``(xg, yg, occ) -> (fxg, fyg, eg)`` where all
    arrays have the (ncx, C, ncy_pad) cell-grid layout. Used directly by the
    grid-resident MD engine (grid_md.py) — no per-particle scatter/gather.

    ``n_rows``: number of cell rows the call operates on (default: the full
    grid). The sharded engine passes the per-device row count and uses the
    attached ``.raw(xs, xn, ys, yn, os, on)`` (Newton mode), supplying
    halo-built next-row arrays itself; ``.raw`` returns
    ``(fx, fy, e, rfx, rfy, re)`` with the reaction buffer UNSHIFTED (row i
    holds the reaction destined for row i+1 — the caller owns the shift,
    which crosses device boundaries when sharded)."""
    assert grid_fn.dim == 2, "Pallas cell kernel is 2D; use cell_dense for 3D"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    cps, cap, box, cutoff = (
        grid_fn.cells_per_side,
        grid_fn.capacity,
        grid_fn.box,
        grid_fn.cutoff,
    )
    ncy_pad = _round_up(cps, 128)
    sc6 = (sigma / cutoff) ** 6
    shift = 4.0 * epsilon * (sc6 * sc6 - sc6)
    params = dict(
        cap=cap,
        ncy=cps,
        box=float(box),
        cutoff2=float(cutoff) ** 2,
        sigma2=float(sigma) ** 2,
        epsilon=float(epsilon),
        shift=float(shift),
    )

    rows = cps if n_rows is None else n_rows
    block = pl.BlockSpec((1, cap, ncy_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    grid = (rows,)
    out_struct = jax.ShapeDtypeStruct((rows, cap, ncy_pad), jnp.float32)

    if newton:
        kernel = functools.partial(_cell_kernel_newton, **params)

        def raw(xs, xn, ys, yn, os_, on_):
            return pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=[block] * 6,
                out_specs=[block] * 6,
                out_shape=[out_struct] * 6,
                interpret=interpret,
                cost_estimate=pl.CostEstimate(
                    flops=rows * 5 * cap * cap * ncy_pad * 30,
                    bytes_accessed=12 * rows * cap * ncy_pad * 4,
                    transcendentals=0,
                ),
            )(xs, xn, ys, yn, os_, on_)

        def grid_force(xg, yg, og):
            xn = jnp.roll(xg, -1, axis=0)
            yn = jnp.roll(yg, -1, axis=0)
            on_ = jnp.roll(og, -1, axis=0)
            fx, fy, e, rfx, rfy, re_ = raw(xg, xn, yg, yn, og, on_)
            # reaction buffer of row i applies to row i+1
            fx = fx + jnp.roll(rfx, 1, axis=0)
            fy = fy + jnp.roll(rfy, 1, axis=0)
            e = e + jnp.roll(re_, 1, axis=0)
            return fx, fy, e

        grid_force.raw = raw
        return grid_force

    kernel = functools.partial(_cell_kernel, **params)

    def grid_force(xg, yg, og):
        xp, xn = jnp.roll(xg, 1, axis=0), jnp.roll(xg, -1, axis=0)
        yp, yn = jnp.roll(yg, 1, axis=0), jnp.roll(yg, -1, axis=0)
        op_, on_ = jnp.roll(og, 1, axis=0), jnp.roll(og, -1, axis=0)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[block] * 9,
            out_specs=[block] * 3,
            out_shape=[out_struct] * 3,
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=cps * 9 * cap * cap * ncy_pad * 30,
                bytes_accessed=9 * cps * cap * ncy_pad * 4,
                transcendentals=0,
            ),
        )(xg, xp, xn, yg, yp, yn, og, op_, on_)

    return grid_force


def make_lj_force_cell_pallas(
    grid_fn: CellGridFn,
    sigma: float = 1.0,
    epsilon: float = 1.0,
    interpret: Optional[bool] = None,
    with_energy: bool = False,
):
    """Returns ``force_fn(R, assign) -> F`` (or ``(F, E_total)``) over the
    CellGridFn/CellAssignment machinery of cell_dense.py — same physics as
    ``LennardJones(box, cutoff)``, cross-checked in tests/test_cell_dense.py.
    2D only (the reference MD workload is 2D, molecular_dynamics...:15)."""
    cps, cap = grid_fn.cells_per_side, grid_fn.capacity
    ncy_pad = _round_up(cps, 128)
    grid_force = make_grid_force_kernel(grid_fn, sigma, epsilon, interpret)

    def force_fn(position: jax.Array, assign):
        n = position.shape[0]
        slot = assign.slot  # layout: (cx * cps + cy) * cap + a  (cell_dense.build)
        cell_id = slot // cap
        a = slot % cap
        cx = cell_id // cps
        cy = cell_id % cps
        slot2 = (cx * cap + a) * ncy_pad + cy

        size = cps * cap * ncy_pad
        dtype = position.dtype
        xg = jnp.zeros((size,), dtype).at[slot2].set(position[:, 0])
        yg = jnp.zeros((size,), dtype).at[slot2].set(position[:, 1])
        og = jnp.zeros((size,), dtype).at[slot2].set(1.0)
        xg = xg.reshape(cps, cap, ncy_pad)
        yg = yg.reshape(cps, cap, ncy_pad)
        og = og.reshape(cps, cap, ncy_pad)

        fx, fy, e = grid_force(xg, yg, og)
        f = jnp.stack(
            [fx.reshape(-1)[slot2], fy.reshape(-1)[slot2]], axis=1
        )
        if with_energy:
            return f, 0.5 * jnp.sum(e.reshape(-1)[slot2])
        return f

    if with_energy:
        return force_fn

    def energy_fn(position: jax.Array, assign):
        fe = make_lj_force_cell_pallas(
            grid_fn, sigma, epsilon, interpret, with_energy=True
        )
        return fe(position, assign)[1]

    force_fn.energy = energy_fn
    return force_fn
