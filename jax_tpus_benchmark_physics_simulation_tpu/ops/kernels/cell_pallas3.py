"""Pallas cell-grid LJ force kernel (3D) — packed-lane generalization of the
2D kernel (cell_pallas.py).

Layout: the 3D cell grid ``(ncx, ncy, ncz)`` is stored as ``(ncx, C, P)``
with the (y, z) cell plane PACKED into the lane axis — lane ``cy*ncz + cz``,
padded to ``P = round_up(ncy*ncz, 128)``. Each Pallas program owns one x-row
of cells: a (C, P) block per coordinate. Packing the plane instead of padding
each z-column to 128 (the naive ``(ncx*ncy, C, ncz_pad)`` layout) keeps lane
utilization at ``ncy*ncz/P`` (75-100%) instead of ``ncz/128`` (~13% at the
N=100k scale) — the lane-packing idea from round 1's known-waste list
(results/RESULTS.md) applied where it matters most.

Everything that made the 2D kernel fast carries over unchanged (see
cell_pallas.py's docstring for the measurements): x-sentinel empty slots
(no occupancy masks), per-block periodic-seam patches (no per-pair
minimum-image), single reciprocal, Newton's third law, BlockSpec index-map
neighbor rows (no rolled copies). 3D specifics:

- **14 pair blocks instead of 27** (Newton): same-cell (a<b), (0,0,+1),
  (0,+1,dz) x3, and (+1,dy,dz) x9 whose reactions accumulate into per-row
  reaction outputs written at row (i+1) % ncx.
- **Packed-plane lane shifts**: a (dy, dz) cell shift is a composition of a
  z-shift (roll by dz with the z-seam columns ``col % ncz == wrap`` patched
  from a second roll) and a y-shift (roll by dy*ncz with the y-seam block
  ``col // ncz == wrap`` patched) — 2 rolls + 1 select per axis, still no
  per-pair minimum-image arithmetic.
- **(a, b)-chunking with dynamic occupancy bounds**: 3D capacities are ~3x
  2D's (C ~ 32-64), so a full (C*C, P) pair block would blow VMEM. Both
  capacity axes are processed in chunks — outer loop over partner (b)
  chunks of ``cb`` rows, inner loop over self (a) chunks of ``ca`` rows,
  ((ca*cb, P) temporaries) — and BOTH loops run only ``ceil(max_occ/chunk)``
  of their iterations (slots are compacted per cell, so chunks past the
  global max occupancy are pure sentinel work). Partner triples are built
  per b-chunk by ref-slice-then-shift (see _newton_kernel3).

Physics is the reference's LJ 6-12 (molecular_dynamics_jax_single-host_
workload.py:50-62, which is dim=2-hardcoded at :26 — 3D at this scale is
beyond-reference scope) — cross-checked against the dense oracle in
tests/test_grid_md3.py.

Interface (``make_grid_force_kernel3``): ``(xg, yg, zg) -> (fx, fy, fz)``
totals, or ``(..., e, w)`` with ``with_energy=True`` (w = pair virial).
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


def _shift_plane(block: jax.Array, dy: int, dz: int, ncy: int, ncz: int,
                 delta_y: float = 0.0, delta_z: float = 0.0) -> jax.Array:
    """``out[:, y*ncz + z] = block[:, ((y+dy)%ncy)*ncz + (z+dz)%ncz]`` on the
    packed lane plane, with periodic-seam coordinate offsets: lanes that
    wrapped in y get ``±delta_y``, lanes that wrapped in z get ``±delta_z``
    (pass ``box`` for the matching coordinate array, 0 otherwise).

    Padding lanes (``col >= ncy*ncz``) end up with garbage — harmless: pairs
    are strictly per-lane and the self side of a padding lane holds the x
    sentinel, so every such pair is rejected; output padding lanes are zeroed
    by the caller's live mask.
    """
    n = block.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, block.shape, 1)
    if dz:
        main = pltpu.roll(block, (-dz) % n, axis=1)
        if dz == 1:
            wrap = pltpu.roll(block, (ncz - 1) % n, axis=1)
            block = jnp.where(col % ncz == ncz - 1, wrap + delta_z, main)
        else:
            wrap = pltpu.roll(block, (-(ncz - 1)) % n, axis=1)
            block = jnp.where(col % ncz == 0, wrap - delta_z, main)
    if dy:
        main = pltpu.roll(block, (-dy * ncz) % n, axis=1)
        if dy == 1:
            wrap = pltpu.roll(block, ((ncy - 1) * ncz) % n, axis=1)
            block = jnp.where(col // ncz == ncy - 1, wrap + delta_y, main)
        else:
            wrap = pltpu.roll(block, (-(ncy - 1) * ncz) % n, axis=1)
            block = jnp.where(col // ncz == 0, wrap - delta_y, main)
    return block


# Newton-halved neighbor offsets: (dx, dy, dz) covering each pair once.
# Same-row offsets fold their reaction back in-row; dx=+1 offsets write it
# to the next row's reaction output (shifted back into that row's frame).
_SAME_ROW = [(0, 0, 1), (0, 1, -1), (0, 1, 0), (0, 1, 1)]
_NEXT_ROW = [(1, dy, dz) for dy in (-1, 0, 1) for dz in (-1, 0, 1)]


def _newton_kernel3(
    *refs,
    cap,
    ncy,
    ncz,
    box,
    cutoff2,
    sigma2,
    epsilon,
    shift,
    n_rows,
    row_wrap,
    with_energy,
    a_chunk,
    b_chunk,
):
    """3D Newton cell kernel. Ref order:
    (mo, xs, xn, ys, yn, zs, zn) -> (fx, fy, fz, rfx, rfy, rfz[, e, re, w, rw])
    where ``mo`` is an SMEM (1,) int32 holding the global max cell
    occupancy. The pair math is a nested dynamic loop: outer over b-chunks
    (partner capacity rows), inner over a-chunks (self capacity rows), each
    running only ``ceil(mo/chunk)`` of its ``cap/chunk`` iterations. Valid
    because the binning compacts occupied slots to the low indices of every
    cell, so every occupied slot index (either side of a pair) is < mo —
    chunks past the bound are pure sentinel work. The b-axis bound is the
    round-2 "ref-slice-then-shift" lead: partner triples are built per
    b-chunk by dynamically slicing the input REFS at an 8-aligned b0
    (Mosaic lowers dynamic slices on refs only) and then applying the lane
    -plane shifts — shifts are row-independent lane ops, so
    slice-then-shift == shift-then-slice, and total shift work is unchanged
    (42 arrays x <= cap rows across all b-chunks)."""
    if with_energy:
        (mo_ref, xs_ref, xn_ref, ys_ref, yn_ref, zs_ref, zn_ref,
         fx_ref, fy_ref, fz_ref, rfx_ref, rfy_ref, rfz_ref,
         e_ref, re_ref, w_ref, rw_ref) = refs
    else:
        (mo_ref, xs_ref, xn_ref, ys_ref, yn_ref, zs_ref, zn_ref,
         fx_ref, fy_ref, fz_ref, rfx_ref, rfy_ref, rfz_ref) = refs
        e_ref = re_ref = w_ref = rw_ref = None

    lanes = xs_ref.shape[2]
    if row_wrap:
        pid = pl.program_id(0)
        x_wrap = jnp.where(pid == n_rows - 1, box, 0.0).astype(jnp.float32)
    else:
        x_wrap = None

    fscale = 24.0 * epsilon / sigma2
    ca, cb = a_chunk, b_chunk
    na_dyn = jnp.clip((mo_ref[0] + ca - 1) // ca, 1, cap // ca)
    nb_dyn = jnp.clip((mo_ref[0] + cb - 1) // cb, 1, cap // cb)

    kk = (ca * cb, lanes)
    sh3 = (ca, cb, lanes)
    sub_a_loc = jax.lax.broadcasted_iota(jnp.int32, kk, 0) // cb
    sub_b_loc = jax.lax.broadcasted_iota(jnp.int32, kk, 0) % cb

    def partner(src_x, src_y, src_z, dy, dz):
        return (
            _shift_plane(src_x, dy, dz, ncy, ncz),
            _shift_plane(src_y, dy, dz, ncy, ncz, delta_y=box),
            _shift_plane(src_z, dy, dz, ncy, ncz, delta_z=box),
        )

    def unshift(v, dy, dz):
        """Reaction sums back into the partner row's own lane frame (force
        components carry no coordinate deltas)."""
        return _shift_plane(v, -dy, -dz, ncy, ncz)

    def rep_b(v):  # partner coords: row k = a*cb + b holds v[b]
        return jnp.broadcast_to(v[None, :, :], sh3).reshape(kk)

    def rep_a(v):  # chunk self coords: row k = a*cb + b holds v[a]
        return jnp.broadcast_to(v[:, None, :], sh3).reshape(kk)

    # Output refs double as accumulators (Mosaic lowers dynamic indexing on
    # REFS, not values — pl.ds below; and ref accumulation keeps one chunk
    # pair's temporaries live at a time instead of one per unrolled segment).
    zero_cp = jnp.zeros((cap, lanes), jnp.float32)
    for ref in (fx_ref, fy_ref, fz_ref, rfx_ref, rfy_ref, rfz_ref):
        ref[0] = zero_cp
    if with_energy:
        e_ref[0] = zero_cp
        re_ref[0] = zero_cp
        w_ref[0] = zero_cp
        rw_ref[0] = zero_cp

    def b_body(bj, _):
        b0 = pl.multiple_of(bj * cb, cb)
        xs_b = xs_ref[0, pl.ds(b0, cb)]  # (cb, P)
        ys_b = ys_ref[0, pl.ds(b0, cb)]
        zs_b = zs_ref[0, pl.ds(b0, cb)]
        xn_b = xn_ref[0, pl.ds(b0, cb)]
        yn_b = yn_ref[0, pl.ds(b0, cb)]
        zn_b = zn_ref[0, pl.ds(b0, cb)]
        if x_wrap is not None:
            xn_b = xn_b + x_wrap
        # 14 shifted partner coordinate triples for THIS b-chunk (42 (cb, P)
        # arrays, a few hundred kB — the loop structure keeps scoped VMEM to
        # one b-chunk's partners + one (a,b) chunk pair's temporaries; a
        # fully unrolled body was measured at 143.8 MB at the N=100k scale).
        blocks = [("self", xs_b, ys_b, zs_b, 0, 0)]
        for _, dy, dz in _SAME_ROW:
            px, py, pz = partner(xs_b, ys_b, zs_b, dy, dz)
            blocks.append(("same", px, py, pz, dy, dz))
        for _, dy, dz in _NEXT_ROW:
            px, py, pz = partner(xn_b, yn_b, zn_b, dy, dz)
            blocks.append(("next", px, py, pz, dy, dz))

        # b-side (reaction) sums ride the a-loop CARRY as register values and
        # hit the refs ONCE per b-chunk below — per-(a,b,block) dynamically
        # -sliced ref read-modify-writes were measured at 2.21 ms/step vs
        # 1.46 for the round-2 kernel (672 small sliced RMWs/call); this form
        # keeps ~(nb*8 + na*nb*4) sliced ops.
        zb = jnp.zeros((cb, lanes), jnp.float32)
        acc0 = (zb,) * 10 if with_energy else (zb,) * 6

        def a_body(ci, acc):
            a0 = pl.multiple_of(ci * ca, ca)
            x_i = rep_a(xs_ref[0, pl.ds(a0, ca)])
            y_i = rep_a(ys_ref[0, pl.ds(a0, ca)])
            z_i = rep_a(zs_ref[0, pl.ds(a0, ca)])
            if with_energy:
                sx, sy, sz, nx, ny, nz, se, ne, sw, nw = acc
            else:
                sx, sy, sz, nx, ny, nz = acc
                se = ne = sw = nw = None
            fa_x = fa_y = fa_z = jnp.zeros((ca, lanes), jnp.float32)
            ea = jnp.zeros((ca, lanes), jnp.float32) if with_energy else None
            wa = jnp.zeros((ca, lanes), jnp.float32) if with_energy else None

            for kind, px, py, pz, dy, dz in blocks:
                dx = x_i - rep_b(px)
                dyy = y_i - rep_b(py)
                dzz = z_i - rep_b(pz)
                r2 = dx * dx + dyy * dyy + dzz * dzz
                valid = (r2 < cutoff2) & (r2 > 0.0)
                if kind == "self":
                    # a < b, in global slot indices
                    valid = valid & (sub_a_loc + a0 < sub_b_loc + b0)
                # approx-reciprocal + one Newton step instead of the
                # divide+guard-select (~1 fma-slot/pair saved, ~1e-7 rel
                # err — see cell_pallas.py / results/vpu_oprate_probe.py)
                inv = pl.reciprocal(r2, approx=True)
                inv = inv * (2.0 - r2 * inv)
                if sigma2 != 1.0:
                    inv = sigma2 * inv
                s6 = inv * inv * inv
                if with_energy:
                    s12 = s6 * s6
                    fmag = jnp.where(valid, (2.0 * s12 - s6) * inv, 0.0) * fscale
                else:
                    # Horner factoring (as in _static_kernel3): one VPU mul
                    # fewer per pair; the energy path needs s12 anyway
                    t = s6 * inv
                    fmag = jnp.where(valid, t * (2.0 * fscale * s6 - fscale), 0.0)
                fxb = (fmag * dx).reshape(sh3)
                fyb = (fmag * dyy).reshape(sh3)
                fzb = (fmag * dzz).reshape(sh3)
                fa_x = fa_x + jnp.sum(fxb, axis=1)
                fa_y = fa_y + jnp.sum(fyb, axis=1)
                fa_z = fa_z + jnp.sum(fzb, axis=1)
                bx = jnp.sum(fxb, axis=0)
                by = jnp.sum(fyb, axis=0)
                bz = jnp.sum(fzb, axis=0)
                if kind == "self":
                    sx, sy, sz = sx + bx, sy + by, sz + bz
                elif kind == "same":
                    sx = sx + unshift(bx, dy, dz)
                    sy = sy + unshift(by, dy, dz)
                    sz = sz + unshift(bz, dy, dz)
                else:
                    nx = nx + unshift(bx, dy, dz)
                    ny = ny + unshift(by, dy, dz)
                    nz = nz + unshift(bz, dy, dz)
                if with_energy:
                    ebk = jnp.where(
                        valid, 4.0 * epsilon * (s12 - s6) - shift, 0.0
                    ).reshape(sh3)
                    ea = ea + jnp.sum(ebk, axis=1)
                    ebs = jnp.sum(ebk, axis=0)
                    # pair virial r.f = 24*eps*(2*s12 - s6) (pressure)
                    wbk = jnp.where(valid, (2.0 * s12 - s6), 0.0).reshape(
                        sh3
                    ) * (fscale * sigma2)
                    wa = wa + jnp.sum(wbk, axis=1)
                    wbs = jnp.sum(wbk, axis=0)
                    if kind == "self":
                        se = se + ebs
                        sw = sw + wbs
                    elif kind == "same":
                        se = se + unshift(ebs, dy, dz)
                        sw = sw + unshift(wbs, dy, dz)
                    else:
                        ne = ne + unshift(ebs, dy, dz)
                        nw = nw + unshift(wbs, dy, dz)

            # this chunk's a-side rows are disjoint: accumulate at [a0, a0+ca)
            fx_ref[0, pl.ds(a0, ca)] = fx_ref[0, pl.ds(a0, ca)] + fa_x
            fy_ref[0, pl.ds(a0, ca)] = fy_ref[0, pl.ds(a0, ca)] + fa_y
            fz_ref[0, pl.ds(a0, ca)] = fz_ref[0, pl.ds(a0, ca)] + fa_z
            if with_energy:
                e_ref[0, pl.ds(a0, ca)] = e_ref[0, pl.ds(a0, ca)] + ea
                w_ref[0, pl.ds(a0, ca)] = w_ref[0, pl.ds(a0, ca)] + wa
                return (sx, sy, sz, nx, ny, nz, se, ne, sw, nw)
            return (sx, sy, sz, nx, ny, nz)

        acc = jax.lax.fori_loop(0, na_dyn, a_body, acc0)

        # fold this b-chunk's reaction sums into the outputs (Newton: minus)
        bsl = (0, pl.ds(b0, cb))
        fx_ref[bsl] = fx_ref[bsl] - acc[0]
        fy_ref[bsl] = fy_ref[bsl] - acc[1]
        fz_ref[bsl] = fz_ref[bsl] - acc[2]
        rfx_ref[bsl] = rfx_ref[bsl] - acc[3]
        rfy_ref[bsl] = rfy_ref[bsl] - acc[4]
        rfz_ref[bsl] = rfz_ref[bsl] - acc[5]
        if with_energy:
            e_ref[bsl] = e_ref[bsl] + acc[6]
            re_ref[bsl] = re_ref[bsl] + acc[7]
            w_ref[bsl] = w_ref[bsl] + acc[8]
            rw_ref[bsl] = rw_ref[bsl] + acc[9]
        return 0

    jax.lax.fori_loop(0, nb_dyn, b_body, 0)

    # zero padding lanes (reaction unshifts duplicate seam values into them)
    live = jax.lax.broadcasted_iota(jnp.int32, (cap, lanes), 1) < ncy * ncz
    for ref in (fx_ref, fy_ref, fz_ref, rfx_ref, rfy_ref, rfz_ref):
        ref[0] = jnp.where(live, ref[0], zero_cp)
    if with_energy:
        e_ref[0] = jnp.where(live, e_ref[0], zero_cp)
        re_ref[0] = jnp.where(live, re_ref[0], zero_cp)
        w_ref[0] = jnp.where(live, w_ref[0], zero_cp)
        rw_ref[0] = jnp.where(live, rw_ref[0], zero_cp)


def _static_kernel3(
    *refs,
    cap,
    cov,
    ncy,
    ncz,
    box,
    cutoff2,
    sigma2,
    epsilon,
    shift,
    n_rows,
    row_wrap,
    with_energy,
    a_chunk,
    b_chunk,
):
    """Straight-line twin of _newton_kernel3 with a STATIC occupancy bound.

    ``cov`` (a compile-time multiple of 8, <= cap) replaces the SMEM
    ``max_occ`` operand: only slot rows < cov are covered, rows >= cov get
    zero force (they must be sentinels — the engine raises ``overflow``
    whenever a rebuild's max occupancy exceeds cov, so under-coverage is
    never silent; see GridMD3(static_cov=...)). In exchange the kernel is
    pure straight-line code — the chunk loops unroll at trace time, the 14
    partner triples are built ONCE on (cov, lanes) value planes (static
    value slices lower fine; only dynamic ones don't), accumulators are
    values, and every ref is written exactly once. This removes the
    dynamic-loop machinery (SMEM bound reads, fori carries of 6-10
    (cb, lanes) arrays, per-chunk ref RMWs, per-b-chunk partner rebuilds)
    that made the dynamic kernel ~25% slower per pair test than the 2D
    kernel's straight-line structure (results/static_cov_probe.py).

    Also carries the Horner fmag factoring: with t = s6/r2,
    fmag = 24*eps*(2*s12 - s6)/r2 = t * fma(2*fscale, s6, -fscale) — one
    VPU mul fewer per pair than the dynamic kernel's form.
    """
    if with_energy:
        (xs_ref, xn_ref, ys_ref, yn_ref, zs_ref, zn_ref,
         fx_ref, fy_ref, fz_ref, rfx_ref, rfy_ref, rfz_ref,
         e_ref, re_ref, w_ref, rw_ref) = refs
    else:
        (xs_ref, xn_ref, ys_ref, yn_ref, zs_ref, zn_ref,
         fx_ref, fy_ref, fz_ref, rfx_ref, rfy_ref, rfz_ref) = refs
        e_ref = re_ref = w_ref = rw_ref = None

    lanes = xs_ref.shape[2]
    xs = xs_ref[0, :cov]
    ys = ys_ref[0, :cov]
    zs = zs_ref[0, :cov]
    xn = xn_ref[0, :cov]
    yn = yn_ref[0, :cov]
    zn = zn_ref[0, :cov]
    if row_wrap:
        pid = pl.program_id(0)
        xn = xn + jnp.where(pid == n_rows - 1, box, 0.0).astype(jnp.float32)

    fscale = 24.0 * epsilon / sigma2
    ca, cb = a_chunk, b_chunk
    na, nb = cov // ca, cov // cb
    kk = (ca * cb, lanes)
    sh3 = (ca, cb, lanes)
    sub_a_loc = jax.lax.broadcasted_iota(jnp.int32, kk, 0) // cb
    sub_b_loc = jax.lax.broadcasted_iota(jnp.int32, kk, 0) % cb

    def partner(src_x, src_y, src_z, dy, dz):
        return (
            _shift_plane(src_x, dy, dz, ncy, ncz),
            _shift_plane(src_y, dy, dz, ncy, ncz, delta_y=box),
            _shift_plane(src_z, dy, dz, ncy, ncz, delta_z=box),
        )

    def unshift(v, dy, dz):
        return _shift_plane(v, -dy, -dz, ncy, ncz)

    def rep_b(v):
        return jnp.broadcast_to(v[None, :, :], sh3).reshape(kk)

    def rep_a(v):
        return jnp.broadcast_to(v[:, None, :], sh3).reshape(kk)

    # all 14 partner coordinate triples, hoisted (42 (cov, lanes) planes —
    # ~1.5 MB at the cps19/N=100k scale)
    blocks = [("self", xs, ys, zs, 0, 0)]
    for _, dy, dz in _SAME_ROW:
        px, py, pz = partner(xs, ys, zs, dy, dz)
        blocks.append(("same", px, py, pz, dy, dz))
    for _, dy, dz in _NEXT_ROW:
        px, py, pz = partner(xn, yn, zn, dy, dz)
        blocks.append(("next", px, py, pz, dy, dz))

    za = jnp.zeros((ca, lanes), jnp.float32)
    zb = jnp.zeros((cb, lanes), jnp.float32)
    zcov = jnp.zeros((cov, lanes), jnp.float32)
    # per-a-chunk self-force accumulators (values, concatenated at the end)
    fa_x = [za] * na
    fa_y = [za] * na
    fa_z = [za] * na
    ea_l = [za] * na if with_energy else None
    wa_l = [za] * na if with_energy else None
    # global b-side sums: same-row blocks fold into the self force (Newton
    # minus), next-row blocks into the reaction output
    gsx = gsy = gsz = zcov
    gnx = gny = gnz = zcov
    if with_energy:
        gse = gsw = gne = gnw = zcov

    x_i = [rep_a(xs[ci * ca:(ci + 1) * ca]) for ci in range(na)]
    y_i = [rep_a(ys[ci * ca:(ci + 1) * ca]) for ci in range(na)]
    z_i = [rep_a(zs[ci * ca:(ci + 1) * ca]) for ci in range(na)]

    for kind, px, py, pz, dy, dz in blocks:
        # this block's b-side sums, per b-chunk; unshifted ONCE per block
        lbx = [zb] * nb
        lby = [zb] * nb
        lbz = [zb] * nb
        lbe = [zb] * nb if with_energy else None
        lbw = [zb] * nb if with_energy else None
        for bj in range(nb):
            b0 = bj * cb
            pxb = rep_b(px[b0:b0 + cb])
            pyb = rep_b(py[b0:b0 + cb])
            pzb = rep_b(pz[b0:b0 + cb])
            for ci in range(na):
                a0 = ci * ca
                if kind == "self" and a0 >= b0 + cb - 1:
                    # a < b holds nowhere in this chunk pair: skip it
                    continue
                dx = x_i[ci] - pxb
                dyy = y_i[ci] - pyb
                dzz = z_i[ci] - pzb
                r2 = dx * dx + dyy * dyy + dzz * dzz
                valid = (r2 < cutoff2) & (r2 > 0.0)
                if kind == "self":
                    valid = valid & (sub_a_loc + a0 < sub_b_loc + b0)
                inv = pl.reciprocal(r2, approx=True)
                inv = inv * (2.0 - r2 * inv)
                if sigma2 != 1.0:
                    inv = sigma2 * inv
                s6 = inv * inv * inv
                t = s6 * inv
                fmag = jnp.where(
                    valid, t * (2.0 * fscale * s6 - fscale), 0.0
                )
                fxb = (fmag * dx).reshape(sh3)
                fyb = (fmag * dyy).reshape(sh3)
                fzb = (fmag * dzz).reshape(sh3)
                fa_x[ci] = fa_x[ci] + jnp.sum(fxb, axis=1)
                fa_y[ci] = fa_y[ci] + jnp.sum(fyb, axis=1)
                fa_z[ci] = fa_z[ci] + jnp.sum(fzb, axis=1)
                lbx[bj] = lbx[bj] + jnp.sum(fxb, axis=0)
                lby[bj] = lby[bj] + jnp.sum(fyb, axis=0)
                lbz[bj] = lbz[bj] + jnp.sum(fzb, axis=0)
                if with_energy:
                    s12 = s6 * s6
                    ebk = jnp.where(
                        valid, 4.0 * epsilon * (s12 - s6) - shift, 0.0
                    ).reshape(sh3)
                    ea_l[ci] = ea_l[ci] + jnp.sum(ebk, axis=1)
                    wbk = jnp.where(valid, (2.0 * s12 - s6), 0.0).reshape(
                        sh3
                    ) * (fscale * sigma2)
                    wa_l[ci] = wa_l[ci] + jnp.sum(wbk, axis=1)
                    lbe[bj] = lbe[bj] + jnp.sum(ebk, axis=0)
                    lbw[bj] = lbw[bj] + jnp.sum(wbk, axis=0)
        bxp = unshift(jnp.concatenate(lbx, axis=0), dy, dz)
        byp = unshift(jnp.concatenate(lby, axis=0), dy, dz)
        bzp = unshift(jnp.concatenate(lbz, axis=0), dy, dz)
        if kind != "next":
            gsx, gsy, gsz = gsx + bxp, gsy + byp, gsz + bzp
        else:
            gnx, gny, gnz = gnx + bxp, gny + byp, gnz + bzp
        if with_energy:
            bep = unshift(jnp.concatenate(lbe, axis=0), dy, dz)
            bwp = unshift(jnp.concatenate(lbw, axis=0), dy, dz)
            if kind != "next":
                gse, gsw = gse + bep, gsw + bwp
            else:
                gne, gnw = gne + bep, gnw + bwp

    # assemble (cov, lanes) planes, zero padding lanes, pad rows >= cov
    live = jax.lax.broadcasted_iota(jnp.int32, (cov, lanes), 1) < ncy * ncz
    pad = (
        None if cov == cap else jnp.zeros((cap - cov, lanes), jnp.float32)
    )

    def store(ref, v):
        v = jnp.where(live, v, 0.0)
        ref[0] = v if pad is None else jnp.concatenate([v, pad], axis=0)

    store(fx_ref, jnp.concatenate(fa_x, axis=0) - gsx)
    store(fy_ref, jnp.concatenate(fa_y, axis=0) - gsy)
    store(fz_ref, jnp.concatenate(fa_z, axis=0) - gsz)
    store(rfx_ref, -gnx)
    store(rfy_ref, -gny)
    store(rfz_ref, -gnz)
    if with_energy:
        store(e_ref, jnp.concatenate(ea_l, axis=0) + gse)
        store(re_ref, gne)
        store(w_ref, jnp.concatenate(wa_l, axis=0) + gsw)
        store(rw_ref, gnw)


def make_grid_force_kernel3(
    grid_fn: CellGridFn,
    sigma: float = 1.0,
    epsilon: float = 1.0,
    interpret: Optional[bool] = None,
    with_energy: bool = False,
    a_chunk: Optional[int] = None,
    b_chunk: Optional[int] = None,
    n_rows: Optional[int] = None,
    static_cov: Optional[int] = None,
):
    """3D grid-level entry point: ``(xg, yg, zg) -> (fx, fy, fz)`` (or
    ``(..., e, w)``) on the packed (ncx, C, P) layout with x-sentinels at empty
    slots. Forces are reaction-folded totals. See the module docstring;
    2D counterpart: cell_pallas.make_grid_force_kernel.

    ``static_cov``: compile-time occupancy bound (multiple of 8, <= cap) —
    emits the straight-line _static_kernel3 instead of the dynamic-bound
    kernel. The returned callables keep the same signature (``max_occ`` is
    accepted and ignored); the CALLER must guarantee max occupancy <= cov
    (GridMD3(static_cov=...) raises its overflow flag otherwise).

    ``a_chunk``: self-capacity rows per VMEM chunk (must divide C; default
    targets ~1 MB pair-block temporaries). ``b_chunk``: partner-capacity
    rows per chunk (must divide C, 8-aligned; default 8 — the finest
    dynamic-occupancy granularity, see _newton_kernel3).

    ``n_rows``: x-row count the call operates on (default: the full grid).
    The sharded 3D engine passes its per-device row count and uses the
    attached ``.raw(xs, xn, ys, yn, zs, zn)``, supplying halo-built
    neighbor-row arrays itself (+box x-adjustment on the seam device);
    ``.raw`` returns ``(fx, fy, fz, rfx, rfy, rfz[, e, re, w, rw])`` with reaction
    rows UNSHIFTED (row i holds the reaction destined for row i+1) — the
    same contract as cell_pallas.make_grid_force_kernel's ``.raw``.
    """
    assert grid_fn.dim == 3, "use cell_pallas.make_grid_force_kernel for 2D"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    cps, cap, box, cutoff = (
        grid_fn.cells_per_side,
        grid_fn.capacity,
        grid_fn.box,
        grid_fn.cutoff,
    )
    lanes = _round_up(cps * cps, 128)
    if static_cov is not None:
        assert static_cov <= cap and (
            static_cov % 8 == 0 or static_cov == cap
        ), f"static_cov {static_cov} must be an 8-multiple <= capacity {cap}"
    chunk_span = cap if static_cov is None else static_cov
    if a_chunk is None:
        # measured-fastest (results/md3_chunk_sweep.py): the finest 8-row
        # self chunks — (8,16) beat (16,16) at cap 48 and every coarser
        # shape; the dynamic occupancy bound then rounds covered self rows
        # to the tightest multiple of 8 >= max_occ. Must be a multiple of 8:
        # Mosaic requires dynamic sublane starts provably 8-aligned (the
        # kernel slices the capacity axis at a_chunk strides).
        a_chunk = 8 if chunk_span % 8 == 0 else chunk_span
    assert chunk_span % a_chunk == 0, (
        f"a_chunk {a_chunk} must divide the chunk span {chunk_span}"
    )
    assert a_chunk % 8 == 0 or a_chunk == chunk_span, (
        f"a_chunk {a_chunk} must be 8-aligned (sublane slicing)"
    )
    if b_chunk is None:
        # measured (results/md3_chunk_sweep.py, N=100k, mo 27): b=16 beats
        # b=8 (partner-triple builds + per-chunk ref RMWs halve) and beats
        # b=cap (dynamic occupancy bound covers 32 not 40+ partner rows);
        # when 16 doesn't divide the capacity, b=cap beat b=8 — fall back
        # to the full-span partner axis, not to finer chunks. At cap <= 32
        # (the dense cps19-class geometries) b=8 wins instead: the
        # occupancy bound covers 24 partner rows where b=16 must cover the
        # full 32 (results/geom3_probe.py: 0.691 vs 0.758 ms/step windows
        # at N=100k cps19).
        if chunk_span <= 32:
            b_chunk = 8 if chunk_span % 8 == 0 else chunk_span
        else:
            b_chunk = 16 if chunk_span % 16 == 0 else chunk_span
    assert chunk_span % b_chunk == 0, (
        f"b_chunk {b_chunk} must divide the chunk span {chunk_span}"
    )
    assert b_chunk % 8 == 0 or b_chunk == chunk_span, (
        f"b_chunk {b_chunk} must be 8-aligned (sublane slicing)"
    )

    sc6 = (sigma / cutoff) ** 6
    shift = 4.0 * epsilon * (sc6 * sc6 - sc6)
    rows = cps if n_rows is None else n_rows
    params = dict(
        cap=cap,
        ncy=cps,
        ncz=cps,
        box=float(box),
        cutoff2=float(cutoff) ** 2,
        sigma2=float(sigma) ** 2,
        epsilon=float(epsilon),
        shift=float(shift),
        n_rows=rows,
        with_energy=with_energy,
        a_chunk=a_chunk,
        b_chunk=b_chunk,
    )
    n_out = 10 if with_energy else 6

    def block(index_map):
        return pl.BlockSpec((1, cap, lanes), index_map, memory_space=pltpu.VMEM)

    self_blk = block(lambda i: (i, 0, 0))
    next_blk = block(lambda i: ((i + 1) % rows, 0, 0))
    out_struct = jax.ShapeDtypeStruct((rows, cap, lanes), jnp.float32)
    cost = pl.CostEstimate(
        flops=rows * 14 * chunk_span * chunk_span * lanes * 25,
        bytes_accessed=(6 + n_out) * rows * cap * lanes * 4,
        transcendentals=0,
    )

    mo_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    def build(row_wrap, shifted):
        """``shifted``: single-chip mode — neighbor rows via the (i+1)%rows
        index map, reaction rows written at their destination row. Raw
        (sharded) mode takes explicit neighbor arrays, returns unshifted
        reactions."""
        if static_cov is None:
            kernel = functools.partial(
                _newton_kernel3, row_wrap=row_wrap, **params
            )
            lead_specs = [mo_spec]
        else:
            kernel = functools.partial(
                _static_kernel3, row_wrap=row_wrap, cov=static_cov, **params
            )
            lead_specs = []
        n_blk = next_blk if shifted else self_blk
        out_specs = [self_blk] * 3 + [n_blk] * 3
        if with_energy:
            out_specs += [self_blk, n_blk, self_blk, n_blk]
        # the chunk loop holds ~(42 partner arrays + one chunk's pair
        # temps): ~16 MB at the N=100k scale — above Mosaic's 16 MB
        # default scoped limit, far under the chip's 128 MB VMEM. The
        # STRAIGHT-LINE kernel's scoped stack additionally scales with the
        # lane width (measured 84.57M at lanes=1792/cov=24, nearly chunk-
        # independent — the unrolled pair temporaries' live ranges); wide-
        # lane static builds request 88M — enough for the measured need,
        # small enough that the program's window allocations still fit the
        # 128M chip VMEM (a 100M request over-reserved and the whole
        # program OOMed). GridMD3 auto-disables static mode past
        # lanes=1792 where the scaling outgrows even this.
        vmem_limit = 64 * 1024 * 1024
        if static_cov is not None and lanes > 1024:
            vmem_limit = 88 * 1024 * 1024
        return pl.pallas_call(
            kernel,
            grid=(rows,),
            in_specs=lead_specs + [self_blk, n_blk] * 3,
            out_specs=out_specs,
            out_shape=[out_struct] * n_out,
            interpret=interpret,
            cost_estimate=cost,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        )

    fused_call = build(row_wrap=True, shifted=True)

    def _mo_arr(max_occ):
        """(1,) int32 SMEM operand; None -> full capacity (no clamping)."""
        if max_occ is None:
            return jnp.full((1,), cap, jnp.int32)
        return jnp.asarray(max_occ, jnp.int32).reshape((1,))

    def grid_force(xg, yg, zg, max_occ=None):
        lead = () if static_cov is not None else (_mo_arr(max_occ),)
        out = fused_call(*lead, xg, xg, yg, yg, zg, zg)
        fx = out[0] + out[3]
        fy = out[1] + out[4]
        fz = out[2] + out[5]
        if with_energy:
            return fx, fy, fz, out[6] + out[7], out[8] + out[9]
        return fx, fy, fz

    raw_call = build(row_wrap=False, shifted=False)

    def raw(xs, xn, ys, yn, zs, zn, max_occ=None):
        lead = () if static_cov is not None else (_mo_arr(max_occ),)
        return tuple(raw_call(*lead, xs, xn, ys, yn, zs, zn))

    grid_force.raw = raw
    return grid_force
