"""Pallas migration-permute kernel (3D packed layout) — descriptor-free
slot permutation for the 3D grid rebuild, with COMPACTED mover planes.

3D counterpart of migrate_pallas.py (see its module docstring for the
descriptor-wall arithmetic that motivates the design: every gather/scatter
formulation is descriptor-bound at <= ~84M rows/s on v5e, so the
inverse-permute rebuild costs ~11 ms at 3D N=100k's 313k slots — measured
results/md3_breakdown_probe.py). The kernel realizes the permutation as
dense VPU compare/selects against SOURCE-frame int32 codes

    scode[source cell s, slot b] = dcode * cap + a   (-1 = empty/invalid)

where ``dcode = ((dx+1)*3 + (dy+1))*3 + (dz+1)`` is the slot's migration
direction (27 neighbors in 3D) and ``a`` its ALLOCATED slot in the target
cell s + d. Candidate (direction j, source slot b) fills target slot a'
exactly when ``probe_j[b, :] == a'`` (a broadcast compare against a
sublane iota); classes occupy disjoint code ranges so probes can never
cross-match. Post-rebuild occupancy is computed by the caller from the
allocation's per-cell counts (slots fill compactly from 0).

Round-4 redesign — the flat form scanned ALL ``max_occ`` candidate rows of
the full (cap, lanes) planes for EVERY one of the 27 directions, paying
27 x ~32 x (1+F) full-tile selects per x-row while the 26 mover
directions yield ~0.1 matches per lane (results/RESULTS.md "Round 4"
occupancy census; the measured N=100k rebuild was 4.0 ms of kernel,
results/rebuild3_phase_probe.py). Three structural cuts:

- **Shared mover compaction**: the wrapper packs every mover (dcode != 13)
  of each source cell into K (default 16) shared sublane slots — code and
  all F fields — with a LOUD overflow flag if a cell ever exceeds K
  (silent dropping is banned). The 26 mover directions then scan the
  shifted COMPACT planes: ``ceil(max_row_movers/8)`` 8-row chunks
  (typically ONE) instead of ``ceil(max_occ/8)`` (typically four).
  Only the stay direction (dcode 13, no plane shift needed) still scans
  the full-capacity plane, bounded per x-row by that row's occupancy.
- **Target-axis chunking**: accumulation runs in 8-row target-slot chunks
  bounded by ``ceil(new_max_occ/8)`` (the post-rebuild occupancy the
  caller already computes) instead of materializing all ``cap`` target
  rows — allocated slots are compact from 0, so rows past the bound can
  never match and are pre-filled.
- **Per-row dynamic bounds in SMEM**: stay chunks ``ceil(row_occ/8)`` and
  mover chunks ``ceil(row_movers/8)`` are per-x-row scalars (the source
  row differs per direction's dx), so sparse rows do proportionally less.

Net candidate-row work per x-row drops from ``27 * r8(mo)`` full-height
columns to ``r8(row_occ) + 26 * r8(row_movers)`` at ``r8(nmo)`` height —
measured on v5e (results/migrate_compact_probe.py): N=100k cps17 rebuild
4.21 -> 1.36 ms, cps19 2.95 -> 1.11 ms.

Mover compaction also shrinks the sharded halo: the x-row exchange sends
(K, lanes) compact planes instead of (cap, lanes) full planes (the stay
direction never crosses x-rows, so full planes need no halo at all).

The flat kernel is kept behind ``compact=False`` as the in-module parity
oracle (tests/test_pallas_kernels.py cross-checks the two).

No reference analog: the reference rebuilds nothing (dense O(N^2) pair
matrix, molecular_dynamics_jax_single-host_workload.py:50-62, dim=2 only).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jax_tpus_benchmark_physics_simulation_tpu.ops.kernels.cell_pallas import _round_up
from jax_tpus_benchmark_physics_simulation_tpu.ops.kernels.cell_pallas3 import (
    _shift_plane,
)

_STAY = 13  # dcode of (dx, dy, dz) == (0, 0, 0)

# mover directions, each with the x-source ref index (target x-cell i reads
# source cell i - dx: dx=+1 -> prev ref block)
_MOVER_DIRS = [
    (dx, dy, dz)
    for dx in (-1, 0, 1)
    for dy in (-1, 0, 1)
    for dz in (-1, 0, 1)
    if (dx, dy, dz) != (0, 0, 0)
]
_SRC_I = {1: 0, 0: 1, -1: 2}


def _dcode(dx: int, dy: int, dz: int) -> int:
    return ((dx + 1) * 3 + (dy + 1)) * 3 + (dz + 1)


def _migrate_kernel3(*refs, cap, ncy, ncz, lanes, n_fields, fills):
    """Flat (legacy / parity-oracle) kernel. Ref order: (mo, c_prev, c_self,
    c_next, f0_prev, f0_self, f0_next, f1_prev, ...) -> (out0, ...,
    out{F-1}), scratch: planes (F, cap, lanes) f32 + probe (cap, lanes)
    int32."""
    mo_ref = refs[0]
    c_refs = refs[1:4]
    f_refs = refs[4 : 4 + 3 * n_fields]
    out_refs = refs[4 + 3 * n_fields : 4 + 4 * n_fields]
    planes_ref = refs[4 + 4 * n_fields]
    probe_ref = refs[4 + 4 * n_fields + 1]

    shape = (cap, lanes)
    accs = tuple(jnp.full(shape, f, jnp.float32) for f in fills)
    # target slot index a' along the sublane axis
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    # source slots are compact, so candidates past max_occ never match;
    # visit ceil(mo/8) 8-aligned chunks (sublane-sliceable granularity)
    nb_dyn = jnp.minimum((mo_ref[0] + 7) // 8, cap // 8)

    for dx in (-1, 0, 1):
        src_i = _SRC_I[dx]
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                for f in range(n_fields):
                    planes_ref[f] = _shift_plane(
                        f_refs[3 * f + src_i][0], -dy, -dz, ncy, ncz
                    )
                dbase = _dcode(dx, dy, dz) * cap
                # delta=0 (int): the float default would promote the codes
                probe_ref[...] = (
                    _shift_plane(
                        c_refs[src_i][0], -dy, -dz, ncy, ncz,
                        delta_y=0, delta_z=0,
                    )
                    - dbase
                )

                def b_body(j, acc):
                    b0 = pl.multiple_of(j * 8, 8)
                    pchunk = probe_ref[pl.ds(b0, 8), :]
                    chunks = [
                        planes_ref[f, pl.ds(b0, 8), :] for f in range(n_fields)
                    ]
                    acc = list(acc)
                    for bi in range(8):
                        # (1, P) row compare broadcasts across sublanes a'
                        mask = pchunk[bi : bi + 1, :] == sub_iota
                        for f in range(n_fields):
                            acc[f] = jnp.where(
                                mask, chunks[f][bi : bi + 1, :], acc[f]
                            )
                    return tuple(acc)

                accs = jax.lax.fori_loop(0, nb_dyn, b_body, accs)

    # padding lanes can match garbage codes brought in by the shifts;
    # live target slots that matched nothing already hold fills[f]
    live = jax.lax.broadcasted_iota(jnp.int32, shape, 1) < ncy * ncz
    for f in range(n_fields):
        base = jnp.full(shape, fills[f], jnp.float32)
        out_refs[f][0] = jnp.where(live, accs[f], base)


def _migrate_kernel3_compact(
    *refs, cap, k_mov, ncy, ncz, lanes, n_fields, fills
):
    """Compacted-mover kernel. Ref order:
    (nt, ns_rows, nbm3, scode_self, f0_self..f{F-1}_self,
     cc_prev, cc_self, cc_next, cf0_prev, cf0_self, cf0_next, cf1_prev, ...)
    -> (out0..out{F-1}),
    scratch: pc (26*K, lanes) int32 + cfs (26*F*K, lanes) f32.

    ``nt``: SMEM (1,) — target 8-row chunks (ceil(new_max_occ/8)).
    ``ns_rows``: SMEM (rows,) — stay candidate chunks per x-row.
    ``nbm3``: SMEM (3, rows) — mover candidate chunks, indexed by the
    direction's x-source ref index (0=prev row, 1=self, 2=next)."""
    i = pl.program_id(0)
    nt_ref = refs[0]
    ns_ref = refs[1]
    nbm_ref = refs[2]
    scode_ref = refs[3]
    fs_refs = refs[4 : 4 + n_fields]
    cc_refs = refs[4 + n_fields : 7 + n_fields]
    cf_refs = refs[7 + n_fields : 7 + 4 * n_fields]
    out_refs = refs[7 + 4 * n_fields : 7 + 5 * n_fields]
    pc_ref = refs[7 + 5 * n_fields]
    cfs_ref = refs[7 + 5 * n_fields + 1]

    live8 = jax.lax.broadcasted_iota(jnp.int32, (8, lanes), 1) < ncy * ncz
    fill8 = [jnp.full((8, lanes), f, jnp.float32) for f in fills]

    # phase 0: prefill — target rows past the nt bound (and padding lanes)
    # must hold the fill values
    for f in range(n_fields):
        out_refs[f][0] = jnp.full((cap, lanes), fills[f], jnp.float32)

    # phase 1: hoisted mover plane shifts into scratch, 8-row chunks gated
    # by the source row's mover bound (stale chunks are never read: the
    # candidate loops below use the same bound)
    for j, (dx, dy, dz) in enumerate(_MOVER_DIRS):
        src_i = _SRC_I[dx]
        dbase = _dcode(dx, dy, dz) * cap
        nbm = nbm_ref[src_i, i]
        for kk in range(k_mov // 8):
            @pl.when(nbm > kk)
            def _shift_chunk(j=j, src_i=src_i, dbase=dbase, kk=kk, dy=dy, dz=dz):
                b0 = kk * 8
                pc_ref[pl.ds(j * k_mov + b0, 8), :] = (
                    _shift_plane(
                        cc_refs[src_i][0, pl.ds(b0, 8), :], -dy, -dz, ncy, ncz,
                        delta_y=0, delta_z=0,
                    )
                    - dbase
                )
                for f in range(n_fields):
                    cfs_ref[pl.ds((j * n_fields + f) * k_mov + b0, 8), :] = (
                        _shift_plane(
                            cf_refs[3 * f + src_i][0, pl.ds(b0, 8), :],
                            -dy, -dz, ncy, ncz,
                        )
                    )

    # phase 2: target-chunk accumulation
    ns = ns_ref[i]

    def t_body(t, _):
        t0 = pl.multiple_of(t * 8, 8)
        sub8 = jax.lax.broadcasted_iota(jnp.int32, (8, lanes), 0) + t0
        accs = tuple(f8 for f8 in fill8)

        # stay direction: full-capacity plane, no shift (dcode 13 codes
        # land in [0, cap) after the subtraction; every other class falls
        # out of range and can never match)
        def s_body(b, acc):
            b0 = pl.multiple_of(b * 8, 8)
            pch = scode_ref[0, pl.ds(b0, 8), :] - _STAY * cap
            fch = [fs_refs[f][0, pl.ds(b0, 8), :] for f in range(n_fields)]
            acc = list(acc)
            for bi in range(8):
                mask = pch[bi : bi + 1, :] == sub8
                for f in range(n_fields):
                    acc[f] = jnp.where(mask, fch[f][bi : bi + 1, :], acc[f])
            return tuple(acc)

        accs = jax.lax.fori_loop(0, ns, s_body, accs)

        # 26 mover directions: compact shifted planes from scratch
        for j, (dx, _dy, _dz) in enumerate(_MOVER_DIRS):
            src_i = _SRC_I[dx]

            def m_body(b, acc, j=j):
                b0 = pl.multiple_of(b * 8, 8)
                pch = pc_ref[pl.ds(j * k_mov + b0, 8), :]
                fch = [
                    cfs_ref[pl.ds((j * n_fields + f) * k_mov + b0, 8), :]
                    for f in range(n_fields)
                ]
                acc = list(acc)
                for bi in range(8):
                    mask = pch[bi : bi + 1, :] == sub8
                    for f in range(n_fields):
                        acc[f] = jnp.where(mask, fch[f][bi : bi + 1, :], acc[f])
                return tuple(acc)

            accs = jax.lax.fori_loop(0, nbm_ref[src_i, i], m_body, accs)

        for f in range(n_fields):
            out_refs[f][0, pl.ds(t0, 8), :] = jnp.where(
                live8, accs[f], fill8[f]
            )
        return 0

    jax.lax.fori_loop(0, nt_ref[0], t_body, 0)


def _chunks8(count, cap):
    """ceil(count/8) clipped to the capacity's chunk range, int32."""
    return jnp.clip((count + 7) // 8, 0, cap // 8).astype(jnp.int32)


def make_migrate_kernel3(
    cps: int,
    cap: int,
    n_fields: int,
    fills: Sequence[float],
    interpret: Optional[bool] = None,
    n_rows: Optional[int] = None,
    compact: bool = True,
    k_mov: int = 16,
):
    """Build ``migrate(max_occ, new_max_occ, scode_grid, *fields) ->
    ((*permuted,), mover_overflow)``.

    ``max_occ``: scalar int32 — pre-rebuild occupancy bound (pass ``cap``
    to disable clamping). ``new_max_occ``: scalar int32 — POST-rebuild
    occupancy bound (the allocation's max per-cell count; pass ``cap`` to
    disable). ``scode_grid``: (ncx, C, P) int32 SOURCE-frame codes, -1 =
    empty/invalid, else ``dcode * cap + a`` with ``a`` the allocated
    target slot (module docstring). ``fields``: n_fields f32 arrays on the
    packed (ncx, C, P) layout. Empty and padding slots of the outputs take
    ``fills[f]``; post-rebuild occupancy is the caller's job
    (``slot < new_count`` from the allocation's per-cell counts).

    ``mover_overflow``: bool — True iff some cell had more than ``k_mov``
    movers this rebuild (compaction would have dropped them; callers MUST
    fold this into the state's overflow flag). Always False with
    ``compact=False`` (the flat kernel scans everything).

    ``n_rows``: x-row count the call operates on (default: the full grid);
    the sharded engine passes its per-device row count and uses the
    attached ``.raw`` / ``.compact_fields`` with explicitly halo-exchanged
    COMPACT neighbor planes (K rows instead of cap — the stay direction
    never crosses x-rows, so full planes need no halo)."""
    assert len(fills) == n_fields
    assert cap % 8 == 0, f"capacity {cap} must be 8-aligned (sublane chunks)"
    assert k_mov % 8 == 0 and k_mov > 0, f"k_mov {k_mov} must be 8-aligned"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    lanes = _round_up(cps * cps, 128)
    rows = cps if n_rows is None else n_rows

    def fblock(index_map, nsub=cap):
        return pl.BlockSpec((1, nsub, lanes), index_map, memory_space=pltpu.VMEM)

    prev_blk = fblock(lambda i: ((i - 1) % rows, 0, 0))
    self_blk = fblock(lambda i: (i, 0, 0))
    next_blk = fblock(lambda i: ((i + 1) % rows, 0, 0))
    mo_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_struct = jax.ShapeDtypeStruct((rows, cap, lanes), jnp.float32)

    if not compact:
        kernel = functools.partial(
            _migrate_kernel3,
            cap=cap, ncy=cps, ncz=cps, lanes=lanes,
            n_fields=n_fields, fills=tuple(float(f) for f in fills),
        )
        cost = pl.CostEstimate(
            flops=rows * 27 * cap * cap * lanes * (1 + n_fields),
            bytes_accessed=(3 + 2 * n_fields) * rows * cap * lanes * 4,
            transcendentals=0,
        )

        def build_flat(in_specs):
            return pl.pallas_call(
                kernel,
                grid=(rows,),
                in_specs=in_specs,
                out_specs=[self_blk] * n_fields,
                out_shape=[out_struct] * n_fields,
                scratch_shapes=[
                    pltpu.VMEM((n_fields, cap, lanes), jnp.float32),
                    pltpu.VMEM((cap, lanes), jnp.int32),
                ],
                interpret=interpret,
                cost_estimate=cost,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=127 * 1024 * 1024
                ),
            )

        flat_call = build_flat(
            [mo_spec] + [prev_blk, self_blk, next_blk] * (1 + n_fields)
        )

        def migrate(max_occ, new_max_occ, scode_grid, *fields):
            del new_max_occ  # flat kernel materializes all cap target rows
            assert len(fields) == n_fields
            mo = jnp.asarray(max_occ, jnp.int32).reshape((1,))
            args = [mo, scode_grid, scode_grid, scode_grid]
            for f in fields:
                args += [f, f, f]
            return tuple(flat_call(*args)), jnp.zeros((), bool)

        return migrate

    # -- compacted-mover build --------------------------------------------
    kernel = functools.partial(
        _migrate_kernel3_compact,
        cap=cap, k_mov=k_mov, ncy=cps, ncz=cps, lanes=lanes,
        n_fields=n_fields, fills=tuple(float(f) for f in fills),
    )
    # candidate-row work model for the scheduler: stay r8(mo) rows of the
    # full plane + 26 mover directions x k_mov compact rows, at r8(nmo)
    # target height (flops is an upper-bound estimate — the dynamic SMEM
    # bounds cut the real count further)
    cost = pl.CostEstimate(
        flops=rows * (cap + 26 * k_mov) * cap * lanes * (1 + n_fields),
        bytes_accessed=(1 + 2 * n_fields) * rows * cap * lanes * 4
        + 3 * (1 + n_fields) * rows * k_mov * lanes * 4,
        transcendentals=0,
    )
    cprev_blk = fblock(lambda i: ((i - 1) % rows, 0, 0), nsub=k_mov)
    cself_blk = fblock(lambda i: (i, 0, 0), nsub=k_mov)
    cnext_blk = fblock(lambda i: ((i + 1) % rows, 0, 0), nsub=k_mov)
    scratch = [
        pltpu.VMEM((26 * k_mov, lanes), jnp.int32),
        pltpu.VMEM((26 * n_fields * k_mov, lanes), jnp.float32),
    ]

    def build(code_specs, field_specs):
        return pl.pallas_call(
            kernel,
            grid=(rows,),
            in_specs=[mo_spec, mo_spec, mo_spec, self_blk]
            + [self_blk] * n_fields
            + code_specs
            + field_specs * n_fields,
            out_specs=[self_blk] * n_fields,
            out_shape=[out_struct] * n_fields,
            scratch_shapes=scratch,
            interpret=interpret,
            cost_estimate=cost,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=127 * 1024 * 1024
            ),
        )

    call = build([cprev_blk, cself_blk, cnext_blk],
                 [cprev_blk, cself_blk, cnext_blk])

    def compact_fields(scode_grid, fields):
        """XLA-side shared mover compaction: pack each source cell's movers
        (dcode != 13) into k_mov sublane slots, preserving slot order.
        Returns ``(ccode, cfields, mov_counts, mover_overflow)`` with
        ccode (rows, K, P) int32 (-1 empty), cfields a list of
        (rows, K, P) f32, mov_counts (rows, 1, P) int32."""
        valid = scode_grid >= 0
        is_mov = valid & (scode_grid // cap != _STAY)
        mi = is_mov.astype(jnp.int32)
        inc = jnp.cumsum(mi, axis=1)
        mrank = inc - mi  # exclusive in-cell mover rank
        mov_counts = jax.lax.slice_in_dim(inc, cap - 1, cap, axis=1)
        mov_of = jnp.any(is_mov & (mrank >= k_mov))
        sel = is_mov[:, None] & (
            mrank[:, None] == jnp.arange(k_mov, dtype=jnp.int32)[None, :, None, None]
        )
        ccode = jnp.max(jnp.where(sel, scode_grid[:, None], -1), axis=2)
        cfs = [
            jnp.sum(jnp.where(sel, f[:, None], 0.0), axis=2) for f in fields
        ]
        return ccode, cfs, mov_counts, mov_of

    def _stay_chunks(scode_grid):
        """(rows,) int32 — per-x-row stay candidate chunks from occupancy."""
        occ_row = jnp.max(jnp.sum(scode_grid >= 0, axis=1), axis=-1)
        return _chunks8(occ_row, cap)

    def _mover_chunks(ccode):
        """(rows,) int32 — per-x-row mover candidate chunks."""
        cnt_row = jnp.max(jnp.sum(ccode >= 0, axis=1), axis=-1)
        return _chunks8(cnt_row, k_mov)

    def migrate(max_occ, new_max_occ, scode_grid, *fields):
        assert len(fields) == n_fields
        del max_occ  # subsumed by the per-row stay bounds
        ccode, cfs, _cnt, mov_of = compact_fields(scode_grid, list(fields))
        nt = _chunks8(jnp.asarray(new_max_occ, jnp.int32), cap).reshape((1,))
        ns_rows = _stay_chunks(scode_grid)
        nbm = _mover_chunks(ccode)
        # nbm3[src_i, i] = mover chunks of the direction's SOURCE row:
        # src_i 0 (dx=+1) reads row i-1, 1 reads i, 2 (dx=-1) reads i+1
        nbm3 = jnp.stack([jnp.roll(nbm, 1), nbm, jnp.roll(nbm, -1)])
        args = [nt, ns_rows, nbm3, scode_grid] + list(fields)
        args += [ccode, ccode, ccode]
        for cf in cfs:
            args += [cf, cf, cf]
        return tuple(call(*args)), mov_of

    # raw (explicit-halo) mode for the sharded engine: same kernel, but
    # the compact prev/next planes are caller-supplied arrays
    # (prev[i] = global row i-1, next[i] = global row i+1), run inside
    # shard_map on local rows. Only the COMPACT planes need halos — the
    # stay direction reads its own row. The caller compacts with
    # ``compact_fields`` BEFORE the exchange (K-row halos, not cap-row).
    raw_call = build([cself_blk] * 3, [cself_blk] * 3)

    def raw(max_occ, new_max_occ, scode_self, fields_self, ccode3, cfields3):
        """``ccode3 = (prev, self, next)`` compact code planes;
        ``cfields3 = (prevs, selfs, nexts)`` lists of compact field
        planes, all (local_rows, K, P)."""
        del max_occ
        assert len(fields_self) == n_fields
        assert len(ccode3) == 3
        prevs, selfs, nexts = cfields3
        assert len(prevs) == len(selfs) == len(nexts) == n_fields
        nt = _chunks8(jnp.asarray(new_max_occ, jnp.int32), cap).reshape((1,))
        ns_rows = _stay_chunks(scode_self)
        nbm3 = jnp.stack([_mover_chunks(c) for c in ccode3])
        args = [nt, ns_rows, nbm3, scode_self] + list(fields_self)
        args += list(ccode3)
        for p_, s_, x_ in zip(prevs, selfs, nexts):
            args += [p_, s_, x_]
        return tuple(raw_call(*args))

    migrate.raw = raw
    migrate.compact_fields = compact_fields
    migrate.k_mov = k_mov
    return migrate
