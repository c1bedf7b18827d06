"""Pallas migration-permute kernel (3D packed layout) — descriptor-free
slot permutation for the 3D grid rebuild.

3D counterpart of migrate_pallas.py (see its module docstring for the
descriptor-wall arithmetic that motivates the design: every gather/scatter
formulation is descriptor-bound at <= ~84M rows/s on v5e, so the
inverse-permute rebuild costs ~11 ms at 3D N=100k's 313k slots — measured
results/md3_breakdown_probe.py). This kernel realizes the permutation as
dense VPU compare/selects against the SOURCE-frame int32 code grid

    scode[source cell s, slot b] = dcode * cap + a   (-1 = empty/invalid)

where ``dcode = ((dx+1)*3 + (dy+1))*3 + (dz+1)`` is the slot's migration
direction (27 neighbors in 3D) and ``a`` its ALLOCATED slot in the target
cell s + d. The first version scattered a target-frame code grid instead
(one single-column int scatter) — the round-3 phase split
(results/rebuild3_phase_probe.py) measured that scatter at 1.5 ms of the
5.6 ms N=100k rebuild, the last descriptor op left; the source-frame code
is pure elementwise arithmetic and rides the same packed-layout lane
shifts as the field planes (cell_pallas3._shift_plane: lane = cy*ncz +
cz; the x axis rides the block axis with prev/self/next refs). Candidate
(direction j, source slot b) fills target slot a' exactly when
``scode_plane_j[b, :] - j*cap == a'`` (a broadcast compare against a
sublane iota — same vector cost as the old target-frame compare).
Post-rebuild occupancy is computed by the caller from the allocation's
per-cell counts (slots fill compactly from 0).

Two 3D-specific improvements over the 2D kernel:

- The candidate loop over source slots is a ``fori_loop`` over 8-aligned
  b-chunks bounded by the DYNAMIC pre-rebuild ``max_occ`` (SMEM scalar,
  same contract as the force kernel): source slots past the occupancy
  bound are empty (scode -1) and can never match, so at cap 48 /
  occupancy 28 only 32 of 48 candidate rows are visited. Chunks are
  dynamic slices on VMEM scratch refs (Mosaic lowers dynamic slicing on
  refs only, and sublane starts must be provably 8-aligned — hence
  ``pl.multiple_of``).
- The 27 x (F+1) shifted planes are written to scratch once per direction
  and the inner work is exactly one compare + F sublane-broadcast selects
  per candidate, accumulated in the fori carry (register-resident, one
  VMEM write per field at the end).

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


def _migrate_kernel3(*refs, cap, ncy, ncz, lanes, n_fields, fills):
    """Ref order: (mo, c_prev, c_self, c_next, f0_prev, f0_self, f0_next,
    f1_prev, ...) -> (out0, ..., out{F-1}), scratch: planes (F, cap,
    lanes) f32 + probe (cap, lanes) int32."""
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
        # target x-cell i reads source cell i - dx: +1 -> prev ref block
        src_i = {1: 0, 0: 1, -1: 2}[dx]
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                for f in range(n_fields):
                    planes_ref[f] = _shift_plane(
                        f_refs[3 * f + src_i][0], -dy, -dz, ncy, ncz
                    )
                dbase = (((dx + 1) * 3 + (dy + 1)) * 3 + (dz + 1)) * cap
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


def make_migrate_kernel3(
    cps: int,
    cap: int,
    n_fields: int,
    fills: Sequence[float],
    interpret: Optional[bool] = None,
    n_rows: Optional[int] = None,
):
    """Build ``migrate(max_occ, scode_grid, *fields) -> (*permuted,)``.

    ``max_occ``: scalar int32 — pre-rebuild occupancy bound (pass ``cap``
    to disable clamping). ``scode_grid``: (ncx, C, P) int32 SOURCE-frame
    codes, -1 = empty/invalid, else ``dcode * cap + a`` with ``a`` the
    allocated target slot (module docstring). ``fields``: n_fields f32
    arrays on the packed (ncx, C, P) layout. Empty and padding slots of
    the outputs take ``fills[f]``; post-rebuild occupancy is the caller's
    job (``slot < new_count`` from the allocation's per-cell counts).

    ``n_rows``: x-row count the call operates on (default: the full grid);
    the sharded engine passes its per-device row count and uses the
    attached ``.raw`` with explicitly halo-exchanged neighbor rows."""
    assert len(fills) == n_fields
    assert cap % 8 == 0, f"capacity {cap} must be 8-aligned (sublane chunks)"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    lanes = _round_up(cps * cps, 128)
    rows = cps if n_rows is None else n_rows

    kernel = functools.partial(
        _migrate_kernel3,
        cap=cap,
        ncy=cps,
        ncz=cps,
        lanes=lanes,
        n_fields=n_fields,
        fills=tuple(float(f) for f in fills),
    )

    def fblock(index_map):
        return pl.BlockSpec((1, cap, lanes), index_map, memory_space=pltpu.VMEM)

    prev_blk = fblock(lambda i: ((i - 1) % rows, 0, 0))
    self_blk = fblock(lambda i: (i, 0, 0))
    next_blk = fblock(lambda i: ((i + 1) % rows, 0, 0))
    mo_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_struct = jax.ShapeDtypeStruct((rows, cap, lanes), jnp.float32)
    cost = pl.CostEstimate(
        flops=rows * 27 * cap * cap * lanes * (1 + n_fields),
        bytes_accessed=(3 + 2 * n_fields) * rows * cap * lanes * 4,
        transcendentals=0,
    )

    def build(in_specs):
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

    call = build(
        [mo_spec] + [prev_blk, self_blk, next_blk] * (1 + n_fields)
    )

    def migrate(max_occ, scode_grid, *fields):
        assert len(fields) == n_fields
        mo = jnp.asarray(max_occ, jnp.int32).reshape((1,))
        args = [mo, scode_grid, scode_grid, scode_grid]
        for f in fields:
            args += [f, f, f]
        return call(*args)

    # raw (explicit-halo) mode for the sharded engine: same kernel, but
    # prev/next rows are caller-supplied arrays (prev[i] = global row i-1,
    # next[i] = global row i+1, INCLUDING the scode grid's halos), run
    # inside shard_map on local rows.
    raw_call = build([mo_spec] + [self_blk] * (3 + 3 * n_fields))

    def raw(max_occ, scode_triplet, prevs, selfs, nexts):
        assert len(scode_triplet) == 3
        assert len(prevs) == len(selfs) == len(nexts) == n_fields
        mo = jnp.asarray(max_occ, jnp.int32).reshape((1,))
        args = [mo] + list(scode_triplet)
        for p_, s_, x_ in zip(prevs, selfs, nexts):
            args += [p_, s_, x_]
        return raw_call(*args)

    migrate.raw = raw
    return migrate
