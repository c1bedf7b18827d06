"""Pallas migration-permute kernel (2D packed layout) — descriptor-free
slot permutation for the grid rebuild.

The migration rebuild is a permutation of slot rows: every live slot moves
to one of the 9 neighbor cells (temporal coherence), empty targets take
fill values. Round 2 implemented it as a packed (size, F) row SCATTER;
round 3 first replaced that with an inverse-index scatter + row GATHER
(grid_md.permute_rows_by_inverse). Measured on v5e
(results/gather_width_probe.py, 2.48M rows): every gather/scatter
formulation is descriptor-bound at <= ~84M rows/s (~12 ns/row) regardless
of row width — the N=1M rebuild could never beat ~29 ms that way.

This kernel removes the descriptors entirely. The permutation is dense
VPU work: for each target slot the source is one of 9 (directions) x cap
(slots) candidates, so the kernel unrolls 9*cap compare+select passes
against an int32 code grid:

    code[target t, slot a'] = dcode * cap + b   (or -1 for empty)

where ``dcode = (dx+1)*3 + (dy+1)`` is the migration direction of the
particle arriving at (t, a') and ``b`` its slot in the source cell
(t - d). The code grid is produced by ONE single-column int scatter (the
only descriptor op left, ~0.25 ms at 2.48M slots); each candidate row is
assembled with the same packed-layout lane rolls as the force kernel
(cell_pallas_packed._shift_col) and broadcast-selected into the output.

Cost: 9*cap * (1 cmp + F sel) vector ops per slot element — ~4.3G ops at
N=1M (VPU-bound, ~2 ms) vs 64 ms for the row gather it replaces.

No reference analog: the reference rebuilds nothing (dense O(N^2) pair
matrix, molecular_dynamics_jax_single-host_workload.py:50-62).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jax_tpus_benchmark_physics_simulation_tpu.ops.kernels.cell_pallas import _round_up
from jax_tpus_benchmark_physics_simulation_tpu.ops.kernels.cell_pallas_packed import (
    _shift_col,
)


def _row_source(prev_row, self_row, next_row, dx: int, ncy: int, rpb: int, lanes: int):
    """The (1, P) source row for x-direction ``dx`` in the packed layout:
    target sub-row r reads source sub-row r - dx; the block-crossing
    sub-row (0 for dx=+1, R-1 for dx=-1) is patched from the prev/next
    block's row. With R == 1 this reduces to the neighbor block's row."""
    if dx == 0:
        return self_row
    sub = jax.lax.broadcasted_iota(jnp.int32, self_row.shape, 1) // ncy
    if dx == 1:
        main = pltpu.roll(self_row, ncy % lanes, axis=1)
        cross = pltpu.roll(prev_row, (-(rpb - 1) * ncy) % lanes, axis=1)
        return jnp.where(sub == 0, cross, main)
    main = pltpu.roll(self_row, (-ncy) % lanes, axis=1)
    cross = pltpu.roll(next_row, ((rpb - 1) * ncy) % lanes, axis=1)
    return jnp.where(sub == rpb - 1, cross, main)


def _migrate_kernel(*refs, cap, ncy, rpb, lanes, n_fields, fills):
    """Ref order: (code, f0_prev, f0_self, f0_next, f1_prev, ...) ->
    (out0, ..., out{F-1}, occ).

    Loop structure: the (dx, dy) plane shifts are hoisted OUT of the b loop
    (one shifted (C, P) plane per direction per field), so the inner work
    is exactly one compare + n_fields sublane-broadcast selects per
    candidate — the minimum this one-hot formulation can do."""
    code_ref = refs[0]
    f_refs = refs[1 : 1 + 3 * n_fields]
    out_refs = refs[1 + 3 * n_fields : 1 + 4 * n_fields]
    occ_ref = refs[1 + 4 * n_fields]

    code = code_ref[0]  # (C, P) int32
    accs = [jnp.full(code.shape, f, jnp.float32) for f in fills]

    for dx in (-1, 0, 1):
        rowp = [
            _row_source(
                f_refs[3 * f][0], f_refs[3 * f + 1][0], f_refs[3 * f + 2][0],
                dx, ncy, rpb, lanes,
            )
            for f in range(n_fields)
        ]
        for dy in (-1, 0, 1):
            planes = [_shift_col(p, -dy, ncy) for p in rowp]
            dbase = ((dx + 1) * 3 + (dy + 1)) * cap
            for b in range(cap):
                mask = code == dbase + b
                for f in range(n_fields):
                    # (1, P) slice select-broadcasts across sublanes
                    accs[f] = jnp.where(mask, planes[f][b : b + 1, :], accs[f])

    live = jax.lax.broadcasted_iota(jnp.int32, code.shape, 1) < rpb * ncy
    filled = code >= 0
    for f in range(n_fields):
        base = jnp.full(code.shape, fills[f], jnp.float32)
        out_refs[f][0] = jnp.where(live & filled, accs[f], base)
    occ_ref[0] = jnp.where(live & filled, 1.0, 0.0).astype(jnp.float32)


def make_migrate_kernel(
    cps: int,
    cap: int,
    rows_per_block: int,
    n_fields: int,
    fills: Sequence[float],
    interpret: Optional[bool] = None,
    n_rows: Optional[int] = None,
):
    """Build ``migrate(code_grid, *fields) -> (*permuted_fields, occ)``.

    ``code_grid``: (G, C, P) int32, -1 = empty target slot, else
    ``dcode * cap + b`` (see module docstring). ``fields``: n_fields f32
    arrays on the packed (G, C, P) layout. Empty and padding slots of the
    outputs take ``fills[f]``; ``occ`` is 1.0 exactly where a particle
    landed.

    ``n_rows``: row count the call operates on (default: the full grid);
    the sharded engine passes its per-device row count and uses the
    attached ``.raw`` with explicitly halo-exchanged neighbor rows."""
    assert len(fills) == n_fields
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    rpb = rows_per_block
    assert cps % rpb == 0
    n_blocks = (cps if n_rows is None else n_rows) // rpb
    lanes = _round_up(rpb * cps, 128)

    kernel = functools.partial(
        _migrate_kernel,
        cap=cap,
        ncy=cps,
        rpb=rpb,
        lanes=lanes,
        n_fields=n_fields,
        fills=tuple(float(f) for f in fills),
    )

    def fblock(index_map):
        return pl.BlockSpec((1, cap, lanes), index_map, memory_space=pltpu.VMEM)

    prev_blk = fblock(lambda i: ((i - 1) % n_blocks, 0, 0))
    self_blk = fblock(lambda i: (i, 0, 0))
    next_blk = fblock(lambda i: ((i + 1) % n_blocks, 0, 0))
    in_specs = [self_blk] + [prev_blk, self_blk, next_blk] * n_fields
    out_struct = jax.ShapeDtypeStruct((n_blocks, cap, lanes), jnp.float32)
    cost = pl.CostEstimate(
        flops=n_blocks * 9 * cap * cap * lanes * (1 + n_fields),
        bytes_accessed=(1 + 2 * n_fields) * n_blocks * cap * lanes * 4,
        transcendentals=0,
    )
    call = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=[self_blk] * (n_fields + 1),
        out_shape=[out_struct] * (n_fields + 1),
        interpret=interpret,
        cost_estimate=cost,
        # Mosaic's conservative stack-liveness puts this kernel's scoped
        # allocation at ~91 MB for the N=1M grid (lanes 2816, F=11); the
        # v5e chip has 128 MB VMEM and nothing else lives during the call.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024
        ),
    )

    def migrate(code_grid, *fields):
        assert len(fields) == n_fields
        args = [code_grid]
        for f in fields:
            args += [f, f, f]
        return call(*args)

    # raw (explicit-halo) mode: same kernel, but prev/next rows are caller
    # -supplied arrays instead of wrapped index maps — the sharded engine
    # runs this INSIDE shard_map on its local rows, with the one-row halos
    # ppermuted in (same contract as cell_pallas.make_grid_force_kernel's
    # .raw). prev[i] must hold global row i-1, next[i] global row i+1.
    raw_call = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[self_blk] * (1 + 3 * n_fields),
        out_specs=[self_blk] * (n_fields + 1),
        out_shape=[out_struct] * (n_fields + 1),
        interpret=interpret,
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024
        ),
    )

    def raw(code_grid, prevs, selfs, nexts):
        assert rpb == 1, "raw (sharded) mode requires rows_per_block == 1"
        assert len(prevs) == len(selfs) == len(nexts) == n_fields
        args = [code_grid]
        for p_, s_, x_ in zip(prevs, selfs, nexts):
            args += [p_, s_, x_]
        return raw_call(*args)

    migrate.raw = raw
    return migrate
