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

This kernel removes the descriptors ENTIRELY — including the code grid's
own scatter. The first version scattered a target-frame code grid
(``code[t, a'] = dcode * cap + b``) with one single-column int scatter;
the round-3 phase split (results/rebuild3_phase_probe.py) measured that
scatter at 1.5 ms of the 5.6 ms 3D N=100k rebuild (and ~3 ms at 2D N=1M,
2.48M slots) — the last descriptor op was the second-largest term. It is
gone: the kernel now consumes the SOURCE-frame code

    scode[source cell s, slot b] = dcode * cap + a   (-1 = empty/invalid)

where ``dcode = (dx+1)*3 + (dy+1)`` is the slot's migration direction and
``a`` its ALLOCATED slot in the target cell s + d. ``scode`` is pure
elementwise arithmetic off the allocation phase (no scatter); the kernel
shifts it through the same packed-layout lane rolls as the field planes
(cell_pallas_packed._shift_col / _row_source) and, for candidate
(direction j, source slot b), matches target slot a' exactly when

    scode_plane_j[b, :] - j*cap == a'      (compare vs a sublane iota).

Each source slot carries exactly one (dcode, a), and the allocation is
injective, so every target slot still matches at most one candidate —
the select structure is unchanged, only the compare operand moved from a
scattered target grid to a shifted source plane. Post-rebuild occupancy
is no longer a kernel output: it equals ``slot < new_count(cell)`` with
the per-cell counts the allocation already has (grid_md._migration_dest).

Cost: 9*cap * (1 cmp + F sel) vector ops per slot element — ~4.3G ops at
N=1M (VPU-bound, ~2 ms) vs 64 ms for the row gather it replaces, with
zero descriptor ops left in the rebuild.

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
    """Ref order: (c_prev, c_self, c_next, f0_prev, f0_self, f0_next,
    f1_prev, ...) -> (out0, ..., out{F-1}).

    Loop structure: the (dx, dy) plane shifts are hoisted OUT of the b loop
    (one shifted (C, P) plane per direction per field, plus the shifted
    source-code plane), so the inner work is exactly one broadcast compare
    + n_fields sublane-broadcast selects per candidate — the minimum this
    one-hot formulation can do."""
    c_refs = refs[0:3]
    f_refs = refs[3 : 3 + 3 * n_fields]
    out_refs = refs[3 + 3 * n_fields : 3 + 4 * n_fields]

    shape = (cap, lanes)
    accs = [jnp.full(shape, f, jnp.float32) for f in fills]
    # target slot index a' along the sublane axis
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, shape, 0)

    for dx in (-1, 0, 1):
        crow = _row_source(
            c_refs[0][0], c_refs[1][0], c_refs[2][0], dx, ncy, rpb, lanes
        )
        rowp = [
            _row_source(
                f_refs[3 * f][0], f_refs[3 * f + 1][0], f_refs[3 * f + 2][0],
                dx, ncy, rpb, lanes,
            )
            for f in range(n_fields)
        ]
        for dy in (-1, 0, 1):
            # delta=0 (int): the float default would promote int32 codes
            cplane = _shift_col(crow, -dy, ncy, delta=0)
            planes = [_shift_col(p, -dy, ncy) for p in rowp]
            probe = cplane - ((dx + 1) * 3 + (dy + 1)) * cap
            for b in range(cap):
                # (1, P) row compare broadcasts across target sublanes a'
                mask = probe[b : b + 1, :] == sub_iota
                for f in range(n_fields):
                    accs[f] = jnp.where(mask, planes[f][b : b + 1, :], accs[f])

    # padding lanes can match garbage codes brought in by the rolls;
    # live target slots that matched nothing already hold fills[f]
    live = jax.lax.broadcasted_iota(jnp.int32, shape, 1) < rpb * ncy
    for f in range(n_fields):
        base = jnp.full(shape, fills[f], jnp.float32)
        out_refs[f][0] = jnp.where(live, accs[f], base)


def make_migrate_kernel(
    cps: int,
    cap: int,
    rows_per_block: int,
    n_fields: int,
    fills: Sequence[float],
    interpret: Optional[bool] = None,
    n_rows: Optional[int] = None,
):
    """Build ``migrate(scode_grid, *fields) -> (*permuted_fields,)``.

    ``scode_grid``: (G, C, P) int32 SOURCE-frame codes, -1 = empty/invalid
    slot, else ``dcode * cap + a`` with ``a`` the allocated target slot
    (see module docstring). ``fields``: n_fields f32 arrays on the packed
    (G, C, P) layout. Empty and padding slots of the outputs take
    ``fills[f]``. Post-rebuild occupancy is the caller's job (it equals
    ``slot < new_count``, available from the allocation's per-cell counts).

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
    in_specs = [prev_blk, self_blk, next_blk] * (1 + n_fields)
    out_struct = jax.ShapeDtypeStruct((n_blocks, cap, lanes), jnp.float32)
    cost = pl.CostEstimate(
        flops=n_blocks * 9 * cap * cap * lanes * (1 + n_fields),
        bytes_accessed=(3 + 2 * n_fields) * n_blocks * cap * lanes * 4,
        transcendentals=0,
    )
    call = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=[self_blk] * n_fields,
        out_shape=[out_struct] * n_fields,
        interpret=interpret,
        cost_estimate=cost,
        # Mosaic's conservative stack-liveness put the pre-scode kernel's
        # scoped allocation at ~91 MB for the N=1M grid (lanes 2816, F=11);
        # the SOURCE-frame form adds 3 scode input blocks + one hoisted int32
        # probe plane per direction (~+4 MB at that size). The v5e chip has
        # 128 MB VMEM and nothing else lives during the call — the committed
        # N=1M re-measurement (2.99 ms hot rebuild, results/RESULTS.md
        # "Scatter-free rebuild") ran inside this limit.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024
        ),
    )

    def migrate(scode_grid, *fields):
        assert len(fields) == n_fields
        args = [scode_grid, scode_grid, scode_grid]
        for f in fields:
            args += [f, f, f]
        return call(*args)

    # raw (explicit-halo) mode: same kernel, but prev/next rows are caller
    # -supplied arrays instead of wrapped index maps — the sharded engine
    # runs this INSIDE shard_map on its local rows, with the one-row halos
    # (INCLUDING the scode grid's) ppermuted in (same contract as
    # cell_pallas.make_grid_force_kernel's .raw). prev[i] must hold global
    # row i-1, next[i] global row i+1.
    raw_call = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[self_blk] * (3 + 3 * n_fields),
        out_specs=[self_blk] * n_fields,
        out_shape=[out_struct] * n_fields,
        interpret=interpret,
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024
        ),
    )

    def raw(scode_triplet, prevs, selfs, nexts):
        assert rpb == 1, "raw (sharded) mode requires rows_per_block == 1"
        assert len(scode_triplet) == 3
        assert len(prevs) == len(selfs) == len(nexts) == n_fields
        args = list(scode_triplet)
        for p_, s_, x_ in zip(prevs, selfs, nexts):
            args += [p_, s_, x_]
        return raw_call(*args)

    migrate.raw = raw
    return migrate
