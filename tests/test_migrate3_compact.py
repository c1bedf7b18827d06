"""Compacted-mover 3D migrate kernel vs the flat parity oracle and a NumPy
permutation reference (interpret mode on CPU; identical kernel code compiles
via Mosaic on TPU — timing lives in results/migrate_compact_probe.py).

The scode contract under test is grid_md3._migration_dest3's: per SOURCE
slot, ``dcode * cap + a`` with ``a`` the allocated slot in the target cell
(compact from 0 per target cell), -1 empty/invalid. The compact build packs
movers (dcode != 13) into k_mov shared sublane slots and must (1) produce
the identical permutation, (2) raise mover_overflow iff some cell exceeds
k_mov movers (silent dropping is banned)."""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the fast tier

import jax.numpy as jnp
import numpy as np
import pytest

from jax_tpus_benchmark_physics_simulation_tpu.ops.kernels.cell_pallas import (
    _round_up,
)
from jax_tpus_benchmark_physics_simulation_tpu.ops.kernels.migrate_pallas3 import (
    make_migrate_kernel3,
)

DIRS = [
    (dx, dy, dz)
    for dx in (-1, 0, 1)
    for dy in (-1, 0, 1)
    for dz in (-1, 0, 1)
]  # index == dcode


def synth_migration(cps, cap, n_fields, fills, rng, max_fill, stay_frac=0.5):
    """Random migration instance on the packed (ncx, cap, lanes) layout.

    Returns (scode, fields, expected, new_max_occ). Allocation mirrors the
    engine: per target cell, slots assigned compactly in (class, source
    order); arrivals past cap are dropped (scode -1), exactly like
    _migration_dest3's `valid` mask."""
    lanes = _round_up(cps * cps, 128)
    occ = rng.integers(0, max_fill + 1, size=(cps, cps, cps))
    # direction per occupied slot: biased toward stay like a real fluid
    dchoice = rng.integers(0, 27, size=(cps, cps, cps, cap))
    stay = rng.random((cps, cps, cps, cap)) < stay_frac
    dchoice = np.where(stay, 13, dchoice)

    scode = np.full((cps, cap, lanes), -1, np.int64)
    fields = [
        rng.normal(size=(cps, cap, lanes)).astype(np.float32)
        for _ in range(n_fields)
    ]
    expected = [
        np.full((cps, cap, lanes), fills[f], np.float32)
        for f in range(n_fields)
    ]
    tcount = np.zeros((cps, cps, cps), np.int64)
    # class-order allocation (matches the engine's cumsum-over-classes)
    for j, (dx, dy, dz) in enumerate(DIRS):
        for sx in range(cps):
            for sy in range(cps):
                for sz in range(cps):
                    sl = sy * cps + sz
                    for b in range(occ[sx, sy, sz]):
                        if dchoice[sx, sy, sz, b] != j:
                            continue
                        tx = (sx + dx) % cps
                        ty = (sy + dy) % cps
                        tz = (sz + dz) % cps
                        a = tcount[tx, ty, tz]
                        tcount[tx, ty, tz] += 1
                        if a >= cap:
                            continue  # dropped by the engine's valid mask
                        scode[sx, b, sl] = j * cap + a
                        tl = ty * cps + tz
                        for f in range(n_fields):
                            expected[f][tx, a, tl] = fields[f][sx, b, sl]
    new_mo = int(min(tcount.max(), cap))
    return (
        jnp.asarray(scode, jnp.int32),
        [jnp.asarray(f) for f in fields],
        expected,
        new_mo,
    )


class TestMigrate3Compact:
    @pytest.mark.parametrize("cps,cap,k_mov,n_fields", [
        (4, 8, 8, 1),
        (5, 16, 8, 3),
        (4, 16, 16, 2),
    ])
    def test_matches_flat_and_numpy(self, cps, cap, k_mov, n_fields):
        rng = np.random.default_rng(cps * 100 + cap + k_mov)
        fills = [-7.0 + f for f in range(n_fields)]
        scode, fields, expected, new_mo = synth_migration(
            cps, cap, n_fields, fills, rng, max_fill=min(4, cap // 2)
        )
        flat = make_migrate_kernel3(
            cps, cap, n_fields, fills, interpret=True, compact=False
        )
        comp = make_migrate_kernel3(
            cps, cap, n_fields, fills, interpret=True, compact=True,
            k_mov=k_mov,
        )
        out_f, of_f = flat(cap, new_mo, scode, *fields)
        out_c, of_c = comp(cap, new_mo, scode, *fields)
        assert not bool(of_f)
        assert not bool(of_c), "synthetic instance must fit k_mov movers"
        lanes_live = cps * cps
        for f in range(n_fields):
            np.testing.assert_array_equal(
                np.asarray(out_c[f])[:, :, :lanes_live],
                expected[f][:, :, :lanes_live],
                err_msg=f"compact kernel field {f} vs numpy reference",
            )
            np.testing.assert_array_equal(
                np.asarray(out_c[f])[:, :, :lanes_live],
                np.asarray(out_f[f])[:, :, :lanes_live],
                err_msg=f"compact vs flat field {f}",
            )

    def test_target_bound_prefills_tail(self):
        """Rows past new_max_occ hold the fill value (target-axis chunking
        never visits them)."""
        rng = np.random.default_rng(11)
        cps, cap, fills = 4, 16, [3.5]
        scode, fields, expected, new_mo = synth_migration(
            cps, cap, 1, fills, rng, max_fill=3
        )
        assert new_mo < cap
        comp = make_migrate_kernel3(
            cps, cap, 1, fills, interpret=True, compact=True, k_mov=8
        )
        out, _ = comp(cap, new_mo, scode, *fields)
        tail = np.asarray(out[0])[:, new_mo:, : cps * cps]
        np.testing.assert_array_equal(tail, np.full_like(tail, 3.5))

    def test_mover_overflow_is_loud(self):
        """A cell with more than k_mov movers must raise the flag — the
        compaction would otherwise silently drop particles."""
        cps, cap, k_mov = 4, 24, 8
        lanes = _round_up(cps * cps, 128)
        scode = np.full((cps, cap, lanes), -1, np.int64)
        # 10 > k_mov movers in source cell (0, 0, 0), all dcode 14
        # (dx,dy,dz)=(0,0,1): targets (0,0,1) slots 0..9 (compact, < cap)
        for b in range(10):
            scode[0, b, 0] = 14 * cap + b
        field = np.zeros((cps, cap, lanes), np.float32)
        field[0, :10, 0] = np.arange(1.0, 11.0)
        comp = make_migrate_kernel3(
            cps, cap, 1, [0.0], interpret=True, compact=True, k_mov=k_mov
        )
        out, of = comp(cap, 10, jnp.asarray(scode, jnp.int32),
                       jnp.asarray(field))
        assert bool(of), "overflowing mover compaction must be loud"
        # flat oracle still routes everything (scans full planes)
        flat = make_migrate_kernel3(
            cps, cap, 1, [0.0], interpret=True, compact=False
        )
        out_f, of_f = flat(cap, 10, jnp.asarray(scode, jnp.int32),
                           jnp.asarray(field))
        assert not bool(of_f)
        np.testing.assert_array_equal(
            np.asarray(out_f[0])[0, :10, 1], np.arange(1.0, 11.0)
        )
