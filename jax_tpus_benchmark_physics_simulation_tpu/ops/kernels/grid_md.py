"""Grid-resident LJ molecular dynamics (2D) — the speed-of-light MD path.

Measured on TPU v5e: a single (100k,) element gather costs ~1 ms (TPU
gathers are descriptor-serial), so any per-step scatter/gather dominates the
physics. This engine therefore keeps ALL particle state (positions,
velocities, forces, particle ids) permanently in the cell-grid layout
``(ncx, C, ncy_pad)`` used by the Pallas cell kernel (cell_pallas.py):

- the velocity-Verlet update is pure elementwise work on grids;
- forces come from the Pallas cell kernel reading the grids directly;
- cell re-binning (an argsort + scatter permutation, grid -> grid) happens
  only when some particle has moved more than skin/2 — every ~10-50 steps —
  and is the ONLY gather/scatter in the whole run;
- particle order is recovered on demand (sampling/export) via the carried
  particle-id grid.

Unit masses (the reference MD has no per-particle masses,
molecular_dynamics...:66-75).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from jax_tpus_benchmark_physics_simulation_tpu.ops.kernels.cell_dense import CellGridFn
from jax_tpus_benchmark_physics_simulation_tpu.ops.kernels.cell_pallas import (
    _round_up,
    make_grid_force_kernel,
)


@struct.dataclass
class GridMDState:
    """All arrays have grid shape (ncx, C, ncy_pad)."""

    xg: jax.Array
    yg: jax.Array
    vxg: jax.Array
    vyg: jax.Array
    fxg: jax.Array
    fyg: jax.Array
    eg: jax.Array  # per-slot potential energy (pair-sum halves applied at read)
    occ: jax.Array  # float 1.0/0.0
    pid: jax.Array  # int32 particle id, sentinel -1
    ref_xg: jax.Array  # positions at last rebuild (for skin check)
    ref_yg: jax.Array
    overflow: jax.Array  # bool
    time: jax.Array
    # Kahan compensation residuals (compensated=True): kill the f32 random
    # walk of tiny per-step increments into large coordinates/velocities.
    crx: Optional[jax.Array] = None
    cry: Optional[jax.Array] = None
    cvx: Optional[jax.Array] = None
    cvy: Optional[jax.Array] = None


class GridMD:
    """Factory for the grid-resident MD step functions. All members are
    static Python; the state is the GridMDState pytree."""

    def __init__(
        self,
        grid_fn: CellGridFn,
        sigma: float = 1.0,
        epsilon: float = 1.0,
        dt: float = 1e-3,
        interpret: Optional[bool] = None,
        compensated: bool = False,
    ):
        assert grid_fn.dim == 2, "grid-resident MD is 2D"
        self.compensated = compensated
        self.grid_fn = grid_fn
        self.cps = grid_fn.cells_per_side
        self.cap = grid_fn.capacity
        self.lanes = _round_up(self.cps, 128)
        self.box = grid_fn.box
        self.skin = grid_fn.skin
        self.n = grid_fn.n
        self.dt = dt
        self.grid_shape = (self.cps, self.cap, self.lanes)
        self.size = self.cps * self.cap * self.lanes
        self.force_kernel = make_grid_force_kernel(
            grid_fn, sigma=sigma, epsilon=epsilon, interpret=interpret
        )

    # -- layout helpers ------------------------------------------------------
    def _slot2(self, position: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Flat grid slot for each particle + overflow flag."""
        cps, cap = self.cps, self.cap
        coords = jnp.clip(
            (position // (self.box / cps)).astype(jnp.int32), 0, cps - 1
        )
        ids = coords[:, 0] * cps + coords[:, 1]
        order = jnp.argsort(ids)
        sorted_ids = ids[order]
        seg = jnp.searchsorted(sorted_ids, sorted_ids, side="left")
        rank = jnp.arange(ids.shape[0], dtype=jnp.int32) - seg.astype(jnp.int32)
        overflow = jnp.any(rank >= cap)
        rank = jnp.minimum(rank, cap - 1)
        slot_sorted = sorted_ids * cap + rank  # (cell, a) flat
        slot = jnp.zeros_like(ids).at[order].set(slot_sorted)
        # map (cell_id, a) -> (cx, a, cy) grid layout flat index
        cell_id = slot // cap
        aa = slot % cap
        cx = cell_id // cps
        cy = cell_id % cps
        return (cx * cap + aa) * self.lanes + cy, overflow

    def prepare(self, state: GridMDState) -> GridMDState:
        """Placement hook (ShardedGridMD shards here; base is identity)."""
        return state

    def init(self, position: jax.Array, velocity: jax.Array) -> GridMDState:
        slot2, overflow = self._slot2(position)
        z = jnp.zeros((self.size,), position.dtype)

        def put(v):
            return z.at[slot2].set(v).reshape(self.grid_shape)

        xg, yg = put(position[:, 0]), put(position[:, 1])
        vxg, vyg = put(velocity[:, 0]), put(velocity[:, 1])
        occ = put(jnp.ones((self.n,), position.dtype))
        pid = (
            jnp.full((self.size,), -1, jnp.int32)
            .at[slot2]
            .set(jnp.arange(self.n, dtype=jnp.int32))
            .reshape(self.grid_shape)
        )
        fxg, fyg, eg = self.force_kernel(xg, yg, occ)
        zg = jnp.zeros(self.grid_shape, position.dtype)
        comp = dict(crx=zg, cry=zg, cvx=zg, cvy=zg) if self.compensated else {}
        return GridMDState(
            xg=xg, yg=yg, vxg=vxg, vyg=vyg, fxg=fxg, fyg=fyg, eg=eg,
            occ=occ, pid=pid, ref_xg=xg, ref_yg=yg,
            overflow=overflow, time=jnp.zeros((), position.dtype),
            **comp,
        )

    # -- migration rebuild (sort-free) ----------------------------------------
    def _rebuild_migrate(self, s: GridMDState) -> GridMDState:
        """Sort-free re-binning exploiting temporal coherence: between
        rebuilds every particle moves < skin/2 < cell size, so its new cell
        is one of the 9 neighbors of its assigned cell. Slot allocation per
        target cell is computed with rolls + small-axis cumsums (no global
        argsort — measured 79 ms for the sort-based rebuild at N=100k on
        v5e vs ~5 ms for this). A particle that somehow moved further than
        one cell raises ``overflow`` (and is kept in place — loud, not
        silent)."""
        cps, cap, lanes, box = self.cps, self.cap, self.lanes, self.box
        gs = self.grid_shape
        occ_b = s.occ > 0.5

        # current cell coords of each slot (by construction of the layout)
        cx = jax.lax.broadcasted_iota(jnp.int32, gs, 0)
        cy = jax.lax.broadcasted_iota(jnp.int32, gs, 2)
        # target cell coords from positions
        cell = box / cps
        txc = jnp.clip((s.xg // cell).astype(jnp.int32), 0, cps - 1)
        tyc = jnp.clip((s.yg // cell).astype(jnp.int32), 0, cps - 1)
        # migration direction in {-1, 0, 1} with periodic wrap
        dxc = (txc - cx + 1 + cps) % cps - 1
        dyc = (tyc - cy + 1 + cps) % cps - 1
        moved_far = occ_b & ((jnp.abs(dxc) > 1) | (jnp.abs(dyc) > 1))
        overflow = s.overflow | jnp.any(moved_far)
        # clamp far-movers to "stay" (flagged above)
        dxc = jnp.where(moved_far, 0, dxc)
        dyc = jnp.where(moved_far, 0, dyc)

        def roll_cells(v, dx, dy):
            """Periodic shift by (dx, dy) CELLS: out[cx, :, cy] =
            v[(cx - dx) % cps, :, (cy - dy) % cps]. The lane axis is padded to
            ``lanes`` > cps, so the y-wrap column is patched explicitly."""
            out = jnp.roll(v, dx, axis=0) if dx else v
            if dy:
                rolled = jnp.roll(out, dy, axis=2)
                col = jax.lax.broadcasted_iota(jnp.int32, rolled.shape, 2)
                if dy == 1:
                    rolled = jnp.where(col == 0, out[..., cps - 1 : cps], rolled)
                else:
                    rolled = jnp.where(col == cps - 1, out[..., 0:1], rolled)
                out = rolled
            return out

        dirs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
        # Allocation: per target cell, classes land in fixed order (stayers
        # and each direction), each class's slots starting after the counts
        # of all earlier classes. A target receives movers of direction d
        # from exactly one source cell (t - d), so a mover's in-class rank at
        # the target equals its rank within its source cell's class.
        base_at_target = jnp.zeros((cps, 1, lanes), jnp.int32)
        target_a = jnp.full(gs, -1, jnp.int32)
        for dx, dy in dirs:
            m = occ_b & (dxc == dx) & (dyc == dy)
            m_i = m.astype(jnp.int32)
            rank = jnp.cumsum(m_i, axis=1) - m_i  # exclusive, along slots
            count = jnp.sum(m_i, axis=1, keepdims=True)  # (cps, 1, lanes) source frame
            # base, expressed at the source cell: value at target t = s + d
            base_here = roll_cells(base_at_target, -dx, -dy)
            target_a = jnp.where(m, base_here + rank, target_a)
            # accumulate this class's count into the target-frame base
            base_at_target = base_at_target + roll_cells(count, dx, dy)

        slot_overflow = jnp.any((target_a >= cap) & occ_b)
        overflow = overflow | slot_overflow

        # flat destination index (in target frame); OOB -> dropped
        dest = ((txc * cap + target_a) * lanes + tyc).astype(jnp.int32)
        dest = jnp.where(occ_b & (target_a >= 0) & (target_a < cap), dest, self.size)
        dest_flat = dest.reshape(-1)

        def scat(v, fill=0.0, dtype=None):
            out = jnp.full((self.size + 1,), fill, dtype or v.dtype)
            return out.at[dest_flat].set(v.reshape(-1), mode="drop")[: self.size].reshape(gs)

        xg = scat(s.xg)
        yg = scat(s.yg)
        comp = (
            dict(crx=scat(s.crx), cry=scat(s.cry), cvx=scat(s.cvx), cvy=scat(s.cvy))
            if s.crx is not None
            else {}
        )
        return s.replace(
            xg=xg,
            yg=yg,
            vxg=scat(s.vxg),
            vyg=scat(s.vyg),
            fxg=scat(s.fxg),
            fyg=scat(s.fyg),
            eg=scat(s.eg),
            occ=scat(s.occ),
            pid=scat(s.pid, fill=-1, dtype=jnp.int32),
            ref_xg=xg,
            ref_yg=yg,
            overflow=overflow,
            **comp,
        )

    # -- rebuild (grid -> grid permutation, sort-based oracle) ---------------
    def _rebuild(self, s: GridMDState) -> GridMDState:
        cps, cap, lanes = self.cps, self.cap, self.lanes
        x = s.xg.reshape(-1)
        y = s.yg.reshape(-1)
        occ = s.occ.reshape(-1)
        n_cells = cps * cps

        cxi = jnp.clip((x // (self.box / cps)).astype(jnp.int32), 0, cps - 1)
        cyi = jnp.clip((y // (self.box / cps)).astype(jnp.int32), 0, cps - 1)
        ids = jnp.where(occ > 0.5, cxi * cps + cyi, n_cells)  # empties last

        order = jnp.argsort(ids)
        sorted_ids = ids[order]
        seg = jnp.searchsorted(sorted_ids, sorted_ids, side="left")
        rank = jnp.arange(self.size, dtype=jnp.int32) - seg.astype(jnp.int32)
        real = sorted_ids < n_cells
        overflow = s.overflow | jnp.any(real & (rank >= cap))
        rank = jnp.minimum(rank, cap - 1)
        cx = sorted_ids // cps
        cy = sorted_ids % cps
        new_slot = (cx * cap + rank) * lanes + cy
        new_slot = jnp.where(real, new_slot, self.size)  # drop empties

        def scat(v, fill=0.0, dtype=None):
            vv = v.reshape(-1)[order]
            out = jnp.full((self.size,), fill, dtype or v.dtype)
            return out.at[new_slot].set(vv, mode="drop").reshape(self.grid_shape)

        xg = scat(s.xg)
        yg = scat(s.yg)
        comp = (
            dict(crx=scat(s.crx), cry=scat(s.cry), cvx=scat(s.cvx), cvy=scat(s.cvy))
            if s.crx is not None
            else {}
        )
        return s.replace(
            xg=xg,
            yg=yg,
            vxg=scat(s.vxg),
            vyg=scat(s.vyg),
            fxg=scat(s.fxg),
            fyg=scat(s.fyg),
            eg=scat(s.eg),
            occ=scat(s.occ),
            pid=scat(s.pid, fill=-1, dtype=jnp.int32),
            ref_xg=xg,
            ref_yg=yg,
            overflow=overflow,
            **comp,
        )

    def _needs_rebuild(self, s: GridMDState, frac: float = 0.5) -> jax.Array:
        box = self.box
        dx = s.xg - s.ref_xg
        dx = dx - box * jnp.round(dx / box)
        dy = s.yg - s.ref_yg
        dy = dy - box * jnp.round(dy / box)
        d2 = (dx * dx + dy * dy) * s.occ
        return jnp.max(d2) > (frac * self.skin) ** 2

    # -- MD step ---------------------------------------------------------------
    @staticmethod
    def _kadd(x, c, inc):
        """Kahan-compensated x += inc with residual c."""
        y = inc - c
        t = x + y
        c = (t - x) - y
        return t, c

    def step_nocheck(self, s: GridMDState) -> GridMDState:
        """One velocity-Verlet step with NO rebuild logic — pure elementwise +
        force kernel. Only valid inside :meth:`make_chunk_step` windows."""
        dt, box = self.dt, self.box
        if self.compensated:
            # Compensated updates: per-step increments (dt*v ~ 1e-3) are
            # ~5 decimal digits below the coordinate scale (box ~ 350), so
            # plain f32 += loses a few percent of every increment; Kahan
            # residuals recover it (measured: 1M-step energy drift drops
            # from growing secularly to tolerance-level).
            # compensated == "positions": residuals only on coordinates (the
            # large-value accumulators); velocity kicks stay plain.
            pos_only = self.compensated == "positions"
            if pos_only:
                vxh = s.vxg + 0.5 * dt * s.fxg
                vyh = s.vyg + 0.5 * dt * s.fyg
                cvx = cvy = None
            else:
                vxh, cvx = self._kadd(s.vxg, s.cvx, 0.5 * dt * s.fxg)
                vyh, cvy = self._kadd(s.vyg, s.cvy, 0.5 * dt * s.fyg)
            xg, crx = self._kadd(s.xg, s.crx, dt * vxh)
            yg, cry = self._kadd(s.yg, s.cry, dt * vyh)
            xg = jnp.mod(xg, box) * s.occ
            yg = jnp.mod(yg, box) * s.occ
            fxg, fyg, eg = self.force_kernel(xg, yg, s.occ)
            if pos_only:
                vxg = vxh + 0.5 * dt * fxg
                vyg = vyh + 0.5 * dt * fyg
                cvx, cvy = s.cvx, s.cvy
            else:
                vxg, cvx = self._kadd(vxh, cvx, 0.5 * dt * fxg)
                vyg, cvy = self._kadd(vyh, cvy, 0.5 * dt * fyg)
            return s.replace(
                xg=xg, yg=yg, vxg=vxg, vyg=vyg, fxg=fxg, fyg=fyg, eg=eg,
                crx=crx, cry=cry, cvx=cvx, cvy=cvy, time=s.time + dt,
            )
        vxh = s.vxg + 0.5 * dt * s.fxg
        vyh = s.vyg + 0.5 * dt * s.fyg
        xg = jnp.mod(s.xg + dt * vxh, box) * s.occ
        yg = jnp.mod(s.yg + dt * vyh, box) * s.occ
        fxg, fyg, eg = self.force_kernel(xg, yg, s.occ)
        return s.replace(
            xg=xg,
            yg=yg,
            vxg=vxh + 0.5 * dt * fxg,
            vyg=vyh + 0.5 * dt * fyg,
            fxg=fxg,
            fyg=fyg,
            eg=eg,
            time=s.time + dt,
        )

    def step(self, s: GridMDState) -> GridMDState:
        """Single step with a per-step displacement-gated rebuild. Correct for
        any dt, but the on-device branch costs ~2x the step itself on TPU —
        prefer :meth:`make_chunk_step` for long runs."""
        s = jax.lax.cond(self._needs_rebuild(s), self._rebuild_migrate, lambda t: t, s)
        return self.step_nocheck(s)

    def make_chunk_step(self, n_inner: int):
        """Returns ``chunk(s) -> s`` advancing ``n_inner`` steps with a single
        (conditional) rebuild up front and a branch-free inner loop.

        Safety: every inner step tracks the exact max displacement from the
        rebuild reference; if any particle exceeded skin/2 mid-window (a pair
        could have entered the cutoff unseen), the state's ``overflow`` flag
        is raised — loud post-hoc detection, same contract as capacity
        overflow. (The reference has no such guard at all.)
        """
        skin, box = self.skin, self.box

        def chunk(s: GridMDState) -> GridMDState:
            # Rebuild at quarter-skin so the window that follows has half the
            # skin margin left before a true (flagged) violation at skin/2.
            s = jax.lax.cond(
                self._needs_rebuild(s, frac=0.25), self._rebuild_migrate, lambda t: t, s
            )

            def inner(i, carry):
                s, dmax2 = carry
                s = self.step_nocheck(s)
                dx = s.xg - s.ref_xg
                dx = dx - box * jnp.round(dx / box)
                dy = s.yg - s.ref_yg
                dy = dy - box * jnp.round(dy / box)
                d2 = jnp.max((dx * dx + dy * dy) * s.occ)
                return s, jnp.maximum(dmax2, d2)

            s, dmax2 = jax.lax.fori_loop(
                0, n_inner, inner, (s, jnp.zeros((), s.xg.dtype))
            )
            violation = dmax2 > (0.5 * skin) ** 2
            return s.replace(overflow=s.overflow | violation)

        return chunk

    def auto_inner_steps(
        self, kt: float = 1.0, vmax_sigmas: float = 8.0, gate_frac: float = 0.25
    ) -> int:
        """Rebuild cadence sized for the Maxwell tail.

        A chunk rebuilds when displacement-since-reference exceeds
        ``gate_frac * skin`` and flags a violation at ``skin/2``; the window
        must therefore satisfy ``v_tail * dt * k < (1/2 - gate_frac) * skin``
        for the fastest particle we care about. With 1e5 particles over 1e6
        steps the relevant tail is ~8 sigma (P(v > 8 sqrt(kT)) ~ 1e-14 per
        particle-window) — the earlier 4-sigma sizing produced real
        violations at N=100k (speeds > 5.7 occur constantly at that scale).
        """
        vmax = vmax_sigmas * kt**0.5
        k = int(((0.5 - gate_frac) * self.skin) / (vmax * self.dt))
        return max(1, k)

    # -- observables / export ---------------------------------------------------
    def kinetic_energy(self, s: GridMDState) -> jax.Array:
        return 0.5 * jnp.sum((s.vxg**2 + s.vyg**2) * s.occ)

    def potential_energy(self, s: GridMDState) -> jax.Array:
        return 0.5 * jnp.sum(s.eg * s.occ)

    def positions(self, s: GridMDState) -> jax.Array:
        """(N, 2) positions in particle order (one gather — use at sampling
        stride, not per step)."""
        pid = s.pid.reshape(-1)
        tgt = jnp.where(pid >= 0, pid, self.n)
        out = jnp.zeros((self.n + 1, 2), s.xg.dtype)
        out = out.at[tgt, 0].set(s.xg.reshape(-1), mode="drop")
        out = out.at[tgt, 1].set(s.yg.reshape(-1), mode="drop")
        return out[: self.n]

    def velocities(self, s: GridMDState) -> jax.Array:
        pid = s.pid.reshape(-1)
        tgt = jnp.where(pid >= 0, pid, self.n)
        out = jnp.zeros((self.n + 1, 2), s.vxg.dtype)
        out = out.at[tgt, 0].set(s.vxg.reshape(-1), mode="drop")
        out = out.at[tgt, 1].set(s.vyg.reshape(-1), mode="drop")
        return out[: self.n]
