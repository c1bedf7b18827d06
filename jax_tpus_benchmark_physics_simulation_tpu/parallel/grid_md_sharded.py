"""Multi-chip grid-resident LJ MD: spatial domain decomposition.

The single-chip grid engine (ops.kernels.grid_md) holds the cell grid
(ncx, C, ncy_pad) on one device. Here the cell-ROW axis is sharded over a
1-D mesh: each device owns ncx/P contiguous rows of the physical domain.

Per inner step (shard_map, all local except three one-row ppermutes):
- halo exchange: each device sends its first row of (x, y, occ) to its left
  neighbor, providing the "next row" the Newton force kernel needs;
- the Pallas cell kernel runs on the local rows;
- the Newton reaction buffer's last row is the force the local edge exerts
  on the neighbor's first row — one more ppermute delivers it;
- the Verlet update is elementwise-local; the displacement monitor reduces
  with a pmax at window end.

Cell re-binning (migration) runs OUTSIDE shard_map as plain jnp on the
GSPMD-sharded state every ~n_inner steps: XLA inserts the (cheap, amortized)
collectives for the cross-boundary rolls/scatters automatically. This keeps
the subtle allocation code identical to the proven single-device version.

Designed for real multi-chip slices; validated on the 8-virtual-device CPU
mesh (tests/test_grid_md_sharded.py) and exercised by the driver dryrun.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from jax_tpus_benchmark_physics_simulation_tpu.ops.kernels.cell_dense import CellGridFn
from jax_tpus_benchmark_physics_simulation_tpu.ops.kernels.cell_pallas import (
    make_grid_force_kernel,
)
from jax_tpus_benchmark_physics_simulation_tpu.ops.kernels.grid_md import (
    GridMD,
    GridMDState,
)


class ShardedGridMD(GridMD):
    """GridMD with the cell-row axis sharded over ``mesh`` (axis name 'x').

    Usage: build like GridMD plus a mesh; ``shard_state`` places a state;
    ``make_chunk_step`` returns a jit-ready chunk whose inner loop is a
    shard_map program.
    """

    def __init__(
        self,
        grid_fn: CellGridFn,
        mesh: Mesh,
        axis_name: str = "x",
        sigma: float = 1.0,
        epsilon: float = 1.0,
        dt: float = 1e-3,
        interpret: Optional[bool] = None,
        compensated: bool = False,
    ):
        super().__init__(
            grid_fn,
            sigma=sigma,
            epsilon=epsilon,
            dt=dt,
            interpret=interpret,
            compensated=compensated,
        )
        self.mesh = mesh
        self.axis_name = axis_name
        self.n_shards = mesh.shape[axis_name]
        if self.cps % self.n_shards:
            raise ValueError(
                f"cells_per_side {self.cps} not divisible by mesh size {self.n_shards}"
            )
        self.rows_local = self.cps // self.n_shards
        # local-row force kernel (halo mode)
        self._local_force = make_grid_force_kernel(
            grid_fn,
            sigma=sigma,
            epsilon=epsilon,
            interpret=interpret,
            newton=True,
            n_rows=self.rows_local,
        ).raw

    def prepare(self, state: GridMDState) -> GridMDState:
        return self.shard_state(state)

    # -- sharding helpers -----------------------------------------------------
    def _state_specs(self, state: GridMDState):
        def spec(leaf):
            if hasattr(leaf, "ndim") and leaf.ndim == 3:
                return P(self.axis_name)
            return P()

        return jax.tree.map(spec, state)

    def shard_state(self, state: GridMDState) -> GridMDState:
        specs = self._state_specs(state)
        return jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(self.mesh, s)), state, specs
        )

    # -- sharded inner window ---------------------------------------------------
    def _local_step(self, s: GridMDState) -> GridMDState:
        """One Verlet step on the local shard (called inside shard_map)."""
        ax, p = self.axis_name, self.n_shards
        dt, box = self.dt, self.box
        fwd = [(i, (i - 1) % p) for i in range(p)]  # row 0 -> left neighbor
        bwd = [(i, (i + 1) % p) for i in range(p)]  # row -1 -> right neighbor

        def force(xg, yg, og):
            def with_halo(v):
                halo = lax.ppermute(v[0:1], ax, fwd)  # next device's first row
                return jnp.concatenate([v[1:], halo], axis=0)

            fx, fy, e, rfx, rfy, re_ = self._local_force(
                xg, with_halo(xg), yg, with_halo(yg), og, with_halo(og)
            )

            def shift_reaction(r):
                halo = lax.ppermute(r[-1:], ax, bwd)  # prev device's last row
                return jnp.concatenate([halo, r[:-1]], axis=0)

            return (
                fx + shift_reaction(rfx),
                fy + shift_reaction(rfy),
                e + shift_reaction(re_),
            )

        if self.compensated:
            vxh, cvx = self._kadd(s.vxg, s.cvx, 0.5 * dt * s.fxg)
            vyh, cvy = self._kadd(s.vyg, s.cvy, 0.5 * dt * s.fyg)
            xg, crx = self._kadd(s.xg, s.crx, dt * vxh)
            yg, cry = self._kadd(s.yg, s.cry, dt * vyh)
            xg = jnp.mod(xg, box) * s.occ
            yg = jnp.mod(yg, box) * s.occ
            fxg, fyg, eg = force(xg, yg, s.occ)
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
        fxg, fyg, eg = force(xg, yg, s.occ)
        return s.replace(
            xg=xg, yg=yg,
            vxg=vxh + 0.5 * dt * fxg,
            vyg=vyh + 0.5 * dt * fyg,
            fxg=fxg, fyg=fyg, eg=eg,
            time=s.time + dt,
        )

    def make_chunk_step(self, n_inner: int):
        """Sharded chunk: conditional (global, GSPMD) migration rebuild, then
        ``n_inner`` shard_map steps with per-step displacement monitoring."""
        skin, box, ax = self.skin, self.box, self.axis_name

        def inner_window(s: GridMDState):
            def body(i, carry):
                s, dmax2 = carry
                s = self._local_step(s)
                dx = s.xg - s.ref_xg
                dx = dx - box * jnp.round(dx / box)
                dy = s.yg - s.ref_yg
                dy = dy - box * jnp.round(dy / box)
                d2 = jnp.max((dx * dx + dy * dy) * s.occ)
                return s, jnp.maximum(dmax2, d2)

            s, dmax2 = lax.fori_loop(0, n_inner, body, (s, jnp.zeros((), s.xg.dtype)))
            dmax2 = lax.pmax(dmax2, ax)
            violation = dmax2 > (0.5 * skin) ** 2
            return s.replace(overflow=s.overflow | violation)

        def chunk(s: GridMDState) -> GridMDState:
            # rebuild on the GSPMD-sharded global arrays (collectives auto)
            s = lax.cond(
                self._needs_rebuild(s, frac=0.25),
                self._rebuild_migrate,
                lambda t: t,
                s,
            )
            specs = self._state_specs(s)
            sharded = jax.shard_map(
                inner_window,
                mesh=self.mesh,
                in_specs=(specs,),
                out_specs=specs,
                check_vma=False,
            )
            return sharded(s)

        return chunk

    def force_once(self, s: GridMDState):
        """Single sharded force evaluation (for tests)."""
        specs = self._state_specs(s)
        arr_spec = P(self.axis_name)

        def one(s):
            s2 = self._local_step(s)
            return s2.fxg, s2.fyg

        # reuse _local_step indirectly: compute force at current positions by
        # a zero-dt trick is invasive; instead expose the halo force directly:
        def force_only(xg, yg, og):
            ax, p = self.axis_name, self.n_shards
            fwd = [(i, (i - 1) % p) for i in range(p)]
            bwd = [(i, (i + 1) % p) for i in range(p)]

            def with_halo(v):
                halo = lax.ppermute(v[0:1], ax, fwd)
                return jnp.concatenate([v[1:], halo], axis=0)

            fx, fy, e, rfx, rfy, re_ = self._local_force(
                xg, with_halo(xg), yg, with_halo(yg), og, with_halo(og)
            )

            def shift_reaction(r):
                halo = lax.ppermute(r[-1:], ax, bwd)
                return jnp.concatenate([halo, r[:-1]], axis=0)

            return fx + shift_reaction(rfx), fy + shift_reaction(rfy), e + shift_reaction(re_)

        return jax.shard_map(
            force_only,
            mesh=self.mesh,
            in_specs=(arr_spec, arr_spec, arr_spec),
            out_specs=(arr_spec, arr_spec, arr_spec),
            check_vma=False,
        )(s.xg, s.yg, s.occ)
