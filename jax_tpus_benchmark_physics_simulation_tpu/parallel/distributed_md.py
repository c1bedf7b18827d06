"""Multi-chip LJ molecular dynamics on the ring force pass.

The reference cannot simulate interacting particles across devices at all
(its pmap is communication-free replication, SURVEY.md §2g). Here particles
shard over a 1-D mesh; every Verlet step runs two ring force passes
(lax.ppermute rotations, O(N^2/P) compute and O(N/P) memory per device), and
global observables (kinetic/potential energy) reduce across the mesh. The
whole multi-step run is a single shard_map-compatible jitted scan.

This is the strong-scaling dense path: for cutoff systems at large N the
grid-resident single-chip engine (ops.kernels.grid_md) is faster per chip;
the ring path is what makes N too big for one chip's HBM tractable.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh

from jax_tpus_benchmark_physics_simulation_tpu.core.config import MDConfig
from jax_tpus_benchmark_physics_simulation_tpu.ops.forces import wrap
from jax_tpus_benchmark_physics_simulation_tpu.parallel.mesh import (
    make_mesh,
    pad_to_multiple,
    shard_along,
)
from jax_tpus_benchmark_physics_simulation_tpu.parallel.ring import (
    make_ring_lj_energy,
    make_ring_lj_force,
)


@dataclass
class DistributedMDResult:
    position: jax.Array  # (N, D) valid particles
    velocity: jax.Array
    ke_history: jax.Array  # (num_samples,)
    pe_history: jax.Array


def run_distributed_md(
    cfg: MDConfig,
    state_position: jax.Array,
    state_velocity: jax.Array,
    mesh: Optional[Mesh] = None,
    num_steps: Optional[int] = None,
    sample_every: Optional[int] = None,
) -> DistributedMDResult:
    """Advance ``num_steps`` (default cfg.prod_steps) Verlet steps with the
    particle axis sharded over ``mesh`` (default: all devices)."""
    mesh = mesh or make_mesh()
    p = mesh.devices.size
    n = state_position.shape[0]
    num_steps = cfg.prod_steps if num_steps is None else num_steps
    sample_every = cfg.sample_every if sample_every is None else sample_every
    box, dt = cfg.box_size, cfg.dt

    n_pad = pad_to_multiple(n, p)
    pos = jnp.concatenate(
        [state_position, jnp.zeros((n_pad - n, cfg.dim), state_position.dtype)]
    )
    vel = jnp.concatenate(
        [state_velocity, jnp.zeros((n_pad - n, cfg.dim), state_velocity.dtype)]
    )
    valid = jnp.arange(n_pad) < n
    vmask = valid[:, None].astype(pos.dtype)

    sharding = shard_along(mesh)
    pos = jax.device_put(pos, sharding)
    vel = jax.device_put(vel, sharding)
    valid = jax.device_put(valid, sharding)

    force = make_ring_lj_force(
        mesh, sigma=cfg.sigma, epsilon=cfg.epsilon, box=box, cutoff=cfg.cutoff
    )
    # potential energy via the same ring pass (psum-reduced scalar) — a real
    # per-sample series, not a broadcast final value
    energy = make_ring_lj_energy(
        mesh, sigma=cfg.sigma, epsilon=cfg.epsilon, box=box, cutoff=cfg.cutoff
    )

    @jax.jit
    def program(pos, vel, valid):
        vmask = valid[:, None].astype(pos.dtype)

        def step(carry):
            r, v, f = carry
            v_half = v + 0.5 * dt * f
            r_new = wrap(r + dt * v_half, box) * vmask
            f_new = force(r_new, valid) * vmask
            v_new = (v_half + 0.5 * dt * f_new) * vmask
            return (r_new, v_new, f_new)

        def sample_block(carry, _):
            carry = lax.fori_loop(0, sample_every, lambda i, c: step(c), carry)
            r, v, f = carry
            ke = 0.5 * jnp.sum(v * v)
            pe = energy(r, valid)
            return carry, (ke, pe)

        f0 = force(pos, valid) * vmask
        n_samples = max(1, num_steps // sample_every)
        (pos, vel, _), (ke_hist, pe_hist) = lax.scan(
            sample_block, (pos, vel, f0), length=n_samples
        )
        return pos, vel, ke_hist, pe_hist

    pos, vel, ke_hist, pe_hist = program(pos, vel, valid)
    return DistributedMDResult(
        position=pos[:n],
        velocity=vel[:n],
        ke_history=ke_hist,
        pe_history=pe_hist,
    )
