"""BAOAB Langevin thermostat (NVT) for the grid engines.

The reference is NVE-only (molecular_dynamics_jax_single-host_workload.py
has no thermostat at all); NVT is a beyond-reference capability. Physics
checks: kinetic temperature converges to the target from a mismatched
start, sentinel slots stay exactly at rest (occupancy-masked noise), the
sharded engine matches the target with decorrelated per-shard noise, and
the model/CLI layer validates impl dispatch.
"""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the fast tier

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax_tpus_benchmark_physics_simulation_tpu.ops.kernels.cell_dense import (
    make_cell_grid_fn,
)
from jax_tpus_benchmark_physics_simulation_tpu.ops.kernels.grid_md import GridMD


def _lattice(n, box, key, dim=2, kt=1.0):
    per = int(np.ceil(n ** (1.0 / dim)))
    sp = box / per
    g = jnp.arange(per, dtype=jnp.float32) * sp + 0.5 * sp
    mesh = jnp.stack(jnp.meshgrid(*([g] * dim), indexing="ij"), -1).reshape(-1, dim)[:n]
    pos = jnp.mod(mesh + 0.05 * jax.random.normal(key, mesh.shape), box)
    vel = np.sqrt(kt) * jax.random.normal(jax.random.fold_in(key, 1), (n, dim))
    return pos, vel


def _run_chunks(md, s, chunk, n_chunks):
    @jax.jit
    def run(s):
        return jax.lax.fori_loop(0, n_chunks, lambda i, t: chunk(t), s)

    return run(s)


class TestLangevin2D:
    def test_converges_to_target_kt(self):
        n, rho, kt_target = 1024, 0.8, 0.5
        box = float(np.sqrt(n / rho))
        gf = make_cell_grid_fn(box, 2.5, n, dim=2)
        md = GridMD(gf, dt=2e-3, compensated=True)
        pos, vel = _lattice(n, box, jax.random.PRNGKey(0), kt=1.0)  # hot start
        s = md.init(pos, vel, seed=7)
        chunk = md.make_chunk_step(5, 0.35, thermostat=(2.0, kt_target))
        s = _run_chunks(md, s, chunk, 400)  # 2000 steps
        # average over a window to beat the instantaneous KE fluctuation
        kts = []
        for _ in range(10):
            s = _run_chunks(md, s, chunk, 20)
            kts.append(float(md.kinetic_energy(s)) / n)  # 2D: KE/N = kT
        assert not bool(s.overflow)
        assert np.mean(kts) == pytest.approx(kt_target, rel=0.06)

    def test_empty_slots_stay_at_rest(self):
        n, rho = 400, 0.8
        box = float(np.sqrt(n / rho))
        gf = make_cell_grid_fn(box, 2.5, n, dim=2)
        md = GridMD(gf, dt=2e-3)
        pos, vel = _lattice(n, box, jax.random.PRNGKey(1))
        s = md.init(pos, vel, seed=3)
        chunk = md.make_chunk_step(4, 0.3, thermostat=(1.0, 0.8))
        s = _run_chunks(md, s, chunk, 100)
        empty = s.occ < 0.5
        assert float(jnp.max(jnp.abs(jnp.where(empty, s.vxg, 0.0)))) == 0.0
        assert float(jnp.max(jnp.abs(jnp.where(empty, s.vyg, 0.0)))) == 0.0
        assert bool(jnp.all(jnp.where(empty, s.xg, md.sentinel) == md.sentinel))
        # particle count conserved through thermostatted rebuilds
        assert int(jnp.sum(s.occ)) == n

    def test_requires_seed(self):
        n, rho = 256, 0.8
        box = float(np.sqrt(n / rho))
        gf = make_cell_grid_fn(box, 2.5, n, dim=2)
        md = GridMD(gf, dt=1e-3)
        pos, vel = _lattice(n, box, jax.random.PRNGKey(2))
        s = md.init(pos, vel)  # no seed
        chunk = md.make_chunk_step(2, 0.3, thermostat=(1.0, 1.0))
        with pytest.raises(ValueError, match="PRNG"):
            chunk(s)


class TestLangevin3D:
    def test_converges_to_target_kt(self):
        from jax_tpus_benchmark_physics_simulation_tpu.ops.kernels.grid_md3 import (
            GridMD3,
        )

        n, rho, kt_target = 1000, 0.8, 0.7
        box = float((n / rho) ** (1.0 / 3.0))
        gf = make_cell_grid_fn(box, 2.5, n, dim=3)
        md = GridMD3(gf, dt=2e-3, compensated=True)
        pos, vel = _lattice(n, box, jax.random.PRNGKey(0), dim=3, kt=1.0)
        s = md.init(pos, vel, seed=11)
        chunk = md.make_chunk_step(5, 0.35, thermostat=(2.0, kt_target))
        s = _run_chunks(md, s, chunk, 300)  # 1500 steps
        kts = []
        for _ in range(8):
            s = _run_chunks(md, s, chunk, 20)
            kts.append(2.0 * float(md.kinetic_energy(s)) / (3.0 * n))
        assert not bool(s.overflow)
        assert np.mean(kts) == pytest.approx(kt_target, rel=0.08)


class TestLangevinSharded:
    def test_sharded_2d_converges_and_decorrelates(self):
        from jax_tpus_benchmark_physics_simulation_tpu.parallel.grid_md_sharded import (
            ShardedGridMD,
        )
        from jax_tpus_benchmark_physics_simulation_tpu.parallel.mesh import make_mesh

        n_dev = jax.device_count()
        assert n_dev == 8, "conftest provides the virtual 8-device mesh"
        n, kt_target = 1752, 0.6  # box 46.8 -> cps 16, divisible by 8
        # pick a box whose cell count divides the mesh
        gf = make_cell_grid_fn(float(np.sqrt(n / 0.8)), 2.5, n, dim=2)
        if gf.cells_per_side % n_dev:
            pytest.skip(f"cps {gf.cells_per_side} not divisible by {n_dev}")
        md = ShardedGridMD(gf, make_mesh(n_dev, axis_name="x"), dt=2e-3)
        box = gf.box
        pos, vel = _lattice(n, box, jax.random.PRNGKey(4), kt=1.0)
        s = md.prepare(md.init(pos, vel, seed=5))
        chunk = md.make_chunk_step(4, 0.3, thermostat=(2.0, kt_target))
        s = _run_chunks(md, s, chunk, 400)  # 1600 steps
        kts = []
        for _ in range(8):
            s = _run_chunks(md, s, chunk, 25)
            kts.append(float(md.kinetic_energy(s)) / n)
        assert not bool(s.overflow)
        assert np.mean(kts) == pytest.approx(kt_target, rel=0.08)
        # decorrelation: per-shard-block KE should not be identical (the
        # replicated key is folded with the shard index)
        blocks = s.vxg.reshape(8, -1)
        kes = jnp.sum(blocks**2, axis=1)
        assert float(jnp.std(kes)) > 0.0


class TestModelLayer:
    def test_lj_fluid_nvt_end_to_end(self):
        from jax_tpus_benchmark_physics_simulation_tpu.core.config import (
            MDConfig,
            override,
        )
        from jax_tpus_benchmark_physics_simulation_tpu.models import lj_fluid

        cfg = override(
            MDConfig(),
            n=1024,
            dim=2,
            cutoff=2.5,
            force_impl="grid",
            init="lattice",
            kt=0.5,
            dt=2e-3,
            eq_steps=1500,
            prod_steps=500,
            sample_every=100,
            thermostat="langevin",
            gamma=2.0,
        )
        res = lj_fluid.run(cfg)
        assert not res.overflow
        kts = np.asarray(res.ke_history) / cfg.n  # 2D: KE/N = kT
        assert np.mean(kts) == pytest.approx(0.5, rel=0.1)

    def test_thermostat_rejects_non_grid_impl(self):
        from jax_tpus_benchmark_physics_simulation_tpu.core.config import (
            MDConfig,
            override,
        )
        from jax_tpus_benchmark_physics_simulation_tpu.models import lj_fluid

        cfg = override(
            MDConfig(),
            n=64,
            thermostat="langevin",
            force_impl="dense_xla",
        )
        with pytest.raises(ValueError, match="grid"):
            lj_fluid.run(cfg)
