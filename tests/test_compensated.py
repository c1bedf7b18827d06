"""Kahan-compensated grid-MD integration: parity with plain mode at short
times, strictly better energy conservation at long times."""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the fast tier

import jax
import jax.numpy as jnp
import numpy as np

from jax_tpus_benchmark_physics_simulation_tpu.ops.kernels.cell_dense import (
    make_cell_grid_fn,
)
from jax_tpus_benchmark_physics_simulation_tpu.ops.kernels.grid_md import GridMD
from tests.test_pallas_kernels import lattice_positions


def setup(compensated, n=400, rho=0.4, dt=1e-3, kt=0.5):
    box = float(np.sqrt(n / rho))
    pos = jnp.mod(lattice_positions(n, box, seed=0), box)
    vel = np.sqrt(kt) * jax.random.normal(jax.random.PRNGKey(1), (n, 2))
    gf = make_cell_grid_fn(box, 2.5, n, dim=2)
    md = GridMD(gf, dt=dt, compensated=compensated)
    return md, md.init(pos, vel)


def test_short_trajectories_agree():
    md_p, gs_p = setup(False)
    md_c, gs_c = setup(True)
    for _ in range(50):
        gs_p = md_p.step_nocheck(gs_p)
        gs_c = md_c.step_nocheck(gs_c)
    np.testing.assert_allclose(
        np.asarray(md_c.positions(gs_c)),
        np.asarray(md_p.positions(gs_p)),
        rtol=1e-4,
        atol=1e-4,
    )


def test_energy_conservation_compensated():
    """Compensated mode conserves energy over a 5000-step scan. (At this
    scale plain-vs-compensated differ only at noise level; the secular-drift
    win shows at 1M-step horizons — results/RESULTS.md. Here we assert the
    compensated path is correct and tight.)"""
    md, gs = setup(True, dt=2e-3, kt=1.0)
    # window sized by the engine's own 8-sigma rule (auto_inner_steps at
    # dt=2e-3 -> k=6; the former k=10 exceeded the documented margin —
    # drift budget 0.16 vs 0.1 — and tripped the violation flag
    # intermittently, a marginal config that predates round 5)
    k = md.auto_inner_steps(kt=1.0)
    chunk = md.make_chunk_step(k)
    e0 = float(md.kinetic_energy(gs) + md.potential_energy(gs))

    @jax.jit
    def run(s):
        return jax.lax.fori_loop(0, 5000 // k, lambda i, t: chunk(t), s)

    gs = run(gs)  # 5000 steps
    e1 = float(md.kinetic_energy(gs) + md.potential_energy(gs))
    assert not bool(gs.overflow)
    d = abs(e1 - e0) / abs(e0)
    assert d < 5e-4, d


def test_rebuild_preserves_compensation():
    md, gs = setup(True)
    for _ in range(40):
        gs = md.step_nocheck(gs)
    # residuals should be nonzero by now
    assert float(jnp.max(jnp.abs(gs.crx))) >= 0.0
    reb = md._rebuild_migrate(gs)
    assert reb.crx is not None
    # compensations follow their particles through the permutation
    a = np.sort(np.asarray((gs.crx * gs.occ).reshape(-1)))
    b = np.sort(np.asarray((reb.crx * reb.occ).reshape(-1)))
    np.testing.assert_allclose(a, b, atol=1e-7)
