"""Virial / pressure observable (grid engines, 2D + 3D + sharded).

The pair virial ``W = sum_pairs r.f`` rides the sampling-only energy kernel
(same intermediates as the force); pressure is ``P = (2 KE + W) / (d V)``.
The reference computes no pressure at all. Oracle: a direct O(N^2)
minimum-image sum in f64.
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


def _dense_virial(pos, box, cutoff, sigma=1.0, epsilon=1.0):
    """O(N^2) minimum-image pair virial in f64: sum over pairs of
    24*eps*(2(s/r)^12 - (s/r)^6) inside the cutoff."""
    r = np.asarray(pos, np.float64)
    d = r[:, None, :] - r[None, :, :]
    d -= box * np.round(d / box)
    r2 = np.sum(d * d, axis=-1)
    iu = np.triu_indices(r.shape[0], k=1)
    r2 = r2[iu]
    mask = r2 < cutoff**2
    inv = sigma**2 / r2[mask]
    s6 = inv**3
    s12 = s6 * s6
    return float(np.sum(24.0 * epsilon * (2.0 * s12 - s6)))


@pytest.mark.parametrize("dim", [2, 3])
def test_grid_virial_matches_dense_oracle(dim):
    n = 400 if dim == 2 else 1000
    rho = 0.8
    box = float((n / rho) ** (1.0 / dim))
    gf = make_cell_grid_fn(box, 2.5, n, dim=dim)
    if dim == 2:
        md = GridMD(gf, dt=1e-3)
    else:
        from jax_tpus_benchmark_physics_simulation_tpu.ops.kernels.grid_md3 import (
            GridMD3,
        )

        md = GridMD3(gf, dt=1e-3)
    pos, vel = _lattice(n, box, jax.random.PRNGKey(0), dim=dim)
    s = md.init(pos, vel)
    w_grid = float(md.virial(s))
    w_dense = _dense_virial(pos, box, 2.5)
    assert w_grid == pytest.approx(w_dense, rel=2e-4)
    # pressure consistency: P = (2 KE + W) / (d V)
    p = float(md.pressure(s))
    ke = float(md.kinetic_energy(s))
    assert p == pytest.approx((2 * ke + w_dense) / (dim * box**dim), rel=2e-4)


def test_sharded_virial_matches_single_device():
    from jax_tpus_benchmark_physics_simulation_tpu.parallel.grid_md_sharded import (
        ShardedGridMD,
    )
    from jax_tpus_benchmark_physics_simulation_tpu.parallel.mesh import make_mesh

    n_dev = jax.device_count()
    assert n_dev == 8
    n = 1752  # cps 16, divisible by 8
    gf = make_cell_grid_fn(float(np.sqrt(n / 0.8)), 2.5, n, dim=2)
    if gf.cells_per_side % n_dev:
        pytest.skip(f"cps {gf.cells_per_side} not divisible by {n_dev}")
    local = GridMD(gf, dt=1e-3)
    sharded = ShardedGridMD(gf, make_mesh(n_dev, axis_name="x"), dt=1e-3)
    pos, vel = _lattice(n, gf.box, jax.random.PRNGKey(3))
    gs = local.init(pos, vel)
    gss = sharded.prepare(sharded.init(pos, vel))
    assert float(sharded.virial(gss)) == pytest.approx(
        float(local.virial(gs)), rel=1e-5
    )
    assert float(sharded.pressure(gss)) == pytest.approx(
        float(local.pressure(gs)), rel=1e-5
    )


def test_lj_fluid_reports_pressure():
    from jax_tpus_benchmark_physics_simulation_tpu.core.config import (
        MDConfig,
        override,
    )
    from jax_tpus_benchmark_physics_simulation_tpu.models import lj_fluid

    cfg = override(
        MDConfig(),
        n=1024,
        cutoff=2.5,
        force_impl="grid",
        init="lattice",
        eq_steps=200,
        prod_steps=200,
        sample_every=100,
    )
    res = lj_fluid.run(cfg)
    assert np.isfinite(res.pressure)
    # LJ fluid at rho=0.8, kT~1: positive pressure of order a few
    assert 0.0 < res.pressure < 20.0
