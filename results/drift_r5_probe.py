"""Round-5 NVE drift re-validation on the ROUND-4/5 numerics.

The north-star acceptance bar (BASELINE.md) is <1e-4 relative total-energy
drift over 1M steps at N=100k. The last full validation (round 2: 2.64e-5)
predates the approx-reciprocal pair polynomial (~1e-7 rel err/pair,
results/vpu_oprate_probe.py), the cond-free nested-while production driver,
the 3D auto cell geometry and the static-coverage 3D kernel — CLAUDE.md's
own invariant ("don't trade Kahan away without a drift measurement")
applies to all of those. This probe measures:

  1. 2D N=100k, 1,000,000 NVE steps — the exact bench.py headline
     configuration (grid engine, compensated, auto_chunk_params,
     make_production_run driver);
  2. 3D N=100k, 300,000 NVE steps — the lj_fluid production default
     (hybrid static_cov="auto", auto geometry, cond-free driver).

Both runs use the rescaling lattice-melt equilibration (bench.py /
CLAUDE.md protocol), assert a clean violation flag throughout, and report
max |E(t) - E(0)| / |E(0)| over block samples.

Run: PYTHONPATH=/root/repo:/root/.axon_site python results/drift_r5_probe.py [steps2d] [steps3d]
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from jax_tpus_benchmark_physics_simulation_tpu.ops.kernels.cell_dense import (
    make_cell_grid_fn,
)
from jax_tpus_benchmark_physics_simulation_tpu.ops.kernels.grid_md import GridMD
from jax_tpus_benchmark_physics_simulation_tpu.ops.kernels.grid_md3 import GridMD3


def lattice(n, box, key, dim, kt=1.0):
    per = int(np.ceil(n ** (1.0 / dim)))
    sp = box / per
    g = jnp.arange(per, dtype=jnp.float32) * sp + 0.5 * sp
    mesh = jnp.stack(jnp.meshgrid(*([g] * dim), indexing="ij"), -1).reshape(-1, dim)[:n]
    pos = jnp.mod(mesh + 0.05 * jax.random.normal(key, mesh.shape), box)
    vel = np.sqrt(kt) * jax.random.normal(jax.random.fold_in(key, 1), (n, dim))
    return pos, vel


def equilibrate_rescaled(md, gs, dim, kt=1.0, bursts=4, burst_steps=800):
    """Lattice-melt equilibration with velocity rescaling (CLAUDE.md
    protocol): melt windows sized for the hot transient, velocities rescaled
    to kT between bursts, flag never cleared."""
    k_eq, gate_eq = md.auto_chunk_params(kt=4.0)
    chunk = md.make_chunk_step(k_eq, gate_frac=gate_eq)

    @jax.jit
    def burst(s):
        s = jax.lax.fori_loop(0, max(1, burst_steps // k_eq), lambda i, t: chunk(t), s)
        return s, md.kinetic_energy(s)

    dof = dim * md.n
    for _ in range(bursts):
        gs, ke = burst(gs)
        scale = float(np.sqrt(kt * dof / (2.0 * float(ke))))
        if dim == 2:
            comp = (
                dict(cvx=jnp.zeros_like(gs.cvx), cvy=jnp.zeros_like(gs.cvy))
                if gs.cvx is not None
                else {}
            )
            gs = gs.replace(vxg=gs.vxg * scale, vyg=gs.vyg * scale, **comp)
        else:
            comp = (
                dict(
                    cvx=jnp.zeros_like(gs.cvx),
                    cvy=jnp.zeros_like(gs.cvy),
                    cvz=jnp.zeros_like(gs.cvz),
                )
                if gs.cvx is not None
                else {}
            )
            gs = gs.replace(
                vxg=gs.vxg * scale, vyg=gs.vyg * scale, vzg=gs.vzg * scale, **comp
            )
    gs, ke = burst(gs)
    assert not bool(gs.overflow), "violation during equilibration"
    return gs


def drift_run(md, gs, total_steps, block, label, fixed_kt=None):
    """fixed_kt: use the fixed-cadence driver at auto_cadence(fixed_kt) —
    the shipped 3D NVE production configuration."""
    if fixed_kt is not None:
        R = md.auto_cadence(fixed_kt, total_steps)
        print(f"  [{label}] fixed cadence R={R}", flush=True)
        nblk = block - (block % R)
        prod = md.make_production_run_fixed(nblk, R)
    else:
        k, gate = md.auto_chunk_params(kt=1.0)
        nblk = block - (block % k)
        prod = md.make_production_run(nblk, k, gate_frac=gate)

    @jax.jit
    def sample(s):
        return md.kinetic_energy(s) + md.potential_energy(s)

    @jax.jit
    def run_block(s):
        s = prod(s)
        return s, md.kinetic_energy(s)

    e0 = float(sample(gs))
    n_blocks = total_steps // nblk
    worst = 0.0
    t0 = time.perf_counter()
    for i in range(n_blocks):
        gs, ke = run_block(gs)
        e = float(sample(gs))
        rel = abs(e - e0) / abs(e0)
        worst = max(worst, rel)
        if (i + 1) % max(1, n_blocks // 10) == 0:
            el = time.perf_counter() - t0
            done = (i + 1) * nblk
            print(
                f"  [{label}] {done:>9,} steps  E={e:.6e}  "
                f"drift={rel:.3e} (max {worst:.3e})  "
                f"{md.n * done / el / 1e6:6.1f}M psps  overflow={bool(gs.overflow)}",
                flush=True,
            )
    assert not bool(gs.overflow), f"violation flag tripped during {label} drift run"
    print(f"[{label}] {n_blocks * nblk:,} steps: max relative drift {worst:.3e}")
    return worst


def main():
    steps2d = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    steps3d = int(sys.argv[2]) if len(sys.argv) > 2 else 300_000
    n, rho, cutoff, dt, kt = 100_000, 0.8, 2.5, 1e-3, 1.0

    # -- 2D headline config (bench.py) --------------------------------------
    box2 = float(np.sqrt(n / rho))
    gf2 = make_cell_grid_fn(box2, cutoff, n, dim=2)
    md2 = GridMD(gf2, dt=dt, compensated=True)
    pos, vel = lattice(n, box2, jax.random.PRNGKey(0), dim=2, kt=kt)
    gs2 = equilibrate_rescaled(md2, md2.init(pos, vel), dim=2, kt=kt)
    d2 = drift_run(md2, gs2, steps2d, block=20_000, label="2D N=100k")

    # -- 3D production default (lj_fluid): hybrid static_cov ---------------
    box3 = float((n / rho) ** (1.0 / 3.0))
    cps = int(box3 / (cutoff + 0.1))
    skin3 = box3 / cps - cutoff  # auto-geometry default (lj_fluid.resolve_skin)
    gf3 = make_cell_grid_fn(box3, cutoff, n, dim=3, rho=rho, skin=skin3)
    md3 = GridMD3(gf3, dt=dt, compensated=True, static_cov="auto", migrate_k_mov=8)
    pos, vel = lattice(n, box3, jax.random.PRNGKey(0), dim=3, kt=kt)
    gs3 = equilibrate_rescaled(md3, md3.init(pos, vel), dim=3, kt=kt)
    kt3 = float(md3.kinetic_energy(gs3)) / (1.5 * n)
    d3 = drift_run(
        md3, gs3, steps3d, block=10_000, label="3D N=100k", fixed_kt=kt3
    )

    print(
        f"\nSUMMARY: 2D {steps2d:,}-step drift {d2:.3e}  |  "
        f"3D {steps3d:,}-step drift {d3:.3e}  (bar: <1e-4 per 1M steps)"
    )


if __name__ == "__main__":
    main()
