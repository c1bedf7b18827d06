"""Steady-state rebuild-gate tuning for the 3D grid engine.

3D twin of gate_tuning_probe.py: the migrate_pallas3 rebuild (11.2 ->
5.6 ms at N=100k) moves the gate/window optimum, and the 3D auto rule
(0.45 preferred at N>=50k) was tuned in round 2 against flat measurements
made with the then-monolithic kernel. Measures the production chunk
ms/step on an EQUILIBRATED kT=1 state for a grid of (gate, k) candidates.

Run: PYTHONPATH=/root/repo:/root/.axon_site python results/gate_tuning_probe3.py [N ...]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from jax_tpus_benchmark_physics_simulation_tpu.ops.kernels.cell_dense import (
    make_cell_grid_fn,
)
from jax_tpus_benchmark_physics_simulation_tpu.ops.kernels.grid_md3 import GridMD3


def lattice(n, box, key, kt=1.0):
    per = int(np.ceil(n ** (1.0 / 3.0)))
    sp = box / per
    g = jnp.arange(per, dtype=jnp.float32) * sp + 0.5 * sp
    mesh = jnp.stack(jnp.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)[:n]
    pos = jnp.mod(mesh + 0.05 * jax.random.normal(key, mesh.shape), box)
    vel = np.sqrt(kt) * jax.random.normal(jax.random.fold_in(key, 1), (n, 3))
    return pos, vel


_null = jax.jit(lambda x: x + 1.0)
_ = float(_null(jnp.zeros(())))
LAT = float("inf")
for _ in range(5):
    _t0 = time.perf_counter()
    _ = float(_null(jnp.zeros(())))
    LAT = min(LAT, time.perf_counter() - _t0)
print(f"null-dispatch latency: {LAT * 1e3:.2f} ms (subtracted)")


def probe(N):
    rho, cutoff, kt = 0.8, 2.5, 1.0
    box = float((N / rho) ** (1.0 / 3.0))
    gf = make_cell_grid_fn(box, cutoff, N, dim=3, rho=rho)
    md = GridMD3(gf, dt=1e-3, compensated=True)
    pos, vel = lattice(N, box, jax.random.PRNGKey(0), kt=kt)
    s0 = md.init(pos, vel)
    print(f"\n== N={N:,}: skin={md.skin:.3f} auto={md.auto_chunk_params(kt)} ==")

    k0, g0 = md.auto_chunk_params(kt)
    chunk0 = md.make_chunk_step(k0, g0)

    @jax.jit
    def equil(s):
        s = jax.lax.fori_loop(0, 800 // k0, lambda i, t: chunk0(t), s)
        return s, md.kinetic_energy(s)

    # 3D lattice melt releases enough PE to heat kT ~1.0 -> ~1.6; rescale
    # velocities to the target between equilibration bursts (lj_fluid's
    # rescaling equilibration) so candidates run at the honest kT=1 state.
    s_hot = s0
    for _ in range(4):
        s_hot, ke = equil(s_hot)
        kt_now = float(ke) / (1.5 * N)
        scale = np.sqrt(kt / kt_now)
        zeros = jnp.zeros_like(s_hot.vxg)
        comp = (
            dict(cvx=zeros, cvy=zeros, cvz=zeros)
            if s_hot.cvx is not None
            else {}
        )
        s_hot = s_hot.replace(
            vxg=s_hot.vxg * scale, vyg=s_hot.vyg * scale,
            vzg=s_hot.vzg * scale, **comp,
        )
    s_hot, ke = equil(s_hot)
    print(f"equilibrated: kT ~ {float(ke) / (1.5 * N):.3f}")
    s_hot = s_hot.replace(overflow=jnp.zeros((), bool))

    vmax = 8.0 * kt**0.5
    cands = []
    for gate in (0.45, 0.40, 0.35, 0.30, 0.25):
        kmax = int(((0.5 - gate) * md.skin) / (vmax * md.dt))
        for k in {1, 2, max(1, kmax // 2), kmax}:
            if 1 <= k <= kmax:
                cands.append((gate, k))
    cands = sorted(set(cands))

    for gate, k in cands:
        chunk = md.make_chunk_step(k, gate)
        NC = max(1, 400 // k)

        @jax.jit
        def run(s):
            s = jax.lax.fori_loop(0, NC, lambda i, t: chunk(t), s)
            return s, md.kinetic_energy(s)

        s1, ke = run(s_hot)
        _ = float(ke)  # compile + warm
        best = float("inf")
        for _ in range(3):
            s1, ke = run(s1)
            _ = float(ke)  # drain the async queue BEFORE t0 (see 2D probe)
            t0 = time.perf_counter()
            s1, ke = run(s1)
            _ = float(ke)
            best = min(best, time.perf_counter() - t0)
        t_step = max(best - LAT, 1e-9) / (NC * k)
        viol = bool(s1.overflow)
        print(
            f"gate={gate:.2f} k={k:2d}: {t_step * 1e3:7.3f} ms/step "
            f"-> {N / t_step / 1e6:6.1f}M psps"
            + ("  **VIOLATION**" if viol else "")
        )


for N in [int(a) for a in sys.argv[1:]] or (100_000,):
    probe(N)
