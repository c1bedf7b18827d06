"""Steady-state rebuild-gate tuning after the migrate-kernel rebuild.

The auto gate (0.45 at N>=50k) was tuned in round 2 when a rebuild cost
~4.5 ms at N=100k; the Pallas migrate kernel cut that to ~1.4 ms (14.7 ms
at N=1M), which moves the gate/window optimum. This probe measures the
production chunk ms/step on an EQUILIBRATED state (bench.py-style: two
400-step pre-runs so the lattice has melted and the rebuild cadence is the
hot steady state, not the cold-lattice transient the breakdown probe sees)
for a grid of (gate, k) candidates, at N=100k and N=1M.

Run: python results/gate_tuning_probe.py [N ...]
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
from jax_tpus_benchmark_physics_simulation_tpu.ops.kernels.grid_md import GridMD


def lattice(n, box, key, kt=1.0):
    per = int(np.ceil(np.sqrt(n)))
    sp = box / per
    g = jnp.arange(per, dtype=jnp.float32) * sp + 0.5 * sp
    mesh = jnp.stack(jnp.meshgrid(g, g, indexing="ij"), -1).reshape(-1, 2)[:n]
    pos = jnp.mod(mesh + 0.05 * jax.random.normal(key, mesh.shape), box)
    vel = np.sqrt(kt) * jax.random.normal(jax.random.fold_in(key, 1), (n, 2))
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
    box = float(np.sqrt(N / rho))
    gf = make_cell_grid_fn(box, cutoff, N, dim=2, rho=rho)
    md = GridMD(gf, dt=1e-3, compensated=True)
    pos, vel = lattice(N, box, jax.random.PRNGKey(0), kt=kt)
    s0 = md.init(pos, vel)
    print(f"\n== N={N:,}: skin={md.skin:.3f} auto={md.auto_chunk_params(kt)} ==")

    # equilibrate once with the auto config; all candidates then start from
    # the same hot state
    k0, g0 = md.auto_chunk_params(kt)
    chunk0 = md.make_chunk_step(k0, g0)

    @jax.jit
    def equil(s):
        s = jax.lax.fori_loop(0, 800 // k0, lambda i, t: chunk0(t), s)
        return s, md.kinetic_energy(s)

    s_hot, ke = equil(s0)
    _ = float(ke)
    s_hot, ke = equil(s_hot)
    print(f"equilibrated: kT ~ {float(ke) / N:.3f}")
    s_hot = s_hot.replace(overflow=jnp.zeros((), bool))

    # candidates: (gate, k) pairs obeying k*8sigma*dt <= (0.5-gate)*skin
    vmax = 8.0 * kt**0.5
    cands = []
    for gate in (0.48, 0.45, 0.40, 0.35, 0.30, 0.25, 0.20):
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
            _ = float(ke)  # drain the async queue BEFORE t0: an unsynced
            # dispatch here would put TWO runs inside the timed segment
            # (exactly 2x — the round-3 "equilibrated 214M" artifact)
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


for N in [int(a) for a in sys.argv[1:]] or (100_000, 1_000_000):
    probe(N)
