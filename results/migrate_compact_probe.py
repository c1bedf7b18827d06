"""A/B the compacted-mover 3D migrate kernel against the flat parity oracle
on an equilibrated state: full-rebuild time with ``migrate_compact`` on/off
(the only delta between the two engines), at the default cps and optionally
the cps19+(8,8) geometry from results/geom3_probe.py.

The compact build cuts candidate-row work per x-row from ``27 * r8(mo)``
full-height columns to ``r8(row_occ) + 26 * r8(row_movers)`` at ``r8(nmo)``
target height (migrate_pallas3 module docstring). Movers per cell between
rebuilds are few (~1-3 of ~12-28 occupants at gate 0.40 — the round-4
occupancy census), so the 26 mover directions collapse from ~4 chunks to 1.

Run: PYTHONPATH=/root/repo:/root/.axon_site python results/migrate_compact_probe.py [N] [skin]
(skin 0.4 -> cps17 at N=100k; 0.12 -> cps19, the geom3_probe alternative)
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

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
SKIN = float(sys.argv[2]) if len(sys.argv) > 2 else 0.4
rho, cutoff, kt = 0.8, 2.5, 1.0
box = float((N / rho) ** (1.0 / 3.0))
gf = make_cell_grid_fn(box, cutoff, N, dim=3, rho=rho, skin=SKIN)

REPS = 30


def rebuild_ms(md, s):
    @jax.jit
    def full_rebuild(st):
        def body(i, t):
            return md._rebuild_migrate(t.replace(time=t.time + 1e-6))

        return jax.lax.fori_loop(0, REPS, body, st)  # full state out: no DCE

    out = full_rebuild(s)
    _ = float(jnp.sum(out.xg))  # hard scalar sync (tunnel-safe)
    assert not bool(out.overflow), "rebuild raised overflow (k_mov too small?)"
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = full_rebuild(s)
        _ = float(jnp.sum(out.xg))
        best = min(best, time.perf_counter() - t0)
    return max(best - LAT, 1e-9) / REPS * 1e3


results = {}
for compact in (False, True):
    md = GridMD3(gf, dt=1e-3, compensated=True, migrate_compact=compact)
    pos, vel = lattice(N, box, jax.random.PRNGKey(0), kt=kt)
    s = md.init(pos, vel)
    k, gate = md.auto_chunk_params(kt)
    chunk = md.make_chunk_step(k, gate)

    @jax.jit
    def equil(st):
        st = jax.lax.fori_loop(0, 800 // k, lambda i, t: chunk(t), st)
        return st, md.kinetic_energy(st)

    for _ in range(3):
        s, ke = equil(s)
        _ = float(ke)
    s = s.replace(overflow=jnp.zeros((), bool))
    label = "compact" if compact else "flat   "
    ms = rebuild_ms(md, s)
    results[compact] = ms
    print(
        f"{label} rebuild (cps={md.cps}, cap={md.cap}, "
        f"max_occ={int(s.max_occ)}): {ms:7.4f} ms"
    )

print(
    f"cps={gf.cells_per_side}: flat {results[False]:.3f} ms -> "
    f"compact {results[True]:.3f} ms ({results[False] / results[True]:.2f}x)"
)
