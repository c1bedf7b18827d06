"""N=1M falloff diagnosis (round-2 VERDICT next item 2).

At N=100k the 2D engine runs 0.359 ms/step (278M psps); at N=1M it is
9.54 ms/step (105M psps) — 2.6x off pace per particle. This probe times each
piece separately on the real chip, at N=1M and (control) N=100k:

  kernel   — one bare Pallas force call in a fused dependency loop
  window   — the branch-free n_inner-step leapfrog window per step
  rebuild  — one forced _rebuild_migrate (the migration scatter)
  chunk    — the production gated chunk per step (auto params)

Run: python results/n1m_breakdown_probe.py [N ...]
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
print(f"null-dispatch latency: {LAT * 1e3:.2f} ms (subtracted from every timing)")


def timeit(fn, *args, reps=3, inner=1):
    c = jax.jit(fn)
    out = c(*args)
    jax.block_until_ready(out)
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = c(*args)
        _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    return max(best - LAT, 1e-9) / inner


def probe(N):
    rho, cutoff, kt = 0.8, 2.5, 1.0
    box = float(np.sqrt(N / rho))
    gf = make_cell_grid_fn(box, cutoff, N, dim=2, rho=rho)
    md = GridMD(gf, dt=1e-3, compensated=True)
    pos, vel = lattice(N, box, jax.random.PRNGKey(1), kt=kt)
    s = md.init(pos, vel)
    n_inner, gate = md.auto_chunk_params(kt=kt)
    print(f"\n== N={N:,}: cps={gf.cells_per_side} cap={md.cap} R={md.rows_per_block} "
          f"lanes={md.lanes} blocks={md.n_blocks} slots={md.size:,} "
          f"auto (n_inner={n_inner}, gate={gate}) ==")

    # 1. bare kernel, fused dependency chain
    K = 100
    kern = md.force_kernel

    def kloop(xg, yg):
        def body(i, c):
            xg, yg = c
            fx, fy = kern(xg, yg)
            return (xg + 1e-30 * fx, yg + 1e-30 * fy)

        return jax.lax.fori_loop(0, K, body, (xg, yg))[1]

    t_k = timeit(kloop, s.xg, s.yg, inner=K)
    print(f"kernel : {t_k * 1e3:7.3f} ms/call")

    # 2. window per step (no rebuild)
    W = 50
    window = md._make_window(md.force_kernel, W)
    t_w = timeit(window, s, inner=W)
    print(f"window : {t_w * 1e3:7.3f} ms/step (over {W} fused steps)")

    # 3. forced migration rebuilds, chained so latency amortizes
    R = 30

    def rloop(st):
        def body(i, st):
            return md._rebuild_migrate(st)

        return jax.lax.fori_loop(0, R, body, st)

    t_r = timeit(rloop, s, inner=R)
    print(f"rebuild: {t_r * 1e3:7.3f} ms/rebuild ({R} chained)")

    # 4. production chunks at auto params (includes the gate + cond rebuild);
    #    long enough that the steady-state rebuild cadence is represented
    chunk = md.make_chunk_step(n_inner, gate)
    NC = max(1, 400 // n_inner)

    def chunkloop(st):
        def body(i, st):
            return chunk(st)

        return jax.lax.fori_loop(0, NC, body, st)

    t_c = timeit(chunkloop, s, inner=NC * n_inner)
    print(f"chunk  : {t_c * 1e3:7.3f} ms/step ({NC} chunks x {n_inner}) "
          f"-> {N / t_c / 1e6:.1f}M psps")
    print(f"rebuild share (chunk - window): {(t_c - t_w) * 1e3:7.3f} ms/step")


for N in [int(a) for a in sys.argv[1:]] or (100_000, 1_000_000):
    probe(N)
