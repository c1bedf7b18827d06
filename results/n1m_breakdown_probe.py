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
    return best / inner


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

    # 3. one forced migration rebuild
    t_r = timeit(md._rebuild_migrate, s)
    print(f"rebuild: {t_r * 1e3:7.3f} ms/rebuild "
          f"(amortized {t_r / n_inner * 1e3:.3f} ms/step at the auto cadence)")

    # 4. production chunk at auto params (includes the gate + cond rebuild)
    chunk = md.make_chunk_step(n_inner, gate)

    def chunk4(st):
        def body(i, st):
            return chunk(st)

        return jax.lax.fori_loop(0, 4, body, st)

    t_c = timeit(chunk4, s, inner=4 * n_inner)
    print(f"chunk  : {t_c * 1e3:7.3f} ms/step (4 chunks x {n_inner}) "
          f"-> {N / t_c / 1e6:.1f}M psps")
    print(f"residual (chunk - window - rebuild/n_inner): "
          f"{(t_c - t_w - t_r / n_inner) * 1e3:7.3f} ms/step")


for N in [int(a) for a in sys.argv[1:]] or (100_000, 1_000_000):
    probe(N)
