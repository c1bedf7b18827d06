"""3D engine timing breakdown (round-3): kernel / window / rebuild / chunk.

The bare b-chunk kernel measures 1.357 ms/call at N=100k (max_occ 27) but the
CLI production loop runs 2.27 ms/step — this probe splits the difference the
same way n1m_breakdown_probe.py does for 2D, from BOTH a fresh lattice
(max_occ low) and a melted state (after an equilibration burst, the state the
CLI production loop actually sees).

Run: python results/md3_breakdown_probe.py [N ...]
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


def breakdown(md, s, label, n_inner, gate, N):
    mo = int(s.max_occ)
    print(f"-- {label}: max_occ={mo} --")

    K = 100
    kern = md.force_kernel

    def kloop(xg, yg, zg, mo):
        def body(i, c):
            xg, yg, zg = c
            fx, fy, fz = kern(xg, yg, zg, mo)
            return (xg + 1e-30 * fx, yg + 1e-30 * fy, zg + 1e-30 * fz)

        return jax.lax.fori_loop(0, K, body, (xg, yg, zg))[1]

    t_k = timeit(kloop, s.xg, s.yg, s.zg, s.max_occ, inner=K)
    print(f"kernel : {t_k * 1e3:7.3f} ms/call")

    W = 50
    window = md._make_window(md.force_kernel, W)
    t_w = timeit(window, s, inner=W)
    print(f"window : {t_w * 1e3:7.3f} ms/step (over {W} fused steps)")

    RB = 20  # chained so the 25-40 ms (and variable) dispatch latency amortizes

    def rloop(st):
        def body(i, st):
            return md._rebuild_migrate(st)

        return jax.lax.fori_loop(0, RB, body, st)

    t_r = timeit(rloop, s, inner=RB)
    print(f"rebuild: {t_r * 1e3:7.3f} ms/rebuild (chained x{RB}; "
          f"amortized {t_r / n_inner * 1e3:.3f} ms/step at the auto cadence)")

    chunk = md.make_chunk_step(n_inner, gate)
    NC = 40  # enough chained chunks that the variable tunnel latency is noise

    def chunkloop(st):
        def body(i, st):
            return chunk(st)

        return jax.lax.fori_loop(0, NC, body, st)

    t_c = timeit(chunkloop, s, inner=NC * n_inner)
    print(f"chunk  : {t_c * 1e3:7.3f} ms/step ({NC} chunks x {n_inner}) "
          f"-> {N / t_c / 1e6:.1f}M psps")
    share = t_c - t_w  # rebuild fires on the gate, not every chunk
    if share > 1e-6:
        print(f"rebuild share: {share * 1e3:7.3f} ms/step "
              f"-> one rebuild every ~{t_r / share:.0f} steps")


def probe(N):
    rho, cutoff, kt = 0.8, 2.5, 1.0
    box = float((N / rho) ** (1.0 / 3.0))
    gf = make_cell_grid_fn(box, cutoff, N, dim=3, rho=rho)
    md = GridMD3(gf, dt=1e-3, compensated=True)
    pos, vel = lattice(N, box, jax.random.PRNGKey(1), kt=kt)
    s = md.init(pos, vel)
    n_inner, gate = md.auto_chunk_params(kt=kt)
    print(f"\n== N={N:,}: cps={md.cps} cap={md.cap} lanes={md.lanes} "
          f"auto (n_inner={n_inner}, gate={gate}) ==")

    breakdown(md, s, "fresh lattice", n_inner, gate, N)

    # melt: 2000 production chunks' worth of steps, then rebuild
    chunk = md.make_chunk_step(n_inner, gate)

    def melt(st):
        def body(i, st):
            return chunk(st)

        return jax.lax.fori_loop(0, 2000 // n_inner, body, st)

    s2 = jax.jit(melt)(s)
    jax.block_until_ready(s2.xg)
    s2 = jax.jit(md._rebuild_migrate)(s2)
    print(f"after melt: violations={int(s2.overflow)}")
    breakdown(md, s2, "melted (2000 steps)", n_inner, gate, N)


for N in [int(a) for a in sys.argv[1:]] or (100_000,):
    probe(N)
