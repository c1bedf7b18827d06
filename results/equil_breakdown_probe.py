"""Equilibrated-state breakdown: where does the hot 0.467 ms/step go?

The gate probe's equilibrated number (214M psps at N=100k, 0.40/k=4) is
~2x slower than the sum of the known parts (window 0.139 ms/step + a
rebuild every ~32 steps at 1.44 ms). This probe measures, on the SAME
equilibrated kT~1 state:

  1. window-only ms/step (no rebuild cond in the loop)
  2. rebuild-only ms (hot state)
  3. the ACTUAL rebuild cadence (counter carried through the chunk loop)
  4. the full production chunk ms/step (replicates the gate probe row)

Run: python results/equil_breakdown_probe.py [N ...]
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


def timed(fn, state, reps=3):
    out = fn(state)
    # hard scalar sync on one leaf: block_until_ready alone can return early
    # over the axon tunnel (CLAUDE.md), which would leave the warm call's
    # tail inside rep 1's timed segment — the async-dispatch 2x artifact class
    _ = float(jnp.sum(out[0].xg if hasattr(out[0], "xg") else out[0]))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(state)
        _ = float(jnp.sum(out[0].xg if hasattr(out[0], "xg") else out[0]))
        best = min(best, time.perf_counter() - t0)
    return max(best - LAT, 1e-9), out


def probe(N):
    rho, cutoff, kt = 0.8, 2.5, 1.0
    box = float(np.sqrt(N / rho))
    gf = make_cell_grid_fn(box, cutoff, N, dim=2, rho=rho)
    md = GridMD(gf, dt=1e-3, compensated=True)
    pos, vel = lattice(N, box, jax.random.PRNGKey(0), kt=kt)
    s0 = md.init(pos, vel)
    k, gate = md.auto_chunk_params(kt)
    print(f"\n== N={N:,}: skin={md.skin:.3f} auto=(k={k}, gate={gate}) ==")

    chunk = md.make_chunk_step(k, gate)

    @jax.jit
    def equil(s):
        s = jax.lax.fori_loop(0, 800 // k, lambda i, t: chunk(t), s)
        return s, md.kinetic_energy(s)

    s_hot, ke = equil(s0)
    _ = float(ke)
    s_hot, ke = equil(s_hot)
    print(f"equilibrated: kT ~ {float(ke) / N:.3f}")
    s_hot = s_hot.replace(overflow=jnp.zeros((), bool))

    NW = max(1, 400 // k)

    # 1. window-only (same windows as production, rebuild cond removed)
    window = md._make_window(md.force_kernel, k)

    @jax.jit
    def run_window(s):
        s = jax.lax.fori_loop(0, NW, lambda i, t: window(t), s)
        return s, md.kinetic_energy(s)

    t, _ = timed(run_window, s_hot)
    print(f"window-only      : {t / (NW * k) * 1e3:7.4f} ms/step")

    # 2. rebuild-only, hot state, chained
    NR = 30

    @jax.jit
    def run_rebuild(s):
        s = jax.lax.fori_loop(
            0, NR, lambda i, t: md._rebuild_migrate(t.replace(time=t.time + 1e-6)), s
        )
        return s, s.time

    t, _ = timed(run_rebuild, s_hot)
    t_rb = t / NR
    print(f"rebuild (hot)    : {t_rb * 1e3:7.4f} ms each")

    # 3. actual cadence: chunk loop with a rebuild counter
    def counted_chunk(carry):
        s, cnt = carry
        need = md._needs_rebuild(s, frac=gate)
        s = jax.lax.cond(need, md._rebuild_migrate, lambda x: x, s)
        return window(s), cnt + need.astype(jnp.int32)

    @jax.jit
    def run_counted(s):
        s, cnt = jax.lax.fori_loop(
            0, NW, lambda i, c: counted_chunk(c), (s, jnp.zeros((), jnp.int32))
        )
        return s, cnt

    s1, cnt = run_counted(s_hot)
    n_rb = int(cnt)
    s1, cnt2 = run_counted(s1)
    n_rb2 = int(cnt2)
    print(
        f"rebuild cadence  : {n_rb}/{NW} chunks (1 per {NW * k / max(n_rb, 1):.1f} "
        f"steps); next 400: {n_rb2}/{NW} (1 per {NW * k / max(n_rb2, 1):.1f})"
    )

    # 4. production chunk loop (the gate-probe row)
    @jax.jit
    def run_chunk(s):
        s = jax.lax.fori_loop(0, NW, lambda i, t: chunk(t), s)
        return s, md.kinetic_energy(s)

    t, out = timed(run_chunk, s_hot)
    t_step = t / (NW * k)
    print(
        f"production chunk : {t_step * 1e3:7.4f} ms/step -> "
        f"{N / t_step / 1e6:.1f}M psps   (overflow={bool(out[0].overflow)})"
    )
    amort = n_rb2 * t_rb / (NW * k)
    print(
        f"accounting       : window + cadence*rebuild = "
        f"{(t / (NW * k) - amort) * 1e3:.4f} residual-window + {amort * 1e3:.4f} "
        f"rebuild ms/step"
    )


for N in [int(a) for a in sys.argv[1:]] or (100_000,):
    probe(N)
