"""Why does the production chunk cost more than window + cadence x rebuild?

occupancy_census_probe measured (2D N=100k, k=4): window 0.174 ms/step,
cond(never) tax ~0, production 0.219 ms/step — the +0.045/step gap implies
~1.6 ms per TAKEN rebuild vs 0.33 ms for a standalone chained-rebuild loop.
This probe pins the mechanism:

  R1: fori(rebuild)                        — standalone hot rebuild
  R2: fori(cond(True, rebuild, id))        — rebuild inside a taken cond
  R3: fori(window_k + cond(True, rebuild)) — rebuild after real windows
  C:  production chunk with EXACT taken-rebuild count carried

Run: PYTHONPATH=/root/repo:/root/.axon_site python results/cond_rebuild_probe.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from jax_tpus_benchmark_physics_simulation_tpu.ops.kernels.cell_dense import (
    make_cell_grid_fn,
)
from jax_tpus_benchmark_physics_simulation_tpu.ops.kernels.grid_md import GridMD
from jax_tpus_benchmark_physics_simulation_tpu.ops.kernels.grid_md3 import GridMD3

_null = jax.jit(lambda x: x + 1.0)
_ = float(_null(jnp.zeros(())))
LAT = float("inf")
for _ in range(5):
    _t0 = time.perf_counter()
    _ = float(_null(jnp.zeros(())))
    LAT = min(LAT, time.perf_counter() - _t0)
print(f"null-dispatch latency: {LAT * 1e3:.2f} ms (subtracted)")


def lattice(n, box, key, dim=3, kt=1.0):
    per = int(np.ceil(n ** (1.0 / dim)))
    sp = box / per
    g = jnp.arange(per, dtype=jnp.float32) * sp + 0.5 * sp
    mesh = jnp.stack(jnp.meshgrid(*([g] * dim), indexing="ij"), -1).reshape(-1, dim)[:n]
    pos = jnp.mod(mesh + 0.05 * jax.random.normal(key, mesh.shape), box)
    vel = np.sqrt(kt) * jax.random.normal(jax.random.fold_in(key, 1), (n, dim))
    return pos, vel


def timeit(run, s, sync, reps=3):
    out = run(s)
    _ = float(sync(out))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(s)
        _ = float(sync(out))
        best = min(best, time.perf_counter() - t0)
    return max(best - LAT, 1e-9)


def probe(dim):
    N, rho, cutoff, kt = 100_000, 0.8, 2.5, 1.0
    box = float(N / rho) ** (1.0 / dim) if dim == 3 else float(np.sqrt(N / rho))
    box = float(box)
    gf = make_cell_grid_fn(box, cutoff, N, dim=dim, rho=rho)
    md = (GridMD3 if dim == 3 else GridMD)(gf, dt=1e-3, compensated=True)
    pos, vel = lattice(N, box, jax.random.PRNGKey(0), dim=dim, kt=kt)
    s = md.init(pos, vel)
    k, gate = md.auto_chunk_params(kt)
    chunk = md.make_chunk_step(k, gate)

    @jax.jit
    def burst(s):
        s = jax.lax.fori_loop(0, 400 // k, lambda i, t: chunk(t), s)
        return s, md.kinetic_energy(s)

    dof = 1.5 if dim == 3 else 1.0
    for r in range(6):
        for _ in range(2):
            s, ke = burst(s)
        kt_now = float(ke) / (dof * N)
        scale = np.sqrt(kt / kt_now)
        comp = (
            dict(cvx=jnp.zeros_like(s.cvx), cvy=jnp.zeros_like(s.cvy))
            if dim == 2 and s.cvx is not None
            else dict(cvx=jnp.zeros_like(s.cvx), cvy=jnp.zeros_like(s.cvy),
                      cvz=jnp.zeros_like(s.cvz))
            if s.cvx is not None
            else {}
        )
        if dim == 3:
            s = s.replace(vxg=s.vxg * scale, vyg=s.vyg * scale,
                          vzg=s.vzg * scale, **comp)
        else:
            s = s.replace(vxg=s.vxg * scale, vyg=s.vyg * scale, **comp)
    s, ke = burst(s)
    print(f"\n=== {dim}D N=100k: kT {float(ke) / (dof * N):.3f} "
          f"overflow={bool(s.overflow)} k={k} gate={gate} ===")

    NR = 20
    rb = md._rebuild_migrate

    @jax.jit
    def r1(s):
        s = jax.lax.fori_loop(
            0, NR, lambda i, t: rb(t.replace(time=t.time + 1e-6)), s
        )
        return s

    @jax.jit
    def r2(s):
        def body(i, t):
            return jax.lax.cond(
                t.time > -1.0, rb, lambda u: u, t.replace(time=t.time + 1e-6)
            )

        return jax.lax.fori_loop(0, NR, body, s)

    sync = lambda out: jnp.sum(out.xg)
    t1 = timeit(r1, s, sync) / NR
    t2 = timeit(r2, s, sync) / NR
    print(f"R1 fori(rebuild)           : {t1 * 1e3:7.4f} ms/rebuild")
    print(f"R2 fori(cond(T, rebuild))  : {t2 * 1e3:7.4f} ms/rebuild "
          f"({(t2 - t1) * 1e3:+.4f})")

    # R3: window then forced rebuild, vs window alone — the production shape
    window = md._make_window(md.force_kernel, k)
    NW = 40 // k

    @jax.jit
    def w_only(s):
        def body(i, t):
            return window(t)

        s = jax.lax.fori_loop(0, NW, body, s)
        return s

    @jax.jit
    def w_rb(s):
        def body(i, t):
            t = jax.lax.cond(t.time > -1.0, rb, lambda u: u, t)
            return window(t)

        s = jax.lax.fori_loop(0, NW, body, s)
        return s

    tw = timeit(w_only, s, sync) / NW
    twr = timeit(w_rb, s, sync) / NW
    print(f"R3 window-only             : {tw * 1e3:7.4f} ms/chunk(k={k})")
    print(f"R3 window+forced rebuild   : {twr * 1e3:7.4f} ms/chunk -> "
          f"in-situ rebuild {(twr - tw) * 1e3:7.4f} ms")

    # C: production with EXACT taken count
    NC = 400 // k

    def counted(c):
        s, cnt = c
        need = md._needs_rebuild(s, frac=gate)
        s = jax.lax.cond(need, rb, lambda x: x, s)
        return window(s), cnt + need.astype(jnp.int32)

    @jax.jit
    def run_c(s):
        s, cnt = jax.lax.fori_loop(
            0, NC, lambda i, c: counted(c), (s, jnp.zeros((), jnp.int32))
        )
        return s, cnt

    out = run_c(s)
    _ = float(jnp.sum(out[0].xg))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = run_c(s)
        _ = float(jnp.sum(out[0].xg))
        best = min(best, time.perf_counter() - t0)
    tc = (max(best - LAT, 1e-9)) / NC
    n_rb = int(out[1])
    print(f"C production (counted)     : {tc * 1e3:7.4f} ms/chunk, "
          f"{n_rb}/{NC} rebuilds taken")
    print(f"  accounting: window {tw * 1e3:.4f} + {n_rb}/{NC} x in-situ "
          f"{(twr - tw) * 1e3:.4f} = "
          f"{(tw + n_rb / NC * (twr - tw)) * 1e3:.4f} ms/chunk")


probe(2)
probe(3)
