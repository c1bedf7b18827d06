"""3D cell-geometry A/B: cps17 (skin 0.4, current) vs cps19 (skin 0.12).

Round-4 occupancy census (results/occupancy_census_probe.py) measured the
equilibrated per-cell occupancy at N=100k, rho=0.8:

    cps17 cubic (current)  mean 20.35  max(t) 29  -> dynamic bound 32
    cps19 cubic            mean 14.58  max(t) 22  -> dynamic bound 24

The force kernel's pair work is ~ ncx * 14 * bound_a * bound_b * lanes
(validated: 17*14*32^2*384 = 93.6M = the measured pair-tests/call of the
roofline probe), so cps19 cuts pair math to 0.63x at (8,8) chunks — but its
skin drops to box/19 - 2.5 = 0.132, raising rebuild cadence ~3.4x. This
probe measures the real tradeoff end to end on an equilibrated kT=1 state:
window-only, hot rebuild, cadence, and production throughput, per geometry
and per (a_chunk, b_chunk) in {(8,16), (8,8)} (b=16 rounds the 22-occupancy
partner axis up to 32; b=8 covers 24 at more loop overhead).

Also A/Bs the chunk driver vs the round-4 cond-free nested-while driver
(GridMD3.make_production_run) on the winner.

Run: PYTHONPATH=/root/repo:/root/.axon_site python results/geom3_probe.py [N]
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


def timed(fn, state, reps=3):
    out = fn(state)
    _ = float(jnp.sum(out[1]))  # hard scalar sync (block_until_ready lies)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(state)
        _ = float(jnp.sum(out[1]))
        best = min(best, time.perf_counter() - t0)
    return max(best - LAT, 1e-9), out


def probe(N, skin, chunks, label):
    rho, cutoff, kt = 0.8, 2.5, 1.0
    box = float((N / rho) ** (1.0 / 3.0))
    gf = make_cell_grid_fn(box, cutoff, N, dim=3, rho=rho, skin=skin)
    a_chunk, b_chunk = chunks
    if gf.capacity % b_chunk != 0:
        b_chunk = gf.capacity
    md = GridMD3(gf, dt=1e-3, compensated=True, a_chunk=a_chunk, b_chunk=b_chunk)
    pos, vel = lattice(N, box, jax.random.PRNGKey(0), kt=kt)
    k, gate = md.auto_chunk_params(kt)
    print(
        f"\n== {label}: cps={md.cps} cap={md.cap} skin={md.skin:.3f} "
        f"chunks=({a_chunk},{b_chunk}) auto=(k={k}, gate={gate}) =="
    )

    chunk = md.make_chunk_step(k, gate)

    @jax.jit
    def equil(s):
        s = jax.lax.fori_loop(0, max(1, 800 // k), lambda i, t: chunk(t), s)
        return s, md.kinetic_energy(s)

    s_hot = md.init(pos, vel)
    for _ in range(4):
        s_hot, ke = equil(s_hot)
        kt_now = float(ke) / (1.5 * N)
        scale = np.sqrt(kt / kt_now)
        zeros = jnp.zeros_like(s_hot.vxg)
        comp = dict(cvx=zeros, cvy=zeros, cvz=zeros) if s_hot.cvx is not None else {}
        s_hot = s_hot.replace(
            vxg=s_hot.vxg * scale, vyg=s_hot.vyg * scale, vzg=s_hot.vzg * scale, **comp
        )
    s_hot, ke = equil(s_hot)
    print(
        f"equilibrated: kT ~ {float(ke) / (1.5 * N):.3f}, "
        f"max_occ = {int(s_hot.max_occ)}  overflow={bool(s_hot.overflow)}"
    )
    s_hot = s_hot.replace(overflow=jnp.zeros((), bool))

    NW = max(1, 400 // k)
    window = md._make_window(md.force_kernel, k)

    @jax.jit
    def run_window(s):
        s = jax.lax.fori_loop(0, NW, lambda i, t: window(t), s)
        return s, md.kinetic_energy(s)

    t, _ = timed(run_window, s_hot)
    print(f"window-only            : {t / (NW * k) * 1e3:7.4f} ms/step")

    NR = 20

    @jax.jit
    def run_rebuild(s):
        s = jax.lax.fori_loop(
            0, NR, lambda i, t: md._rebuild_migrate(t.replace(time=t.time + 1e-6)), s
        )
        return s, s.time

    t, _ = timed(run_rebuild, s_hot)
    t_rb = t / NR
    print(f"rebuild (hot)          : {t_rb * 1e3:7.4f} ms each")

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
    s1, cnt2 = run_counted(s1)
    n_rb = int(cnt2)
    print(
        f"rebuild cadence        : {n_rb}/{NW} chunks "
        f"(1 per {NW * k / max(n_rb, 1):.1f} steps)"
    )

    @jax.jit
    def run_chunk(s):
        s = jax.lax.fori_loop(0, NW, lambda i, t: chunk(t), s)
        return s, md.kinetic_energy(s)

    t, out = timed(run_chunk, s_hot)
    t_step = t / (NW * k)
    print(
        f"production (chunk/cond): {t_step * 1e3:7.4f} ms/step -> "
        f"{N / t_step / 1e6:6.1f}M psps   (overflow={bool(out[0].overflow)})"
    )

    prod = md.make_production_run(NW * k, k, gate_frac=gate)

    @jax.jit
    def run_prod(s):
        s = prod(s)
        return s, md.kinetic_energy(s)

    t, out = timed(run_prod, s_hot)
    t_step = t / (NW * k)
    print(
        f"production (cond-free) : {t_step * 1e3:7.4f} ms/step -> "
        f"{N / t_step / 1e6:6.1f}M psps   (overflow={bool(out[0].overflow)})"
    )
    return s_hot


N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
probe(N, 0.4, (8, 16), "cps17 b16 (current)")
probe(N, 0.12, (8, 16), "cps19 b16")
probe(N, 0.12, (8, 8), "cps19 b8")
