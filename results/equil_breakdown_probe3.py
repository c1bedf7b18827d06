"""3D equilibrated-state breakdown: window / rebuild / cadence / max_occ.

3D twin of equil_breakdown_probe.py. The committed 3D equilibrated number
(39.1M psps, gate_tuning_probe3) is ~2x below the melted-state breakdown
(~79M) — in 3D part of that CAN be real (equilibrium occupancy raises the
dynamic max_occ chunk count, diffusion trips the gate more often), but the
2D gate probe's table proved to carry a ~2x boot/contention artifact, so
this probe separates the physical effects (measured cadence, measured
max_occ) from the timing on the current boot.

Run: PYTHONPATH=/root/repo:/root/.axon_site python results/equil_breakdown_probe3.py [N ...]
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
    _ = float(jnp.sum(out[1]))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(state)
        _ = float(jnp.sum(out[1]))
        best = min(best, time.perf_counter() - t0)
    return max(best - LAT, 1e-9), out


def probe(N):
    rho, cutoff, kt = 0.8, 2.5, 1.0
    box = float((N / rho) ** (1.0 / 3.0))
    gf = make_cell_grid_fn(box, cutoff, N, dim=3, rho=rho)
    md = GridMD3(gf, dt=1e-3, compensated=True)
    pos, vel = lattice(N, box, jax.random.PRNGKey(0), kt=kt)
    s0 = md.init(pos, vel)
    k, gate = md.auto_chunk_params(kt)
    print(f"\n== N={N:,}: cap={md.cap} skin={md.skin:.3f} auto=(k={k}, gate={gate}) ==")

    chunk = md.make_chunk_step(k, gate)

    @jax.jit
    def equil(s):
        s = jax.lax.fori_loop(0, 800 // k, lambda i, t: chunk(t), s)
        return s, md.kinetic_energy(s)

    # rescaling equilibration (3D melt self-heats kT -> ~1.6)
    s_hot = s0
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
        f"max_occ = {int(s_hot.max_occ)}"
    )
    s_hot = s_hot.replace(overflow=jnp.zeros((), bool))

    NW = max(1, 400 // k)
    window = md._make_window(md.force_kernel, k)

    @jax.jit
    def run_window(s):
        s = jax.lax.fori_loop(0, NW, lambda i, t: window(t), s)
        return s, md.kinetic_energy(s)

    t, _ = timed(run_window, s_hot)
    print(f"window-only (occ {int(s_hot.max_occ)}) : {t / (NW * k) * 1e3:7.4f} ms/step")

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
        s, cnt, occ_sum = carry
        need = md._needs_rebuild(s, frac=gate)
        s = jax.lax.cond(need, md._rebuild_migrate, lambda x: x, s)
        return window(s), cnt + need.astype(jnp.int32), occ_sum + s.max_occ

    @jax.jit
    def run_counted(s):
        s, cnt, occ_sum = jax.lax.fori_loop(
            0,
            NW,
            lambda i, c: counted_chunk(c),
            (s, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32)),
        )
        return s, cnt, occ_sum

    s1, cnt, occ_sum = run_counted(s_hot)
    s1, cnt2, occ_sum2 = run_counted(s1)
    n_rb = int(cnt2)
    print(
        f"rebuild cadence        : {int(cnt)}/{NW} then {n_rb}/{NW} chunks "
        f"(1 per {NW * k / max(n_rb, 1):.1f} steps); mean in-loop max_occ "
        f"{float(occ_sum2) / NW:.1f}"
    )

    @jax.jit
    def run_chunk(s):
        s = jax.lax.fori_loop(0, NW, lambda i, t: chunk(t), s)
        return s, md.kinetic_energy(s)

    t, out = timed(run_chunk, s_hot)
    t_step = t / (NW * k)
    print(
        f"production chunk       : {t_step * 1e3:7.4f} ms/step -> "
        f"{N / t_step / 1e6:.1f}M psps   (overflow={bool(out[0].overflow)})"
    )
    amort = n_rb * t_rb / (NW * k)
    print(
        f"accounting             : {(t_step - amort) * 1e3:.4f} residual-window "
        f"+ {amort * 1e3:.4f} rebuild ms/step"
    )


for N in [int(a) for a in sys.argv[1:]] or (100_000,):
    probe(N)
