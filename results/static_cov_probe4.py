"""Static-cov at the TRUE default geometry + rebuild cost split.

probe2/3 ran at skin=0.12 (requested), but the auto default is
skin = box/cps - cutoff = 0.1316 at N=100k — same cps19 grid, ~10% more
drift budget, so every rebuild cadence stretches ~10%. This probe measures
the production-default candidates on that geometry with the static(cov)
kernel, plus the rebuild's internal split (allocation `_migration_dest3`
vs the migrate kernel) to rank the next trim:

1. gated k=1 gate .40 (current auto), k=2 gate .35 (the 8-sigma rule's
   densest k=2 point), k=2 gate .40 (probe3's winner at skin .12),
2. fixed-cadence fori driver with REBUILD-FIRST blocks (probe3's
   window-first form tripped the skin/2 flag on the first block because
   the entry state starts mid-cadence; rebuild-first also makes the
   violation horizon per-block exact). R = 10, 11, 12 — the measured
   per-step max-drift is ~0.0055 abs, so the 0.5*skin=0.0658 horizon is
   ~11.9 steps: 12 should flag (loudness check), 11 is the edge.
3. rebuild split: full _rebuild_migrate vs _migration_dest3 alone, on a
   state carrying a real mover population.

Run: PYTHONPATH=/root/repo:/root/.axon_site python results/static_cov_probe4.py [N]
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


N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
rho, cutoff, kt = 0.8, 2.5, 1.0
box = float((N / rho) ** (1.0 / 3.0))
cps = int(box / (cutoff + 0.1))
skin = box / cps - cutoff  # the auto-geometry default (lj_fluid.resolve_skin)
gf = make_cell_grid_fn(box, cutoff, N, dim=3, rho=rho, skin=skin)
md0 = GridMD3(gf, dt=1e-3, compensated=True, a_chunk=8, b_chunk=8)
k, gate = md0.auto_chunk_params(kt)
print(f"cps={md0.cps} cap={md0.cap} skin={md0.skin:.4f} auto=(k={k}, gate={gate})")

pos, vel = lattice(N, box, jax.random.PRNGKey(0), kt=kt)
chunk = md0.make_chunk_step(k, gate)


@jax.jit
def equil(s):
    s = jax.lax.fori_loop(0, max(1, 800 // k), lambda i, t: chunk(t), s)
    return s, md0.kinetic_energy(s)


s_hot = md0.init(pos, vel)
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
mo = int(s_hot.max_occ)
cov = -(-mo // 8) * 8
print(
    f"equilibrated: kT ~ {float(ke) / (1.5 * N):.3f}, max_occ = {mo} -> cov {cov}"
    f"  overflow={bool(s_hot.overflow)}"
)
s_hot = s_hot.replace(overflow=jnp.zeros((), bool))

STEPS = 440  # divisible by 10 and 11; 440/12 blocks use 432 steps
md_s = GridMD3(
    gf, dt=1e-3, compensated=True, a_chunk=cov, b_chunk=cov,
    static_cov=cov, migrate_k_mov=8,
)

# -- rebuild split on a mover-carrying state ---------------------------------
w10 = md_s._make_window(md_s.force_kernel, 10)
s_mov = jax.jit(w10)(s_hot)
_ = float(jnp.sum(s_mov.xg))


@jax.jit
def reb_full(s):
    s = md_s._rebuild_migrate(s)
    return s, jnp.sum(s.xg)


@jax.jit
def reb_dest(s):
    xw, yw, zw, scode, occ_new, _dest, of = md_s._migration_dest3(s)
    return (xw,), jnp.sum(scode) + jnp.sum(occ_new) + jnp.sum(xw)


t_full, _ = timed(reb_full, s_mov, reps=10)
t_dest, _ = timed(reb_dest, s_mov, reps=10)
print(
    f"rebuild split: full {t_full * 1e3:.3f} ms, dest(allocation) "
    f"{t_dest * 1e3:.3f} ms, kernel+rest {max(t_full - t_dest, 0) * 1e3:.3f} ms"
)


def report(label, t_step, out):
    print(
        f"production {label:34s}: {t_step * 1e3:7.4f} ms/step -> "
        f"{N / t_step / 1e6:6.1f}M psps  (overflow={bool(out[0].overflow)})"
    )


def gated(n_inner, gate_frac):
    prod = md_s.make_production_run(STEPS, n_inner, gate_frac=gate_frac)

    @jax.jit
    def run(s):
        s = prod(s)
        return s, md_s.kinetic_energy(s)

    t, out = timed(run, s_hot)
    report(f"gated k={n_inner} gate={gate_frac}", t / STEPS, out)


def fixed(R):
    window = md_s._make_window(md_s.force_kernel, R)

    @jax.jit
    def run(s):
        def body(i, t):
            return window(md_s._rebuild_migrate(t))

        s = jax.lax.fori_loop(0, STEPS // R, body, s)
        return s, md_s.kinetic_energy(s)

    t, out = timed(run, s_hot)
    report(f"fixed R={R} (rebuild-first fori)", t / ((STEPS // R) * R), out)


gated(1, 0.40)
gated(2, 0.35)
gated(2, 0.40)
for R in (10, 11, 12):
    fixed(R)
