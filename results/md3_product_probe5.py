"""Round-5: close the 3D 150M-psps bar ON THE PRODUCT ENGINE.

The CLI now reports an honest equilibrated production rate (AOT compile
split out): 133.6M psps at pure defaults (hybrid static_cov="auto",
cond-free gated driver k=1 gate .40, migrate_k_mov=16, sampled every 100
steps). probe4's pure-static engine measured gated 150.0M / fixed R=11
156.3M — this probe ranks the levers that close the product gap, all on
an equilibrated kT=1 state at the true auto geometry:

  A  bare gated k=1 .40          (current product driver, hybrid)
  B  bare gated k=2 .35          (hybrid)
  C  bare gated k=2 .40          (hybrid)
  D  fixed R=auto_cadence        (hybrid; rebuild-first fori)
  E  fixed R=auto+1              (hybrid)
  F  A with migrate_k_mov=8      (probe4 used 8; product default is 16)
  G  A on the PURE static engine (isolates hybrid-mode overhead)
  H  the real production() sampled scan (lj_fluid), per-sample blocks

Run: PYTHONPATH=/root/repo:/root/.axon_site python results/md3_product_probe5.py [N]
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from jax_tpus_benchmark_physics_simulation_tpu.ops.kernels.cell_dense import (
    make_cell_grid_fn,
)
from jax_tpus_benchmark_physics_simulation_tpu.ops.kernels.grid_md3 import GridMD3

_null = jax.jit(lambda x: x + 1.0)
_ = float(_null(jnp.zeros(())))
LAT = min(
    (lambda t0: (float(_null(jnp.zeros(()))), time.perf_counter() - t0)[1])(
        time.perf_counter()
    )
    for _ in range(5)
)
print(f"null-dispatch latency: {LAT * 1e3:.2f} ms (subtracted)", flush=True)


def lattice(n, box, key, kt=1.0):
    per = int(np.ceil(n ** (1.0 / 3.0)))
    sp = box / per
    g = jnp.arange(per, dtype=jnp.float32) * sp + 0.5 * sp
    mesh = jnp.stack(jnp.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)[:n]
    pos = jnp.mod(mesh + 0.05 * jax.random.normal(key, mesh.shape), box)
    vel = np.sqrt(kt) * jax.random.normal(jax.random.fold_in(key, 1), (n, 3))
    return pos, vel


N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
rho, cutoff, kt, dt = 0.8, 2.5, 1.0, 1e-3
box = float((N / rho) ** (1.0 / 3.0))
cps = int(box / (cutoff + 0.1))
skin = box / cps - cutoff
gf = make_cell_grid_fn(box, cutoff, N, dim=3, rho=rho, skin=skin)

md = GridMD3(gf, dt=dt, compensated=True, static_cov="auto")
print(
    f"N={N} cps={md.cps} cap={md.cap} skin={md.skin:.4f} cov={md.static_cov} "
    f"hybrid={md._static_fallback}",
    flush=True,
)

# -- rescaling equilibration (CLAUDE.md protocol) ---------------------------
pos, vel = lattice(N, box, jax.random.PRNGKey(0), kt=kt)
k_eq, gate_eq = md.auto_chunk_params(kt=4.0)
chunk_eq = md.make_chunk_step(k_eq, gate_frac=gate_eq)


@jax.jit
def equil(s):
    s = jax.lax.fori_loop(0, max(1, 800 // k_eq), lambda i, t: chunk_eq(t), s)
    return s, md.kinetic_energy(s)


gs = md.init(pos, vel)
for _ in range(4):
    gs, ke = equil(gs)
    scale = float(np.sqrt(1.5 * kt * N / float(ke)))
    zeros = jnp.zeros_like(gs.vxg)
    comp = dict(cvx=zeros, cvy=zeros, cvz=zeros) if gs.cvx is not None else {}
    gs = gs.replace(vxg=gs.vxg * scale, vyg=gs.vyg * scale, vzg=gs.vzg * scale, **comp)
gs, ke = equil(gs)
kt_eq = float(ke) / (1.5 * N)
mo = int(gs.max_occ)
print(f"equilibrated: kT={kt_eq:.3f} max_occ={mo} overflow={bool(gs.overflow)}", flush=True)
assert not bool(gs.overflow)

STEPS = 440


def timed(runfn, s, label, steps=STEPS, reps=3):
    out, ke = runfn(s)
    _ = float(ke)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out, ke = runfn(s)
        _ = float(ke)
        best = min(best, time.perf_counter() - t0)
    best = max(best - LAT, 1e-9)
    print(
        f"{label:42s}: {best / steps * 1e3:7.4f} ms/step -> "
        f"{N * steps / best / 1e6:6.1f}M psps  (overflow={bool(out.overflow)})",
        flush=True,
    )
    return N * steps / best


def gated(engine, k, gate, label, steps=STEPS):
    prod = engine.make_production_run(steps, k, gate_frac=gate)
    run = jax.jit(lambda s: (lambda o: (o, engine.kinetic_energy(o)))(prod(s)))
    return timed(run, gs, label, steps)


def fixed(engine, R, label):
    steps = (STEPS // R) * R
    prod = engine.make_production_run_fixed(steps, R)
    run = jax.jit(lambda s: (lambda o: (o, engine.kinetic_energy(o)))(prod(s)))
    return timed(run, gs, label, steps)


gated(md, 1, 0.40, "A hybrid gated k=1 .40 (product)")
gated(md, 2, 0.35, "B hybrid gated k=2 .35")
gated(md, 2, 0.40, "C hybrid gated k=2 .40")
R = md.auto_cadence(kt_eq)
fixed(md, R, f"D hybrid fixed R={R} (auto_cadence kT={kt_eq:.2f})")
fixed(md, R + 1, f"E hybrid fixed R={R + 1}")

md_k8 = GridMD3(gf, dt=dt, compensated=True, static_cov="auto", migrate_k_mov=8)
gated(md_k8, 1, 0.40, "F hybrid gated k=1 .40, k_mov=8")
fixed(md_k8, R, f"F2 hybrid fixed R={R}, k_mov=8")

cov = md.static_cov
md_pure = GridMD3(gf, dt=dt, compensated=True, static_cov=cov, static_fallback=False)
gs_pure = gs.replace()
gated(md_pure, 1, 0.40, f"G pure static cov={cov} gated k=1 .40")
fixed(md_pure, R, f"G2 pure static fixed R={R}")

# H: the real sampled production structure (per-100-step blocks)
sample_every = 100


def sampled(engine, k, gate, label):
    block = engine.make_production_run(sample_every, k, gate_frac=gate)

    def run_all(s):
        def body(g, _):
            g = block(g)
            return g, (engine.kinetic_energy(g),)

        s, (kes,) = jax.lax.scan(body, s, length=STEPS // sample_every * 1)
        return s, kes[-1]

    steps = (STEPS // sample_every) * sample_every
    run = jax.jit(run_all)
    return timed(run, gs, label, steps)


sampled(md, 1, 0.40, "H hybrid sampled blocks k=1 .40 (product)")
