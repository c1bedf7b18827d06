"""Round-5b: where do the 12.6M psps go between probe5's bare fixed-cadence
driver (152.8M) and the CLI production phase (140.2M)?

Variants, all on the product engine (hybrid static_cov="auto",
migrate_k_mov=8) at N=100k, fixed R=auto_cadence, 1000 steps:

  a  bare fixed driver, one KE sync at the end        (the probe5 F2 form)
  b  scan of 10x100-step blocks, KE sampled per block (scan-carry cost)
  c  b + positions() gather per block                 (r_history cost)
  d  b + potential_energy() per block                 (PE-pass cost)
  e  b + all three                                    (the production() form)

Run: PYTHONPATH=/root/repo:/root/.axon_site python results/md3_sampling_probe5b.py
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
print(f"null-dispatch latency: {LAT * 1e3:.2f} ms", flush=True)


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
md = GridMD3(gf, dt=dt, compensated=True, static_cov="auto", migrate_k_mov=8)

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
R = md.auto_cadence(kt_eq)
print(f"kT={kt_eq:.3f} R={R} max_occ={int(gs.max_occ)}", flush=True)

STEPS, SE = 1000, 100
block = md.make_production_run_fixed(SE, R)


def timed(runfn, label):
    out = runfn(gs)
    _ = float(out[1])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = runfn(gs)
        _ = float(out[1])
        best = min(best, time.perf_counter() - t0)
    best = max(best - LAT, 1e-9)
    print(
        f"{label:34s}: {best / STEPS * 1e3:7.4f} ms/step -> "
        f"{N * STEPS / best / 1e6:6.1f}M psps",
        flush=True,
    )


bare = md.make_production_run_fixed(STEPS, R)
timed(jax.jit(lambda s: (lambda o: (o, md.kinetic_energy(o)))(bare(s))), "a bare fixed")


def scan_variant(observe, label):
    def run(s):
        def body(g, _):
            g = block(g)
            return g, observe(g)

        s, ys = jax.lax.scan(body, s, length=STEPS // SE)
        return s, jnp.sum(jax.tree.leaves(ys)[0][-1])

    timed(jax.jit(run), label)


scan_variant(lambda g: (md.kinetic_energy(g),), "b scan + KE")
scan_variant(lambda g: (md.kinetic_energy(g), md.positions(g)), "c scan + KE + positions")
scan_variant(lambda g: (md.kinetic_energy(g), md.potential_energy(g)), "d scan + KE + PE")
scan_variant(
    lambda g: (md.kinetic_energy(g), md.positions(g), md.potential_energy(g)),
    "e scan + all (production form)",
)
