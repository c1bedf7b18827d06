"""Round-5: 2D fixed-cadence driver A/B at the bench.py headline config.

The 3D fixed-cadence driver (rebuild-first fori, zero gate machinery) beat
the cond-free gated driver 148.4 vs 141.5M psps (results/
md3_product_probe5.py). This probe ports the comparison to 2D N=100k
(cutoff 2.5, rho 0.8, kT 1.0, skin 0.4 — the bench.py headline config):

  A  gated cond-free k,gate = auto_chunk_params   (current bench driver)
  B  fixed R = auto_cadence(kT_measured)
  C  fixed R+4 (margin sweep)  D  fixed R-4

Run: PYTHONPATH=/root/repo:/root/.axon_site python results/md2_fixed_probe5.py [N]
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
from jax_tpus_benchmark_physics_simulation_tpu.ops.kernels.grid_md import GridMD

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
    per = int(np.ceil(np.sqrt(n)))
    sp = box / per
    g = jnp.arange(per, dtype=jnp.float32) * sp + 0.5 * sp
    mesh = jnp.stack(jnp.meshgrid(g, g, indexing="ij"), -1).reshape(-1, 2)[:n]
    pos = jnp.mod(mesh + 0.05 * jax.random.normal(key, mesh.shape), box)
    vel = np.sqrt(kt) * jax.random.normal(jax.random.fold_in(key, 1), (n, 2))
    return pos, vel


N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
rho, cutoff, kt, dt = 0.8, 2.5, 1.0, 1e-3
box = float(np.sqrt(N / rho))
gf = make_cell_grid_fn(box, cutoff, N, dim=2)
md = GridMD(gf, dt=dt, compensated=True)
print(f"N={N} cps={gf.cells_per_side} cap={gf.capacity} skin={md.skin:.3f}", flush=True)

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
    scale = float(np.sqrt(1.0 * kt * N / float(ke)))
    zeros = jnp.zeros_like(gs.vxg)
    comp = dict(cvx=zeros, cvy=zeros) if gs.cvx is not None else {}
    gs = gs.replace(vxg=gs.vxg * scale, vyg=gs.vyg * scale, **comp)
gs, ke = equil(gs)
kt_eq = float(ke) / (1.0 * N)
print(f"kT={kt_eq:.3f} overflow={bool(gs.overflow)}", flush=True)
assert not bool(gs.overflow)

k, gate = md.auto_chunk_params(kt_eq)
R = md.auto_cadence(kt_eq)
STEPS = 2400 - (2400 % max(k, 1))


def timed(runfn, label, steps):
    out, ke = runfn(gs)
    _ = float(ke)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out, ke = runfn(gs)
        _ = float(ke)
        best = min(best, time.perf_counter() - t0)
    best = max(best - LAT, 1e-9)
    print(
        f"{label:36s}: {best / steps * 1e3:7.4f} ms/step -> "
        f"{N * steps / best / 1e6:6.1f}M psps  (overflow={bool(out.overflow)})",
        flush=True,
    )


prod = md.make_production_run(STEPS, k, gate_frac=gate)
timed(
    jax.jit(lambda s: (lambda o: (o, md.kinetic_energy(o)))(prod(s))),
    f"A gated k={k} gate={gate} (bench.py)",
    STEPS,
)
for dR, tag in ((0, "B"), (4, "C"), (-4, "D")):
    Rx = max(1, R + dR)
    steps = (2400 // Rx) * Rx
    fx = md.make_production_run_fixed(steps, Rx)
    timed(
        jax.jit(lambda s, fx=fx: (lambda o: (o, md.kinetic_energy(o)))(fx(s))),
        f"{tag} fixed R={Rx}" + (" (auto_cadence)" if dR == 0 else ""),
        steps,
    )
