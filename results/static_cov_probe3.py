"""Static-cov driver shootout: gated-while vs fixed-cadence fori.

static_cov_probe2 decomposed the static(24,24) production step at cps19 /
N=100k: window 0.5455 + rebuild 1.11/9.5 = 0.117 + **0.038 ms/step
unaccounted** (the gate predicate is a scalar compare on the stored dmax2,
so the residue must be while-loop iteration machinery at k=1 — one dynamic
while iteration per MD step). Two ways to buy it back:

1. gate retune at k=1 (0.45 stretches the rebuild cadence ~9.5 -> ~10.7;
   0.45 + one k=1 window's worth of drift stays under the skin/2 violation
   threshold, unlike k>=2),
2. a fixed-cadence driver: fori over n_steps/R blocks, each = R-step
   window + unconditional rebuild. Zero gate, zero while machinery; safety
   demoted to the window's existing skin/2 violation flag (loud overflow),
   which is exactly the invariant the tests assert. R sweeps 8..11 — the
   measured gate-0.4 cadence is 9.5 and the violation horizon ~11.9, so 11
   should start tripping the flag (kept as a loudness check).

Run: PYTHONPATH=/root/repo:/root/.axon_site python results/static_cov_probe3.py [N]
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
rho, cutoff, kt, skin = 0.8, 2.5, 1.0, 0.12
box = float((N / rho) ** (1.0 / 3.0))
gf = make_cell_grid_fn(box, cutoff, N, dim=3, rho=rho, skin=skin)
md0 = GridMD3(gf, dt=1e-3, compensated=True, a_chunk=8, b_chunk=8)
k, gate = md0.auto_chunk_params(kt)
print(f"cps={md0.cps} cap={md0.cap} skin={md0.skin:.3f} auto=(k={k}, gate={gate})")

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

STEPS = 400
md_s = GridMD3(
    gf, dt=1e-3, compensated=True, a_chunk=cov, b_chunk=cov,
    static_cov=cov, migrate_k_mov=8,
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
            return md_s._rebuild_migrate(window(t))

        s = jax.lax.fori_loop(0, STEPS // R, body, s)
        return s, md_s.kinetic_energy(s)

    t, out = timed(run, s_hot)
    report(f"fixed R={R} (fori, uncond rebuild)", t / ((STEPS // R) * R), out)


gated(1, 0.40)
gated(1, 0.45)
gated(2, 0.40)
for R in (8, 9, 10, 11):
    fixed(R)
