"""2D production-driver A/B: chunked lax.cond vs cond-free nested while.

The round-4 cond probe (results/cond_rebuild_probe.py) left ~0.06 ms/chunk
(~0.015 ms/step at k=4) of the 2D N=100k production chunk unaccounted —
window + cadence*rebuild undershoots the measured chunk loop. The suspect
is the data-dependent ``lax.cond`` in the chunk body: XLA copies the full
(cps, C, P)-leaf state through the identity branch inside the fori carry.
GridMD.make_production_run removes the branch (inner while runs windows
until the gate trips; outer while rebuilds unconditionally). This probe
measures both drivers on the same equilibrated kT~1 state, plus N=1M for
the VERDICT item-6 retune context.

Run: PYTHONPATH=/root/repo:/root/.axon_site python results/driver2d_probe.py [N ...]
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
    _ = float(jnp.sum(out[1]))  # hard scalar sync
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(state)
        _ = float(jnp.sum(out[1]))
        best = min(best, time.perf_counter() - t0)
    return max(best - LAT, 1e-9), out


def probe(N):
    rho, cutoff, kt = 0.8, 2.5, 1.0
    box = float(np.sqrt(N / rho))
    gf = make_cell_grid_fn(box, cutoff, N, dim=2, rho=rho)
    md = GridMD(gf, dt=1e-3, compensated=True)
    pos, vel = lattice(N, box, jax.random.PRNGKey(0), kt=kt)
    k, gate = md.auto_chunk_params(kt)
    print(f"\n== N={N:,}: skin={md.skin:.3f} auto=(k={k}, gate={gate}) ==")

    chunk = md.make_chunk_step(k, gate)

    @jax.jit
    def equil(s):
        s = jax.lax.fori_loop(0, 800 // k, lambda i, t: chunk(t), s)
        return s, md.kinetic_energy(s)

    s_hot, ke = equil(md.init(pos, vel))
    _ = float(ke)
    s_hot, ke = equil(s_hot)
    print(f"equilibrated: kT ~ {float(ke) / N:.3f} overflow={bool(s_hot.overflow)}")
    s_hot = s_hot.replace(overflow=jnp.zeros((), bool))

    NW = max(1, 400 // k)

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


for N in [int(a) for a in sys.argv[1:]] or (100_000, 1_000_000):
    probe(N)
