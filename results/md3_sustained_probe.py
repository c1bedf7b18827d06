"""Latency-honest 3D engine measurement + b-chunk kernel A/B.

The naive sub-timings in md3_rebuild_probe.py all read ~27 ms because a
single dispatch over the axon tunnel carries ~25 ms of round-trip latency
(CLAUDE.md) — max_occ alone "measured" 26.6 ms. Every number here comes from
a long fused on-device loop with the measured null-dispatch latency
subtracted:

  latency    — null dispatch + scalar host read, the calibration
  kernel A/B — b_chunk=8 (dynamic b-bound) vs b_chunk=cap (round-2
               structure), 300 chained calls per dispatch
  window     — 200 fused leapfrog steps
  rebuild    — 50 chained migration rebuilds
  sustained  — after a 2k-step equilibration, 5 x 2000-step production
               dispatches (auto chunk cadence), the round-2-comparable
               psps number

Run: PYTHONPATH=/root/repo:/root/.axon_site python results/md3_sustained_probe.py [N]
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
from jax_tpus_benchmark_physics_simulation_tpu.ops.kernels.cell_pallas3 import (
    make_grid_force_kernel3,
)
from jax_tpus_benchmark_physics_simulation_tpu.ops.kernels.grid_md3 import GridMD3

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
rho, cutoff, kt = 0.8, 2.5, 1.0
box = float((N / rho) ** (1.0 / 3.0))
gf = make_cell_grid_fn(box, cutoff, N, dim=3, rho=rho)
md = GridMD3(gf, dt=1e-3, compensated=True)

per = int(np.ceil(N ** (1.0 / 3.0)))
sp = box / per
g = jnp.arange(per, dtype=jnp.float32) * sp + 0.5 * sp
mesh = jnp.stack(jnp.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)[:N]
key = jax.random.PRNGKey(1)
pos = jnp.mod(mesh + 0.05 * jax.random.normal(key, mesh.shape), box)
vel = np.sqrt(kt) * jax.random.normal(jax.random.fold_in(key, 1), (N, 3))
s0 = md.init(pos, vel)


def timed_call(c, *args, reps=5):
    out = c(*args)
    jax.block_until_ready(out)
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = c(*args)
        _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    return best, out


# --- latency calibration ---------------------------------------------------
lat, _ = timed_call(jax.jit(lambda x: x + 1.0), jnp.zeros(()))
print(f"null-dispatch latency: {lat * 1e3:.2f} ms (subtracted below)")


def honest(fn, *args, inner=1, reps=5):
    t, out = timed_call(jax.jit(fn), *args, reps=reps)
    return (t - lat) / inner, out


# --- kernel A/B ------------------------------------------------------------
K = 300
kern_b8 = md.force_kernel  # default b_chunk=8
kern_bcap = make_grid_force_kernel3(gf, b_chunk=md.cap)


def kloop(kern):
    def f(xg, yg, zg, mo):
        def body(i, c):
            xg, yg, zg = c
            fx, fy, fz = kern(xg, yg, zg, mo)
            return (xg + 1e-30 * fx, yg + 1e-30 * fy, zg + 1e-30 * fz)

        return jax.lax.fori_loop(0, K, body, (xg, yg, zg))[1]

    return f


t8, _ = honest(kloop(kern_b8), s0.xg, s0.yg, s0.zg, s0.max_occ, inner=K)
tc, _ = honest(kloop(kern_bcap), s0.xg, s0.yg, s0.zg, s0.max_occ, inner=K)
print(f"kernel b_chunk=8  : {t8 * 1e3:7.3f} ms/call (max_occ={int(s0.max_occ)})")
print(f"kernel b_chunk=cap: {tc * 1e3:7.3f} ms/call (round-2 structure)")

# --- window / rebuild ------------------------------------------------------
W = 200
t_w, _ = honest(md._make_window(md.force_kernel, W), s0, inner=W)
print(f"window            : {t_w * 1e3:7.3f} ms/step ({W} fused steps)")

R = 50


def rloop(s):
    def body(i, st):
        return md._rebuild_migrate(st)

    return jax.lax.fori_loop(0, R, body, s)


t_r, _ = honest(rloop, s0, inner=R)
print(f"rebuild           : {t_r * 1e3:7.3f} ms/rebuild ({R} chained)")

# --- sustained production --------------------------------------------------
n_inner, gate = md.auto_chunk_params(kt=kt)
chunk = md.make_chunk_step(n_inner, gate)
print(f"auto cadence: n_inner={n_inner}, gate={gate}")

STEPS_PER_DISPATCH = 2000
n_chunks = STEPS_PER_DISPATCH // n_inner


def run_block(s):
    def body(i, st):
        return chunk(st)

    return jax.lax.fori_loop(0, n_chunks, body, s)


blk = jax.jit(run_block)
s = blk(s0)  # equilibrate ~2000 steps (also the warmup/compile)
jax.block_until_ready(s.xg)
_ = float(s.dmax2)
best = float("inf")
tot_t, tot_steps = 0.0, 0
for rep in range(5):
    t0 = time.perf_counter()
    s = blk(s)
    _ = float(s.dmax2)
    dt_wall = time.perf_counter() - t0 - lat
    best = min(best, dt_wall)
    tot_t += dt_wall
    tot_steps += n_chunks * n_inner
ms_step = best / (n_chunks * n_inner) * 1e3
print(f"sustained         : {ms_step:7.3f} ms/step best "
      f"({tot_t / tot_steps * 1e3:.3f} avg) -> {N / (best / (n_chunks * n_inner)) / 1e6:.1f}M psps")
print(f"violations={int(s.overflow)} max_occ={int(s.max_occ)}")
