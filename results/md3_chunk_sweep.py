"""3D kernel (capacity, a_chunk, b_chunk) sweep — latency-honest (see
md3_sustained_probe.py). Chunks must divide the capacity and be 8-aligned,
so cap 40 only admits 8/40 while cap 48 admits 8/16/24/48: a bigger
capacity wastes grid slots but allows bigger chunk blocks (fewer per-block
fixed costs: partner-triple builds, ref RMWs, masks) at the same
dynamic-occupancy-covered pair math (e.g. 32x32 covered rows at max_occ
~28 for both cap40/c8 and cap48/c16).

Run: PYTHONPATH=/root/repo:/root/.axon_site python results/md3_chunk_sweep.py
"""

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

N, rho, cutoff, kt = 100_000, 0.8, 2.5, 1.0
box = float((N / rho) ** (1.0 / 3.0))

per = int(np.ceil(N ** (1.0 / 3.0)))
sp = box / per
g = jnp.arange(per, dtype=jnp.float32) * sp + 0.5 * sp
mesh = jnp.stack(jnp.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)[:N]
key = jax.random.PRNGKey(1)
pos = jnp.mod(mesh + 0.05 * jax.random.normal(key, mesh.shape), box)
vel = np.sqrt(kt) * jax.random.normal(jax.random.fold_in(key, 1), (N, 3))

lat_c = jax.jit(lambda x: x + 1.0)
_ = float(lat_c(jnp.zeros(())))
lat = float("inf")
for _ in range(5):
    t0 = time.perf_counter()
    _ = float(lat_c(jnp.zeros(())))
    lat = min(lat, time.perf_counter() - t0)
print(f"latency {lat * 1e3:.2f} ms")

K = 300
states = {}


def get_state(cap):
    if cap not in states:
        gf = make_cell_grid_fn(box, cutoff, N, dim=3, rho=rho, capacity=cap)
        md = GridMD3(gf, dt=1e-3)
        states[cap] = (gf, md, md.init(pos, vel))
    return states[cap]


def bench(cap, ca, cb):
    gf, md, s0 = get_state(cap)
    kern = make_grid_force_kernel3(gf, a_chunk=ca, b_chunk=cb)

    def f(xg, yg, zg, mo):
        def body(i, c):
            xg, yg, zg = c
            fx, fy, fz = kern(xg, yg, zg, mo)
            return (xg + 1e-30 * fx, yg + 1e-30 * fy, zg + 1e-30 * fz)

        return jax.lax.fori_loop(0, K, body, (xg, yg, zg))[1]

    c = jax.jit(f)
    out = c(s0.xg, s0.yg, s0.zg, s0.max_occ)
    jax.block_until_ready(out)
    _ = float(out.reshape(-1)[0])
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        out = c(s0.xg, s0.yg, s0.zg, s0.max_occ)
        _ = float(out.reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    t = (best - lat) / K
    mo = int(s0.max_occ)
    cov_a = -(-mo // ca) * ca
    cov_b = -(-mo // cb) * cb
    print(f"cap={cap} a={ca:2d} b={cb:2d} (mo={mo}, covered {cov_a}x{cov_b}): "
          f"{t * 1e3:7.3f} ms/call -> {N / t / 1e6:6.1f}M psps (kernel-only)",
          flush=True)


for cap, ca, cb in [
    (40, 8, 40),   # round-2 structure (a-bound only)
    (40, 8, 8),    # uncommitted default
    (40, 40, 40),  # no dynamic bound, one big block
    (48, 16, 16),
    (48, 8, 16),
    (48, 16, 48),
    (48, 24, 24),
    (48, 16, 24),
]:
    try:
        bench(cap, ca, cb)
    except Exception as e:
        print(f"cap={cap} a={ca} b={cb}: FAILED {type(e).__name__}: {e}", flush=True)
