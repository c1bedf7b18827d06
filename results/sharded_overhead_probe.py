"""Sharding overhead measured on the REAL chip (round-2 VERDICT next item 5).

The 8-chip scaling story was an extrapolation; what one chip CAN measure is
the machinery cost of the sharded engine itself: ShardedGridMD (halo
ppermutes + pmax monitor + shard_map wrapping) on a 1-device mesh vs plain
GridMD, same physics, same cadence, latency-honest timing. Together with
the compiled collective-bytes count (collective_bytes_probe.py, CPU) this
bounds the 8-chip projection with measurements instead of arithmetic:

  t_8chip/step ~ t_1chip_sharded/step (per-device work at N_local = N) +
                 bytes_collective / BW_ici

Run: PYTHONPATH=/root/repo:/root/.axon_site python results/sharded_overhead_probe.py [N]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from jax_tpus_benchmark_physics_simulation_tpu.ops.kernels.cell_dense import (
    make_cell_grid_fn,
)
from jax_tpus_benchmark_physics_simulation_tpu.ops.kernels.grid_md import GridMD
from jax_tpus_benchmark_physics_simulation_tpu.parallel.grid_md_sharded import (
    ShardedGridMD,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
rho, cutoff, kt = 0.8, 2.5, 1.0
box = float(np.sqrt(N / rho))
gf = make_cell_grid_fn(box, cutoff, N, dim=2, rho=rho)

per = int(np.ceil(np.sqrt(N)))
sp = box / per
g = jnp.arange(per, dtype=jnp.float32) * sp + 0.5 * sp
mesh2 = jnp.stack(jnp.meshgrid(g, g, indexing="ij"), -1).reshape(-1, 2)[:N]
key = jax.random.PRNGKey(1)
pos = jnp.mod(mesh2 + 0.05 * jax.random.normal(key, mesh2.shape), box)
vel = np.sqrt(kt) * jax.random.normal(jax.random.fold_in(key, 1), (N, 2))

lat_c = jax.jit(lambda x: x + 1.0)
_ = float(lat_c(jnp.zeros(())))
LAT = float("inf")
for _ in range(5):
    t0 = time.perf_counter()
    _ = float(lat_c(jnp.zeros(())))
    LAT = min(LAT, time.perf_counter() - t0)
print(f"latency {LAT * 1e3:.2f} ms")

STEPS = 2000


def sustained(md, s, n_inner, gate, shard=None):
    chunk = md.make_chunk_step(n_inner, gate)
    n_chunks = STEPS // n_inner

    def run(st):
        def body(i, st):
            return chunk(st)

        return jax.lax.fori_loop(0, n_chunks, body, st)

    c = jax.jit(run)
    s = c(s)  # warm + equilibrate transient
    jax.block_until_ready(s.xg)
    _ = float(s.dmax2)
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        s = c(s)
        _ = float(s.dmax2)
        best = min(best, time.perf_counter() - t0)
    ms = (best - LAT) / (n_chunks * n_inner) * 1e3
    assert not bool(s.overflow), "violation during probe"
    return ms


# plain single-chip engine (default packed rows)
md = GridMD(gf, dt=1e-3, compensated=True)
n_inner, gate = md.auto_chunk_params(kt=kt)
s = md.prepare(md.init(pos, vel))
ms_plain = sustained(md, s, n_inner, gate)
print(f"plain GridMD       : {ms_plain:7.4f} ms/step -> {N / ms_plain / 1e3:.1f}M psps "
      f"(n_inner={n_inner}, gate={gate})")

# plain engine at rows_per_block=1 — the layout the sharded engine must use
# (halo exchange is per physical cell row); separates the lane-packing cost
# from the halo/pmax machinery cost
md1 = GridMD(gf, dt=1e-3, compensated=True, rows_per_block=1)
s1 = md1.prepare(md1.init(pos, vel))
ms_rpb1 = sustained(md1, s1, n_inner, gate)
print(f"plain rows_block=1 : {ms_rpb1:7.4f} ms/step -> {N / ms_rpb1 / 1e3:.1f}M psps")

# sharded engine on a 1-device mesh: all halo/pmax machinery active,
# ppermutes degenerate to self-sends
mesh = Mesh(np.array(jax.devices()[:1]), ("x",))
smd = ShardedGridMD(gf, mesh, dt=1e-3, compensated=True)
n_inner_s, gate_s = smd.auto_chunk_params(kt=kt)
ss = smd.shard_state(smd.prepare(smd.init(pos, vel)))
ms_shard = sustained(smd, ss, n_inner_s, gate_s)
print(f"ShardedGridMD 1dev: {ms_shard:7.4f} ms/step -> {N / ms_shard / 1e3:.1f}M psps "
      f"(n_inner={n_inner_s}, gate={gate_s})")
print(f"sharding machinery overhead: {(ms_shard - ms_plain):.4f} ms/step "
      f"({(ms_shard / ms_plain - 1) * 100:.1f}%)")
