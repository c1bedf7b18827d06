"""Where does the sharded engine's +79% 1-device overhead go?

sharded_overhead_probe.py measured ShardedGridMD at 0.416 ms/step vs plain
GridMD's 0.232 on the same chip (N=100k, auto cadence). This ablates the
machinery stack one layer at a time, window-only (no rebuilds — the gate
never trips in a 400-step hot window at these sizes), 400 fused steps,
latency-subtracted:

A. plain fused-kernel window (single-chip production path);
B. raw-mode kernel + LOCAL halo rolls, no shard_map — the exact arithmetic
   the sharded window does per step (explicit next-row arrays, reaction
   un-shift + add) but with jnp.concatenate standing in for the ppermutes;
C. shard_map on a 1-device mesh, NO pmax monitor reduction;
D. full sharded window (shard_map + ppermutes + pmax) — the baseline.

B-A = raw-kernel mode + halo materialization; C-B = shard_map + ppermute
lowering; D-C = the pmax monitor collective.

Run: PYTHONPATH=/root/repo:/root/.axon_site python results/sharded_ablation_probe.py [N]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from jax_tpus_benchmark_physics_simulation_tpu.ops.kernels.cell_dense import (
    make_cell_grid_fn,
)
from jax_tpus_benchmark_physics_simulation_tpu.ops.kernels.cell_pallas import (
    make_grid_force_kernel,
)
from jax_tpus_benchmark_physics_simulation_tpu.ops.kernels.grid_md import GridMD
from jax_tpus_benchmark_physics_simulation_tpu.parallel.grid_md_sharded import (
    ShardedGridMD,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
STEPS = 400

_null = jax.jit(lambda x: x + 1.0)
_ = float(_null(jnp.zeros(())))
LAT = float("inf")
for _ in range(5):
    _t0 = time.perf_counter()
    _ = float(_null(jnp.zeros(())))
    LAT = min(LAT, time.perf_counter() - _t0)
print(f"latency {LAT * 1e3:.2f} ms")


def lattice(n, box, key, kt=1.0):
    per = int(np.ceil(np.sqrt(n)))
    sp = box / per
    g = jnp.arange(per, dtype=jnp.float32) * sp + 0.5 * sp
    mesh = jnp.stack(jnp.meshgrid(g, g, indexing="ij"), -1).reshape(-1, 2)[:n]
    pos = jnp.mod(mesh + 0.05 * jax.random.normal(key, mesh.shape), box)
    vel = np.sqrt(kt) * jax.random.normal(jax.random.fold_in(key, 1), (n, 2))
    return pos, vel


rho, cutoff = 0.8, 2.5
box = float(np.sqrt(N / rho))
gf = make_cell_grid_fn(box, cutoff, N, dim=2, rho=rho)
mesh = Mesh(np.array(jax.devices()[:1]), ("x",))
smd = ShardedGridMD(gf, mesh, dt=1e-3, compensated=True)
md = GridMD(gf, dt=1e-3, compensated=True, rows_per_block=1)
pos, vel = lattice(N, box, jax.random.PRNGKey(0))
s = md.init(pos, vel)


def timed(window, state, label):
    @jax.jit
    def run(st):
        st = lax.fori_loop(0, STEPS, lambda i, t: window(t), st)
        return st, jnp.sum(st.vxg)

    st, chk = run(state)
    _ = float(chk)
    best = float("inf")
    for _ in range(3):
        st, chk = run(st)
        _ = float(chk)  # drain the async queue BEFORE t0 (2x otherwise)
        t0 = time.perf_counter()
        st, chk = run(st)
        _ = float(chk)
        best = min(best, time.perf_counter() - t0)
    t = max(best - LAT, 1e-9) / STEPS
    print(f"{label:42s} {t * 1e3:7.4f} ms/step -> {N / t / 1e6:6.1f}M psps")
    return t


# A. plain fused-kernel window
timed(md._make_window(md.force_kernel, 1), s, "A plain fused kernel (R=1)")

# B. raw kernel + local rolls (sharded arithmetic, no shard_map)
raw = make_grid_force_kernel(gf, n_rows=md.cps).raw


def local_halo(v, seam_delta=0.0):
    head = v[0:1] + seam_delta
    return jnp.concatenate([v[1:], head], axis=0)


def local_shift_reaction(r):
    return jnp.concatenate([r[-1:], r[:-1]], axis=0)


def raw_force(xg, yg):
    fx, fy, rfx, rfy = raw(xg, local_halo(xg, seam_delta=box), yg, local_halo(yg))
    return fx + local_shift_reaction(rfx), fy + local_shift_reaction(rfy)


timed(md._make_window(raw_force, 1), s, "B raw kernel + local halo rolls")

# C/D need a sharded state
ss = smd.shard_state(s)


def shardmapped(reduce_max, label):
    window = smd._make_window(smd._halo_force, 1, reduce_max=reduce_max)
    specs = smd._state_specs(ss)

    def w(st):
        return jax.shard_map(
            window, mesh=smd.mesh, in_specs=(specs,), out_specs=specs,
            check_vma=False,
        )(st)

    timed(w, ss, label)


shardmapped(None, "C shard_map + ppermutes, NO pmax")
shardmapped(lambda v: lax.pmax(v, "x"), "D full sharded window (pmax)")
