"""Migration-rebuild phase timing (2D engine), latency-honest.

After the inverse-permute landed, the N=1M rebuild reads 78 ms while the
scatter_probe microbenchmark says the permute core (1-col inv scatter +
(rows, F) row gather) is ~11 ms. This probe times each phase of
GridMD._rebuild_migrate in chained fused loops to find the other ~67 ms:

  alloc    — _migration_dest (9-direction mask/cumsum/roll allocation)
  stack    — jnp.stack of the F flat fields into (size, F)
  invscat  — the 1-column inverse-index scatter
  gather   — the (size+1, F) row gather by inv
  unstack  — F column extractions back to grid shapes (+ reduce)
  permute  — permute_rows_by_inverse end-to-end (stack+invscat+gather)
  rebuild  — the full _rebuild_migrate

Run: PYTHONPATH=/root/repo:/root/.axon_site python results/rebuild_phase_probe.py [N ...]
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
from jax_tpus_benchmark_physics_simulation_tpu.ops.kernels.grid_md import (
    GridMD,
    permute_rows_by_inverse,
)

_null = jax.jit(lambda x: x + 1.0)
_ = float(_null(jnp.zeros(())))
LAT = float("inf")
for _ in range(5):
    _t0 = time.perf_counter()
    _ = float(_null(jnp.zeros(())))
    LAT = min(LAT, time.perf_counter() - _t0)
print(f"null-dispatch latency: {LAT * 1e3:.2f} ms (subtracted)")

R = 20  # chained iterations per dispatch


def timed(fn, *args):
    c = jax.jit(fn)
    out = c(*args)
    jax.block_until_ready(out)
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = c(*args)
        _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    return (best - LAT) / R


def probe(N):
    rho, kt = 0.8, 1.0
    box = float(np.sqrt(N / rho))
    gf = make_cell_grid_fn(box, 2.5, N, dim=2, rho=rho)
    md = GridMD(gf, dt=1e-3, compensated=True)
    per = int(np.ceil(np.sqrt(N)))
    sp = box / per
    g = jnp.arange(per, dtype=jnp.float32) * sp + 0.5 * sp
    mesh = jnp.stack(jnp.meshgrid(g, g, indexing="ij"), -1).reshape(-1, 2)[:N]
    key = jax.random.PRNGKey(1)
    pos = jnp.mod(mesh + 0.05 * jax.random.normal(key, mesh.shape), box)
    vel = np.sqrt(kt) * jax.random.normal(jax.random.fold_in(key, 1), (N, 2))
    s = md.init(pos, vel)
    size = md.size
    F = 12
    print(f"\n== N={N:,}: slots={size:,} F={F} ==")

    # realistic inputs captured once
    xw, yw, _scode, _occ, dest_flat, _ = jax.jit(md._migration_dest)(s)
    fields = [xw, yw, s.vxg, s.vyg, s.fxg, s.fyg, s.occ, s.pid.astype(jnp.float32),
              s.crx, s.cry, s.cvx, s.cvy]
    fills = [md.sentinel, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, -1.0, 0.0, 0.0, 0.0, 0.0]
    flat = [v.reshape(-1) for v in fields]
    vals = jnp.stack(flat, axis=-1)
    vals_ext = jnp.concatenate([vals, jnp.asarray(fills, jnp.float32)[None, :]], 0)
    size_i = jnp.int32(size)
    inv = (
        jnp.full((size + 1,), size_i, jnp.int32)
        .at[dest_flat]
        .set(jnp.arange(size, dtype=jnp.int32), mode="drop", unique_indices=True)
    )[:size]
    jax.block_until_ready((vals_ext, inv))

    # 1. alloc
    def f_alloc(s):
        def body(i, s):
            xw, yw, _sc, _oc, d, _ = md._migration_dest(s)
            return s.replace(xg=xw + 1e-30 * d.reshape(md.grid_shape).astype(jnp.float32))
        return jax.lax.fori_loop(0, R, body, s)
    print(f"alloc  : {timed(f_alloc, s) * 1e3:8.3f} ms")

    # 2. stack only
    def f_stack(fl):
        def body(i, fl):
            v = jnp.stack(fl, axis=-1)
            v = jax.lax.optimization_barrier(v)
            return [v[:, k] for k in range(F)]
        return jax.lax.fori_loop(0, R, body, fl)
    print(f"stack+unstack : {timed(f_stack, flat) * 1e3:8.3f} ms (round trip)")

    # 3. inv scatter only
    def f_inv(d):
        def body(i, d):
            iv = (
                jnp.full((size + 1,), size_i, jnp.int32)
                .at[d]
                .set(jnp.arange(size, dtype=jnp.int32), mode="drop",
                     unique_indices=True)
            )[:size]
            return jnp.where(iv >= 0, d, d)  # carry same shape
        return jax.lax.fori_loop(0, R, body, d)
    print(f"invscat: {timed(f_inv, dest_flat) * 1e3:8.3f} ms")

    # 4. row gather only
    def f_gather(ve):
        def body(i, ve):
            out = jnp.take(ve, inv, axis=0)
            out = jax.lax.optimization_barrier(out)
            return ve.at[:size].set(out * 1.0)
        return jax.lax.fori_loop(0, R, body, ve)
    print(f"gather : {timed(f_gather, vals_ext) * 1e3:8.3f} ms (+writeback)")

    # 5. permute end-to-end (stack + invscat + gather + unstack to grids)
    def f_perm(fl):
        def body(i, fl):
            out = permute_rows_by_inverse(dest_flat, fl, fills, size, jnp.float32)
            return [out[:, k] for k in range(F)]
        return jax.lax.fori_loop(0, R, body, [v.reshape(-1) for v in fl])
    print(f"permute: {timed(f_perm, flat) * 1e3:8.3f} ms")

    # 6. full rebuild — Pallas migrate-kernel path (production) and the
    #    row-permutation path (what ShardedGridMD uses on GSPMD arrays)
    def f_reb(s):
        def body(i, s):
            return md._rebuild_migrate(s)
        return jax.lax.fori_loop(0, R, body, s)
    print(f"rebuild (migrate kernel): {timed(f_reb, s) * 1e3:8.3f} ms")

    def f_reb_rows(s):
        def body(i, s):
            return md._rebuild_migrate_rows(s)
        return jax.lax.fori_loop(0, R, body, s)
    print(f"rebuild (row permute)   : {timed(f_reb_rows, s) * 1e3:8.3f} ms")


for N in [int(a) for a in sys.argv[1:]] or (100_000, 1_000_000):
    probe(N)
