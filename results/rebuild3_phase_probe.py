"""Split the 3D rebuild into allocation / (legacy) code-grid scatter /
migrate-kernel phases on an equilibrated state (the batched one-hot
allocation saved only 0.13 ms end-to-end, so the pre-batching claim that
"~3 ms is allocation" needed a direct measurement; the split then showed
the scatter at 1.5 ms — which the source-frame-code kernel now removes.
The "alloc + code scatter" row reproduces the legacy scatter inline so
the saving stays measurable after the production path dropped it).

Run: PYTHONPATH=/root/repo:/root/.axon_site python results/rebuild3_phase_probe.py [N]
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

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
rho, cutoff, kt = 0.8, 2.5, 1.0
box = float((N / rho) ** (1.0 / 3.0))
gf = make_cell_grid_fn(box, cutoff, N, dim=3, rho=rho)
md = GridMD3(gf, dt=1e-3, compensated=True)
pos, vel = lattice(N, box, jax.random.PRNGKey(0), kt=kt)
s0 = md.init(pos, vel)
k, gate = md.auto_chunk_params(kt)
chunk = md.make_chunk_step(k, gate)


@jax.jit
def equil(s):
    s = jax.lax.fori_loop(0, 800 // k, lambda i, t: chunk(t), s)
    return s, md.kinetic_energy(s)


s = s0
for _ in range(3):
    s, ke = equil(s)
    _ = float(ke)
s = s.replace(overflow=jnp.zeros((), bool))
print(f"state: kT ~ {float(ke) / (1.5 * N):.3f}, max_occ={int(s.max_occ)}")

REPS = 30


def timed(label, fn):
    out = fn(s)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(s)
        _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    ms = max(best - LAT, 1e-9) / REPS * 1e3
    print(f"{label:28s}: {ms:7.4f} ms")
    return ms


# phase 1: allocation only (chained REPS times; the accumulator consumes
# the WHOLE dest/code arrays so no phase can be dead-code-eliminated, and
# each iteration's input depends on the previous accumulator so iterations
# cannot be CSE'd)
@jax.jit
def alloc_only(st):
    def body(i, acc):
        xw, yw, zw, scode, occ, dest, ovf = md._migration_dest3(
            st.replace(xg=st.xg + acc * 1e-12)
        )
        return acc * 1e-12 + jnp.sum(dest.astype(jnp.float32)) + jnp.sum(
            scode.astype(jnp.float32)
        )

    return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))


# phase 1+2: allocation + code-grid scatter
@jax.jit
def alloc_scatter(st):
    def body(i, acc):
        xw, yw, zw, scode, occ, dest_flat, ovf = md._migration_dest3(
            st.replace(xg=st.xg + acc * 1e-12)
        )
        # legacy target-frame scatter, kept for the A/B
        code_grid = (
            jnp.full((md.size + 1,), -1, jnp.int32)
            .at[dest_flat]
            .set(scode.reshape(-1), mode="drop", unique_indices=True)[: md.size]
        )
        return acc * 1e-12 + jnp.sum(code_grid.astype(jnp.float32))

    return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))


# full rebuild
@jax.jit
def full_rebuild(st):
    def body(i, t):
        return md._rebuild_migrate(t.replace(time=t.time + 1e-6))

    return jax.lax.fori_loop(0, REPS, body, st)  # full state out: no DCE


t_alloc = timed("allocation (_migration_dest3)", alloc_only)
t_as = timed("allocation + legacy scatter", alloc_scatter)
t_full = timed("full rebuild (scatter-free)", full_rebuild)
print(
    f"split: alloc {t_alloc:.3f} / legacy scatter (removed) "
    f"{t_as - t_alloc:.3f} / migrate-kernel+rest {t_full - t_alloc:.3f} ms"
)
