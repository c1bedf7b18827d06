"""Occupancy census for candidate cell geometries + chunk-cond overhead A/B.

Round-4 kernel-geometry design inputs (VERDICT item 1: cut pair-test
redundancy):

1. For an EQUILIBRATED 3D N=100k liquid (kT=1, rho=0.8), what is the max
   cell occupancy over time for candidate binnings?
     - cps=17 cubic (current: edge 2.94, skin 0.44 budget)
     - cps=18 cubic (edge 2.78, skin 0.28)
     - cps=19 cubic (edge 2.63, skin 0.13)
     - 17x17x34 z-split (edge 2.94/2.94/1.47)
   The force kernel's dynamic chunk bound rounds max_occ up to the 8-aligned
   coverage, so the psps win of a finer geometry hinges on where max_occ
   lands relative to multiples of 8 (e.g. cps=19 only pays if max_occ <= 24).
   Max is tracked over ~10 snapshots spread over 2000 production steps.

2. What does the per-chunk `lax.cond` rebuild gate cost? The equilibrated
   accounting (results/equil_breakdown_probe{,3}.py) leaves ~0.04 ms/step
   (2D) / ~0.06 (3D) between window+amortized-rebuild and the production
   chunk. A/B: fori(window) vs fori(cond(never, rebuild, id) + window).

Run: python results/occupancy_census_probe.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from jax_tpus_benchmark_physics_simulation_tpu.ops.kernels.cell_dense import (
    make_cell_grid_fn,
)
from jax_tpus_benchmark_physics_simulation_tpu.ops.kernels.grid_md import GridMD
from jax_tpus_benchmark_physics_simulation_tpu.ops.kernels.grid_md3 import GridMD3

_null = jax.jit(lambda x: x + 1.0)
_ = float(_null(jnp.zeros(())))
LAT = float("inf")
for _ in range(5):
    _t0 = time.perf_counter()
    _ = float(_null(jnp.zeros(())))
    LAT = min(LAT, time.perf_counter() - _t0)
print(f"null-dispatch latency: {LAT * 1e3:.2f} ms (subtracted)")


def lattice(n, box, key, dim=3, kt=1.0):
    per = int(np.ceil(n ** (1.0 / dim)))
    sp = box / per
    g = jnp.arange(per, dtype=jnp.float32) * sp + 0.5 * sp
    mesh = jnp.stack(jnp.meshgrid(*([g] * dim), indexing="ij"), -1).reshape(-1, dim)[:n]
    pos = jnp.mod(mesh + 0.05 * jax.random.normal(key, mesh.shape), box)
    vel = np.sqrt(kt) * jax.random.normal(jax.random.fold_in(key, 1), (n, dim))
    return pos, vel


def census(pos_np, box, shape):
    """(mean, p99, max) occupancy for a (ncx, ncy, ncz) binning."""
    dims = len(shape)
    idx = np.zeros(len(pos_np), dtype=np.int64)
    for d in range(dims):
        c = np.clip((pos_np[:, d] * (shape[d] / box)).astype(np.int64), 0, shape[d] - 1)
        idx = idx * shape[d] + c
    counts = np.bincount(idx, minlength=int(np.prod(shape)))
    return counts.mean(), np.percentile(counts, 99), counts.max()


# ---- 1. equilibrate 3D N=100k and census snapshots -------------------------
N, rho, cutoff, kt = 100_000, 0.8, 2.5, 1.0
box = float((N / rho) ** (1.0 / 3.0))
gf = make_cell_grid_fn(box, cutoff, N, dim=3, rho=rho)
md = GridMD3(gf, dt=1e-3, compensated=True)
pos, vel = lattice(N, box, jax.random.PRNGKey(0), dim=3, kt=kt)
s = md.init(pos, vel)
k, gate = md.auto_chunk_params(kt)
chunk = jax.jit(md.make_chunk_step(k, gate))


@jax.jit
def burst(s):
    s = jax.lax.fori_loop(0, 200 // k, lambda i, t: chunk(t), s)
    return s, md.kinetic_energy(s)


# rescaling equilibration (3D melt self-heats; lj_fluid protocol)
for _ in range(5):
    for _ in range(4):
        s, ke = burst(s)
    kt_now = float(ke) / (1.5 * N)
    scale = np.sqrt(kt / kt_now)
    zeros = jnp.zeros_like(s.vxg)
    comp = dict(cvx=zeros, cvy=zeros, cvz=zeros) if s.cvx is not None else {}
    s = s.replace(vxg=s.vxg * scale, vyg=s.vyg * scale, vzg=s.vzg * scale, **comp)
for _ in range(4):
    s, ke = burst(s)
print(f"equilibrated: kT ~ {float(ke) / (1.5 * N):.3f}, max_occ={int(s.max_occ)}, "
      f"overflow={bool(s.overflow)}")

CANDS = [
    ("cps17 cubic (current)", (17, 17, 17)),
    ("cps18 cubic", (18, 18, 18)),
    ("cps19 cubic", (19, 19, 19)),
    ("17x17x34 z-split", (17, 17, 34)),
    ("19x19x17", (19, 19, 17)),
]
stats = {name: [] for name, _ in CANDS}
for snap in range(10):
    s, ke = burst(s)
    pos_np = np.asarray(md.positions(s))
    for name, shape in CANDS:
        stats[name].append(census(pos_np, box, shape))

print(f"\n== 3D N=100k occupancy census (10 snapshots x {200}steps, kT="
      f"{float(ke) / (1.5 * N):.3f}) ==")
print(f"{'geometry':26s} {'mean':>6s} {'p99':>6s} {'max(t)':>7s} {'cov8':>5s}")
for name, shape in CANDS:
    arr = np.array(stats[name])
    mx = int(arr[:, 2].max())
    cov = ((mx + 7) // 8) * 8
    print(f"{name:26s} {arr[0, 0]:6.2f} {arr[:, 1].max():6.1f} {mx:7d} {cov:5d}")

# ---- 2. chunk-cond overhead A/B (3D, same state) ----------------------------
window = md._make_window(md.force_kernel, k)
never = jnp.asarray(False)


def chunk_nocond(s):
    return window(s)


def chunk_falsecond(s):
    s = jax.lax.cond(never & md._needs_rebuild(s, frac=gate),
                     md._rebuild_migrate, lambda t: t, s)
    return window(s)


def timed_loop(step_fn, s, nw, reps=3):
    @jax.jit
    def run(s):
        s = jax.lax.fori_loop(0, nw, lambda i, t: step_fn(t), s)
        return s, md.kinetic_energy(s)

    out = run(s)
    _ = float(out[1])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(s)
        _ = float(out[1])
        best = min(best, time.perf_counter() - t0)
    return max(best - LAT, 1e-9) / (nw * k)


NW = max(1, 400 // k)
s = s.replace(overflow=jnp.zeros((), bool))
t_a = timed_loop(chunk_nocond, s, NW)
t_b = timed_loop(chunk_falsecond, s, NW)
t_c = timed_loop(md.make_chunk_step(k, gate), s, NW)
print(f"\n== 3D chunk-cond overhead (k={k}) ==")
print(f"A fori(window)             : {t_a * 1e3:7.4f} ms/step")
print(f"B + cond(never, rebuild)   : {t_b * 1e3:7.4f} ms/step  (cond tax "
      f"{(t_b - t_a) * 1e3:+.4f})")
print(f"C production chunk         : {t_c * 1e3:7.4f} ms/step  (gate+rebuild "
      f"{(t_c - t_a) * 1e3:+.4f})")

# ---- 3. same A/B in 2D ------------------------------------------------------
box2 = float(np.sqrt(N / rho))
gf2 = make_cell_grid_fn(box2, cutoff, N, dim=2, rho=rho)
md2 = GridMD(gf2, dt=1e-3, compensated=True)
pos2, vel2 = lattice(N, box2, jax.random.PRNGKey(1), dim=2, kt=kt)
s2 = md2.init(pos2, vel2)
k2, gate2 = md2.auto_chunk_params(kt)
chunk2 = jax.jit(md2.make_chunk_step(k2, gate2))


@jax.jit
def burst2(s):
    s = jax.lax.fori_loop(0, 800 // k2, lambda i, t: chunk2(t), s)
    return s, md2.kinetic_energy(s)


for _ in range(3):
    s2, ke2 = burst2(s2)
print(f"\n2D equilibrated: kT ~ {float(ke2) / (1.0 * N):.3f}")
s2 = s2.replace(overflow=jnp.zeros((), bool))

window2 = md2._make_window(md2.force_kernel, k2)


def chunk2_nocond(s):
    return window2(s)


def chunk2_falsecond(s):
    s = jax.lax.cond(never & md2._needs_rebuild(s, frac=gate2),
                     md2._rebuild_migrate, lambda t: t, s)
    return window2(s)


def timed_loop2(step_fn, s, nw, reps=3):
    @jax.jit
    def run(s):
        s = jax.lax.fori_loop(0, nw, lambda i, t: step_fn(t), s)
        return s, md2.kinetic_energy(s)

    out = run(s)
    _ = float(out[1])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(s)
        _ = float(out[1])
        best = min(best, time.perf_counter() - t0)
    return max(best - LAT, 1e-9) / (nw * k2)


NW2 = max(1, 400 // k2)
t2_a = timed_loop2(chunk2_nocond, s2, NW2)
t2_b = timed_loop2(chunk2_falsecond, s2, NW2)
t2_c = timed_loop2(md2.make_chunk_step(k2, gate2), s2, NW2)
print(f"== 2D chunk-cond overhead (k={k2}) ==")
print(f"A fori(window)             : {t2_a * 1e3:7.4f} ms/step")
print(f"B + cond(never, rebuild)   : {t2_b * 1e3:7.4f} ms/step  (cond tax "
      f"{(t2_b - t2_a) * 1e3:+.4f})")
print(f"C production chunk         : {t2_c * 1e3:7.4f} ms/step  (gate+rebuild "
      f"{(t2_c - t2_a) * 1e3:+.4f})")

# 2D occupancy alternatives at N=100k (for completeness)
pos2_np = np.asarray(md2.positions(s2))
print(f"\n== 2D N=100k occupancy (single snapshot) ==")
for name, shape in [("cps121 (current)", (121, 121)), ("cps112", (112, 112)),
                    ("cps100", (100, 100))]:
    m, p, mx = census(pos2_np, box2, shape)
    print(f"{name:26s} mean {m:5.2f}  p99 {p:5.1f}  max {int(mx):3d}")
