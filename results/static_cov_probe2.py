"""Static-cov production trims: rebuild k_mov, hybrid-window cond, window
prologue cost.

Probe 1 (results/static_cov_probe.py) measured the straight-line static
kernel at cps19/N=100k: window 0.696 -> 0.556 ms/step (24,24), production
0.844 -> 0.717 (139.5M psps). The 150M bar needs ~0.667; the remaining
0.16 ms/step of non-window cost splits into rebuild (1.11 ms / 9.5-step
cadence = 0.117) and window/driver overhead (~0.04 at k=1). This probe
measures the next three levers on the same equilibrated state:

1. migrate_k_mov 16 -> 8: the compacted-mover rebuild scans K candidate
   sublane slots per direction; movers per cell per direction are ~0-2 at
   this cadence, so K=8 should halve the mover-scan cost. Guarded by the
   loud mov_of flag.
2. hybrid window: lax.cond(max_occ <= cov, static_window, dynamic_window).
   The production default needs a fallback for the rare rebuild with
   mo > cov (Gaussian-tail estimate: a 100k-step run sees mo 25-26 at
   least once); the question is what the per-window cond costs when the
   predicate is a ready scalar (the rebuild-gate cond measured ~0.2
   ms/step, but its predicate serializes on the window's dmax2).
3. window n_inner=1 vs n_inner=10 per-step cost: the difference is the
   per-window prologue/epilogue (half-step velocity conversions, dmax
   reduction) — if > ~0.02 ms it motivates a leapfrog-persistent driver.

Run: PYTHONPATH=/root/repo:/root/.axon_site python results/static_cov_probe2.py [N]
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

NW = max(1, 400 // k)
STEPS = NW * k


def prod_time(md, label, window=None):
    if window is None:
        prod = md.make_production_run(STEPS, k, gate_frac=gate)
    else:
        # cond-free nested-while driver with an injected window
        def prod(s):
            def inner_cond(c):
                t, done = c
                return (done < STEPS) & ~md._needs_rebuild(t, frac=gate)

            def inner_body(c):
                t, done = c
                return window(t), done + k

            def outer_body(c):
                c = jax.lax.while_loop(inner_cond, inner_body, c)
                t, done = c
                return md._rebuild_migrate(t), done

            s, _ = jax.lax.while_loop(
                lambda c: c[1] < STEPS, outer_body, (s, jnp.zeros((), jnp.int32))
            )
            return s

    @jax.jit
    def run_prod(s):
        s = prod(s)
        return s, md.kinetic_energy(s)

    t, out = timed(run_prod, s_hot)
    t_step = t / STEPS
    print(
        f"production {label:32s}: {t_step * 1e3:7.4f} ms/step -> "
        f"{N / t_step / 1e6:6.1f}M psps  (overflow={bool(out[0].overflow)})"
    )
    return t_step


kw = dict(dt=1e-3, compensated=True, a_chunk=cov, b_chunk=cov, static_cov=cov)
md_s16 = GridMD3(gf, migrate_k_mov=16, **kw)
md_s8 = GridMD3(gf, migrate_k_mov=8, **kw)
md_d = GridMD3(gf, dt=1e-3, compensated=True, a_chunk=8, b_chunk=8,
               migrate_k_mov=8)

prod_time(md_s16, f"static({cov},{cov}) k_mov=16")
prod_time(md_s8, f"static({cov},{cov}) k_mov=8")

# hybrid window: static fast path, dynamic fallback when mo > cov.
# Use the DYNAMIC engine's rebuild (no cov guard on overflow).
w_s = md_s8._make_window(md_s8.force_kernel, k)
w_d = md_d._make_window(md_d.force_kernel, k)


def hybrid_window(s):
    return jax.lax.cond(s.max_occ <= cov, w_s, w_d, s)


prod_time(md_d, "hybrid (cond static/dynamic)", window=hybrid_window)

# window prologue cost: per-step time at n_inner=1 vs n_inner=10
for ni in (1, 10):
    w = md_s8._make_window(md_s8.force_kernel, ni)
    reps = max(1, 400 // ni)

    @jax.jit
    def run_w(s, w=w, reps=reps):
        s = jax.lax.fori_loop(0, reps, lambda i, t: w(t), s)
        return s, md_s8.kinetic_energy(s)

    t, out = timed(run_w, s_hot)
    print(
        f"window n_inner={ni:2d}: {t / (reps * ni) * 1e3:7.4f} ms/step "
        f"(overflow={bool(out[0].overflow)} — expected True at ni*reps >> cadence)"
    )
