"""3D default-config throughput: what `jtps md --dim 3` users get.

Round-4 landed (a) the compacted-mover migrate kernel and (b) the
auto-geometry default (lj_fluid.resolve_skin picks the densest cell grid,
cps19/skin 0.1316 at N=100k; cell_pallas3 defaults b_chunk=8 at cap<=32).
geom3_probe measured the levers with explicit skin/chunk overrides; this
probe measures the DEFAULT path — MDConfig(n, dim=3) with skin=None, no
chunk overrides — through rescaling equilibration and the cond-free
production driver.

Run: PYTHONPATH=/root/repo:/root/.axon_site python results/md3_default_probe.py [N]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from jax_tpus_benchmark_physics_simulation_tpu.core.config import MDConfig, override
from jax_tpus_benchmark_physics_simulation_tpu.models import lj_fluid
from jax_tpus_benchmark_physics_simulation_tpu.ops.kernels.cell_dense import (
    make_cell_grid_fn,
)
from jax_tpus_benchmark_physics_simulation_tpu.ops.kernels.grid_md3 import GridMD3

_null = jax.jit(lambda x: x + 1.0)
_ = float(_null(jnp.zeros(())))
LAT = float("inf")
for _ in range(5):
    _t0 = time.perf_counter()
    _ = float(_null(jnp.zeros(())))
    LAT = min(LAT, time.perf_counter() - _t0)
print(f"null-dispatch latency: {LAT * 1e3:.2f} ms (subtracted)")


def lattice(n, box, key, kt=1.0):
    per = int(np.ceil(n ** (1.0 / 3.0)))
    sp = box / per
    g = jnp.arange(per, dtype=jnp.float32) * sp + 0.5 * sp
    mesh = jnp.stack(jnp.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)[:n]
    pos = jnp.mod(mesh + 0.05 * jax.random.normal(key, mesh.shape), box)
    vel = np.sqrt(kt) * jax.random.normal(jax.random.fold_in(key, 1), (n, 3))
    return pos, vel


N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
cfg = override(MDConfig(), n=N, dim=3, rho=0.8, cutoff=2.5, init="lattice")
skin = lj_fluid.resolve_skin(cfg, "grid", n_devices=1)
gf = make_cell_grid_fn(cfg.box_size, cfg.cutoff, N, dim=3, rho=cfg.rho, skin=skin)
md = GridMD3(gf, dt=cfg.dt, compensated=True, static_cov="auto")  # lj_fluid default
k, gate = md.auto_chunk_params(cfg.kt)
print(
    f"default geometry: cps={md.cps} cap={md.cap} skin={skin:.4f} "
    f"auto=(k={k}, gate={gate})"
)

pos, vel = lattice(N, cfg.box_size, jax.random.PRNGKey(0), kt=cfg.kt)
chunk = md.make_chunk_step(k, gate)


@jax.jit
def equil(s):
    s = jax.lax.fori_loop(0, max(1, 800 // k), lambda i, t: chunk(t), s)
    return s, md.kinetic_energy(s)


s = md.init(pos, vel)
for _ in range(4):  # velocity-rescaling equilibration (lj_fluid protocol)
    s, ke = equil(s)
    scale = np.sqrt(cfg.kt / (float(ke) / (1.5 * N)))
    zeros = jnp.zeros_like(s.vxg)
    comp = dict(cvx=zeros, cvy=zeros, cvz=zeros) if s.cvx is not None else {}
    s = s.replace(vxg=s.vxg * scale, vyg=s.vyg * scale, vzg=s.vzg * scale, **comp)
s, ke = equil(s)
print(
    f"equilibrated: kT ~ {float(ke) / (1.5 * N):.3f} max_occ={int(s.max_occ)} "
    f"overflow={bool(s.overflow)}"
)
assert not bool(s.overflow)

STEPS = max(400, 4 * k)
R = md.auto_cadence(cfg.kt)
print(f"static_cov={md.static_cov} auto_cadence={R}")
drivers = [
    ("gated cond-free", md.make_production_run(STEPS, k, gate_frac=gate)),
    ("fixed-cadence", md.make_production_run_fixed(STEPS, R)),
]
for label, prod in drivers:

    @jax.jit
    def run(st, prod=prod):
        st = prod(st)
        return st, md.kinetic_energy(st)

    out, _ke = run(s)
    _ = float(_ke)  # hard scalar sync before the timed reps
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out, _ke = run(s)
        _ = float(_ke)
        best = min(best, time.perf_counter() - t0)
    t_step = max(best - LAT, 1e-9) / STEPS
    assert not bool(out.overflow), f"violation flag raised during timing ({label})"
    print(
        f"production ({label}, defaults): {t_step * 1e3:.4f} ms/step -> "
        f"{N / t_step / 1e6:.1f}M psps"
    )
