"""Collective traffic of the sharded grid engines, from the COMPILER.

Round-2 VERDICT missing item 2 / next item 5: the committed 8-chip scaling
story was an extrapolation. This probe measures what a 1-chip environment CAN
measure: for 2, 4, 8 virtual devices, compile the sharded 2D engine's chunk
step and count the bytes moved by every collective instruction in the
optimized HLO (collective-permute = the halo/reaction ppermutes;
all-reduce = the pmax monitor + rebuild psums). Bytes ride ICI on a real
slice — dividing by the per-step wall time from the real-chip overhead run
(see RESULTS "measured sharding overhead") bounds the ICI bandwidth needed
for the 8-chip projection.

Run on CPU (no TPU contact): python results/collective_bytes_probe.py
"""

import os
import re
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from jax_tpus_benchmark_physics_simulation_tpu.ops.kernels.cell_dense import (
    make_cell_grid_fn,
)
from jax_tpus_benchmark_physics_simulation_tpu.ops.kernels.grid_md import GridMD
from jax_tpus_benchmark_physics_simulation_tpu.parallel.grid_md_sharded import (
    ShardedGridMD,
)
from jax_tpus_benchmark_physics_simulation_tpu.parallel.mesh import make_mesh

DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1, "f64": 8,
               "s64": 8, "u8": 1}
SHAPE_RE = re.compile(r"(f32|bf16|s32|u32|pred|f64|s64|u8)\[([0-9,]*)\]")


def collective_bytes(hlo_text: str) -> dict:
    """Sum output bytes of collective instructions in optimized HLO."""
    out = {}
    for line in hlo_text.splitlines():
        s = line.strip()
        m = re.match(r"^(?:ROOT )?%?[\w.-]+ = (.+?) (collective-permute|"
                     r"all-reduce|all-gather|all-to-all|reduce-scatter)", s)
        if not m:
            continue
        kind = m.group(2)
        shapes = SHAPE_RE.findall(m.group(1))
        nbytes = 0
        for dt, dims in shapes:
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            nbytes += n * DTYPE_BYTES[dt]
        out[kind] = out.get(kind, 0) + nbytes
    return out


def lattice(n, box, key, dim=2, kt=1.0):
    per = int(np.ceil(n ** (1.0 / dim)))
    sp = box / per
    g = jnp.arange(per, dtype=jnp.float32) * sp + 0.5 * sp
    mesh = jnp.stack(jnp.meshgrid(*([g] * dim), indexing="ij"), -1).reshape(-1, dim)[:n]
    pos = jnp.mod(mesh + 0.05 * jax.random.normal(key, mesh.shape), box)
    vel = np.sqrt(kt) * jax.random.normal(jax.random.fold_in(key, 1), (n, dim))
    return pos, vel


def probe(n_dev: int, n_inner: int = 10):
    # N=100k-scale 2D config, rows divisible by every mesh size
    N, rho, cutoff = 100_000, 0.8, 2.5
    box = float(np.sqrt(N / rho))
    gf = make_cell_grid_fn(box, cutoff, N, dim=2, rho=rho)
    cps = gf.cells_per_side
    if cps % n_dev:
        # shrink to divisible rows exactly like parallel.scaling does
        from jax_tpus_benchmark_physics_simulation_tpu.core.config import MDConfig, override
        from jax_tpus_benchmark_physics_simulation_tpu.parallel.scaling import (
            _round_to_divisible_n,
        )

        N = _round_to_divisible_n(N, override(MDConfig(), n=N, rho=rho, cutoff=cutoff, dim=2), [n_dev])
        box = float(np.sqrt(N / rho))
        gf = make_cell_grid_fn(box, cutoff, N, dim=2, rho=rho)

    mesh = make_mesh(n_dev, axis_name="x")
    local = GridMD(gf, dt=1e-3, rows_per_block=1)
    md = ShardedGridMD(gf, mesh, dt=1e-3)
    pos, vel = lattice(N, box, jax.random.PRNGKey(0), dim=2)
    gs = md.shard_state(local.init(pos, vel))

    # per-STEP collectives: the window-only program (halo ppermutes + pmax)
    step_cb = collective_bytes(jax.jit(md.step_nocheck).lower(gs).compile().as_text())
    # per-CHUNK collectives: adds the conditional GSPMD migration rebuild
    chunk_cb = collective_bytes(
        jax.jit(md.make_chunk_step(n_inner)).lower(gs).compile().as_text()
    )
    step_total = sum(step_cb.values())
    rebuild_total = sum(chunk_cb.values()) - n_inner * step_total
    print(f"devices={n_dev}: N={N:,} cps={gf.cells_per_side}")
    print(f"  window step : {step_total / 2**10:8.1f} KiB/step  ("
          + ", ".join(f"{k}={v / 2**10:.1f}KiB" for k, v in sorted(step_cb.items()) if v)
          + ")")
    print(f"  rebuild     : {max(rebuild_total, 0) / 2**20:8.3f} MiB/rebuild "
          f"(amortized over the ~{n_inner}-step gate window; executed only "
          f"when the skin gate trips)")
    return {"devices": n_dev, "n": N, "step_bytes": step_total,
            "rebuild_bytes": max(rebuild_total, 0)}


if __name__ == "__main__":
    rows = [probe(d) for d in (2, 4, 8)]
    # ICI context: v5e ICI ~ 400 GB/s aggregate per chip. Halo traffic per
    # step is KiB-scale -> microseconds; the rebuild's MiB-scale all-gather
    # amortizes over the gate window. Print the implied per-step ICI time at
    # 400 GB/s so the 8-chip projection has a measured communication bound.
    for r in rows:
        t_step = r["step_bytes"] / 400e9
        t_reb = r["rebuild_bytes"] / 400e9
        print(f"devices={r['devices']}: ICI time ~{t_step * 1e6:.2f} us/step "
              f"+ {t_reb * 1e6:.0f} us/rebuild (vs ~360 us/step compute at "
              f"N=100k single-chip)")
