"""Characterize the TPU row-scatter that dominates grid-MD rebuilds.

At N=100k (248k slot rows, 13 f32 cols) the migration scatter costs
~5 ms; at N=1M (2.48M rows) it costs ~246 ms — 48x for 10x rows. This
probe separates the candidate mechanisms by scattering a (rows, F) value
block with different destination patterns:

  identity    — dest[i] = i (perfect locality, same descriptor count)
  local       — dest[i] = i +- one cell-row (the migration's true pattern)
  random      — dest[i] = global permutation (worst locality)
  dropped90   — 90% of rows dest=rows (dropped), 10% local (the
                incremental-rebuild candidate: does dropping rows help?)

and at F in {13, 4, 1} to separate per-row descriptor cost from byte cost.

Run: PYTHONPATH=/root/repo:/root/.axon_site python results/scatter_probe.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

lat_c = jax.jit(lambda x: x + 1.0)
_ = float(lat_c(jnp.zeros(())))
LAT = float("inf")
for _ in range(5):
    t0 = time.perf_counter()
    _ = float(lat_c(jnp.zeros(())))
    LAT = min(LAT, time.perf_counter() - t0)
print(f"latency {LAT * 1e3:.2f} ms")

R = 8  # chained scatters per dispatch


def timed(fn, *args):
    c = jax.jit(fn)
    out = c(*args)
    jax.block_until_ready(out)
    _ = float(out.reshape(-1)[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = c(*args)
        _ = float(out.reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    return (best - LAT) / R


def probe(rows, F, row_span):
    key = jax.random.PRNGKey(0)
    vals = jax.random.normal(key, (rows, F), jnp.float32)
    base = jnp.zeros((rows + 1, F), jnp.float32)

    idx_id = jnp.arange(rows, dtype=jnp.int32)
    # local: permute within bands of row_span (the +-1-cell-row pattern)
    n_bands = rows // row_span
    perm_local = (
        jax.random.permutation(
            jax.random.PRNGKey(1),
            jnp.arange(rows, dtype=jnp.int32).reshape(n_bands, row_span),
            axis=1, independent=True,
        ).reshape(-1)
    )
    perm_rand = jax.random.permutation(jax.random.PRNGKey(2), rows).astype(jnp.int32)
    drop = jnp.where(
        jax.random.uniform(jax.random.PRNGKey(3), (rows,)) < 0.9,
        rows,
        perm_local,
    ).astype(jnp.int32)

    def run(dest, vals):
        def body(i, v):
            out = base.at[dest].set(v, mode="drop", unique_indices=True)
            return out[:rows] + 1e-30
        return jax.lax.fori_loop(0, R, body, vals)

    for name, dest in [("identity", idx_id), ("local", perm_local),
                       ("random", perm_rand), ("dropped90", drop)]:
        t = timed(run, dest, vals)
        mb = rows * F * 4 / 2**20
        print(f"rows={rows:>9,} F={F:2d} {name:10s}: {t * 1e3:8.3f} ms "
              f"({rows / t / 1e6:7.1f}M rows/s, {mb / t / 1024:6.1f} GB/s payload)")


for rows in (247_808, 2_478_080):
    for F in (13, 4):
        probe(rows, F, row_span=2816 * 16 if rows > 1e6 else 2048)
    print()


def probe_banded(rows, F, band_rows, W):
    """Banded scatter: B block-aligned target bands, each fed only the
    source slice [k*T - W, (k+1)*T + W) (migration locality: dest is within
    W rows of the source row). Wrap halos via a +W-shifted extended copy."""
    key = jax.random.PRNGKey(0)
    vals = jax.random.normal(key, (rows, F), jnp.float32)
    n_bands = rows // band_rows
    perm_local = (
        jax.random.permutation(
            jax.random.PRNGKey(1),
            jnp.arange(rows, dtype=jnp.int32).reshape(rows // 2048, 2048),
            axis=1, independent=True,
        ).reshape(-1)
    )

    T = band_rows

    def run(dest, vals):
        def body(i, v):
            ext_v = jnp.concatenate([v[-W:], v, v[:W]], axis=0)
            ext_d = jnp.concatenate([dest[-W:], dest, dest[:W]], axis=0)
            outs = []
            for k in range(n_bands):
                sv = jax.lax.dynamic_slice(ext_v, (k * T, 0), (T + 2 * W, F))
                sd = jax.lax.dynamic_slice(ext_d, (k * T,), (T + 2 * W,))
                ld = sd - k * T
                ld = jnp.where((ld >= 0) & (ld < T), ld, T)
                band = jnp.zeros((T + 1, F), jnp.float32)
                outs.append(
                    band.at[ld].set(sv, mode="drop", unique_indices=True)[:T]
                )
            return jnp.concatenate(outs, axis=0) + 1e-30

        return jax.lax.fori_loop(0, R, body, vals)

    t = timed(run, perm_local, vals)
    print(f"rows={rows:>9,} F={F:2d} banded({n_bands:2d}x{T // 1000}k,W={W // 1000}k): "
          f"{t * 1e3:8.3f} ms ({rows / t / 1e6:7.1f}M rows/s)")


for band_rows, W in ((154_880, 45_056), (309_760, 45_056), (77_440, 45_056)):
    probe_banded(2_478_080, 13, band_rows, W)
