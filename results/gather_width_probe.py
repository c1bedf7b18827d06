"""Row gather/scatter rate vs row width F on v5e — is the slot permutation
descriptor-bound (rate ~ rows/s regardless of F) or byte-bound (rate ~ GB/s,
so padding rows to a full 512 B vreg hits a fast path)?

rebuild_phase_probe measured the (2.48M, 12) row gather at ~25M rows/s
(1.2 GB/s payload) — the N=1M rebuild's entire cost. If F=128 gathers at
HBM-ish GB/s, the fix is padding the permutation buffer; if rows/s is flat
in F, the fix is a dense select-based permute.

Also probes: near-identity indices (85% identity / 15% local moves — the
real migration pattern) vs fully-local-permuted, to see whether locality or
identity helps at all.

Run: PYTHONPATH=/root/repo:/root/.axon_site python results/gather_width_probe.py
"""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

_null = jax.jit(lambda x: x + 1.0)
_ = float(_null(jnp.zeros(())))
LAT = float("inf")
for _ in range(5):
    _t0 = time.perf_counter()
    _ = float(_null(jnp.zeros(())))
    LAT = min(LAT, time.perf_counter() - _t0)
print(f"null-dispatch latency: {LAT * 1e3:.2f} ms (subtracted)")

R = 8
ROWS = 2_478_080  # the N=1M 2D slot count


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


# local permutation within 45k-row bands (the +-1-cell-row migration span)
BAND = 45_056
perm_local = (
    jax.random.permutation(
        jax.random.PRNGKey(1),
        jnp.arange(ROWS, dtype=jnp.int32).reshape(ROWS // 2048, 2048),
        axis=1,
        independent=True,
    ).reshape(-1)
)
ident = jnp.arange(ROWS, dtype=jnp.int32)
near_id = jnp.where(
    jax.random.uniform(jax.random.PRNGKey(2), (ROWS,)) < 0.85, ident, perm_local
)
jax.block_until_ready((perm_local, near_id))

for F in (12, 32, 64, 128):
    vals = jax.random.normal(jax.random.PRNGKey(0), (ROWS + 1, F), jnp.float32)
    jax.block_until_ready(vals)

    def g(ve, idx):
        def body(i, ve):
            out = jnp.take(ve, idx, axis=0)
            out = jax.lax.optimization_barrier(out)
            return ve.at[: ROWS].set(out * 1.0)

        return jax.lax.fori_loop(0, R, body, ve)

    for name, idx in (("local", perm_local), ("near-id", near_id)):
        t = timed(lambda ve, idx=idx: g(ve, idx), vals)
        payload = ROWS * F * 4
        print(
            f"gather  F={F:3d} {name:8s}: {t * 1e3:8.3f} ms "
            f"({ROWS / t / 1e6:7.1f}M rows/s, {payload / t / 2**30:6.1f} GB/s)"
        )

    def sc(ve, idx):
        src = ve[: ROWS]

        def body(i, src):
            out = jnp.zeros((ROWS + 1, F), jnp.float32).at[idx].set(
                src, mode="drop", unique_indices=True
            )
            return out[: ROWS] + 1e-30

        return jax.lax.fori_loop(0, R, body, src)

    t = timed(lambda ve: sc(ve, perm_local), vals)
    print(
        f"scatter F={F:3d} local   : {t * 1e3:8.3f} ms "
        f"({ROWS / t / 1e6:7.1f}M rows/s, {ROWS * F * 4 / t / 2**30:6.1f} GB/s)"
    )
