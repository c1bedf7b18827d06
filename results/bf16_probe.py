"""bf16 matmul-chain investigation (round-2 VERDICT next item 6).

Committed numbers: f32 compound chain 95.5 XLA-TFLOPS (~97% of the ~98 f32
peak) but bf16 136.3 of ~197 (69%). Two hypotheses: (a) the chain's
elementwise/transcendental tail is constant-time while the matmul halves, so
the tail fraction doubles; (b) the bf16 matmuls themselves are off peak at
this sizing. This probe times, at the bench sizing (4096^2) and at 8192^2:

  dot        — one bare jnp.dot per iteration
  chain      — the reference compound op (bench/ops.op_2d)
  dot2       — the chain's two matmuls only (no transcendental tail)

Printing achieved TFLOPS for each separates (a) from (b) directly.

Run: python results/bf16_probe.py
"""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from jax_tpus_benchmark_physics_simulation_tpu.bench import ops as ops_mod

STEPS = 150

_null = jax.jit(lambda x: x + 1.0)
_ = float(_null(jnp.zeros(())))
LAT = float("inf")
for _ in range(5):
    _t0 = time.perf_counter()
    _ = float(_null(jnp.zeros(())))
    LAT = min(LAT, time.perf_counter() - _t0)
print(f"null-dispatch latency: {LAT * 1e3:.2f} ms (subtracted)")


def timed(fn, *args):
    c = jax.jit(fn)
    _ = float(c(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(c(*args))
        best = min(best, time.perf_counter() - t0)
    return max(best - LAT, 1e-9) / STEPS


def loop(op):
    def fn(a, b):
        def body(i, x):
            out = op(x, b)
            return a + (jnp.sum(out) * 1e-30).astype(a.dtype)

        return jnp.sum(jax.lax.fori_loop(0, STEPS, body, a))

    return fn


def probe(n, dtype, label):
    ka, kb = jax.random.split(jax.random.PRNGKey(0))
    a = jax.random.normal(ka, (n, n), dtype)
    b = jax.random.normal(kb, (n, n), dtype)
    jax.block_until_ready((a, b))

    t_dot = timed(loop(lambda x, y: jnp.dot(x, y)), a, b)
    t_dot2 = timed(loop(lambda x, y: jnp.dot(x, jnp.dot(x, y))), a, b)
    t_chain = timed(loop(ops_mod.op_2d), a, b)

    f1 = 2 * n**3
    print(f"{label} n={n}: dot {t_dot * 1e3:7.3f} ms = {f1 / t_dot / 1e12:6.1f} TF | "
          f"dot^2 {t_dot2 * 1e3:7.3f} ms = {2 * f1 / t_dot2 / 1e12:6.1f} TF | "
          f"chain {t_chain * 1e3:7.3f} ms = {2.2 * f1 / t_chain / 1e12:6.1f} TF "
          f"(tail = {(t_chain - t_dot2) * 1e3:.3f} ms)")


for n in (4096, 8192):
    probe(n, jnp.float32, "f32 ")
    probe(n, jnp.bfloat16, "bf16")
