"""VPU op-rate probe: per-op issue cost of the exact ops the grid kernels'
pair math uses, measured as Pallas in-VMEM op chains (same harness as
results/kernel_roofline_probe.py).

Questions this answers (round-4 kernel-trim design inputs):
1. does bf16 elementwise double the VPU issue rate on this chip (packed
   SIMD), or run at the f32 rate?
2. what does an f32 divide cost relative to a mul/FMA, and what do
   pl.reciprocal(approx=True/False) and rsqrt cost?
3. do compare+select chains fuse (what does the cutoff-mask pattern cost)?

Run: python results/vpu_oprate_probe.py
"""

import functools
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STEPS = 400
KC = 64  # chain ops per element per accumulator stream
BLK = (512, 128)
NBLK = 16

_null = jax.jit(lambda x: x + 1.0)
_ = float(_null(jnp.zeros(())))
LAT = float("inf")
for _ in range(5):
    _t0 = time.perf_counter()
    _ = float(_null(jnp.zeros(())))
    LAT = min(LAT, time.perf_counter() - _t0)
print(f"null-dispatch latency: {LAT * 1e3:.2f} ms (subtracted)")


def timeit(fn, *args, reps=3):
    c = jax.jit(fn)
    _ = float(c(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(c(*args))
        best = min(best, time.perf_counter() - t0)
    return max(best - LAT, 1e-9) / STEPS


def chain_rate(op, dtype=jnp.float32, streams=4, kc=KC):
    """G op-invocations/s for a `streams`-wide, `kc`-deep chain of `op`."""

    def kernel(x_ref, o_ref):
        v = x_ref[...]
        accs = [v + jnp.asarray(0.01 * i, dtype) for i in range(streams)]
        for _ in range(kc):
            accs = [op(a) for a in accs]
        out = accs[0]
        for a in accs[1:]:
            out = out + a
        o_ref[...] = out

    call = pl.pallas_call(
        kernel,
        grid=(NBLK,),
        in_specs=[pl.BlockSpec(BLK, lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(BLK, lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NBLK * BLK[0], BLK[1]), dtype),
    )
    x = (
        jax.random.uniform(jax.random.PRNGKey(0), (NBLK * BLK[0], BLK[1]), jnp.float32)
        + 0.5
    ).astype(dtype)

    def loop(x):
        def body(i, v):
            return call(v)

        return jnp.sum(jax.lax.fori_loop(0, STEPS, body, x).astype(jnp.float32))

    t = timeit(loop, x)
    n_invocations = x.size * streams * kc
    return n_invocations / t / 1e9


def report(name, op, dtype=jnp.float32, **kw):
    r = chain_rate(op, dtype=dtype, **kw)
    print(f"{name:34s}: {r:8.1f} G op/s")
    return r


print("== per-op chains (invocations/s; mul baseline ~ 1 issue/op) ==")
mul_f32 = report("f32 mul", lambda a: a * 1.0000001)
report("f32 fma (a*c1+c2)", lambda a: a * 1.0000001 + 1e-30)
report("bf16 mul", lambda a: a * jnp.bfloat16(1.0078), dtype=jnp.bfloat16)
report("bf16 fma", lambda a: a * jnp.bfloat16(1.0078) + jnp.bfloat16(1e-30),
       dtype=jnp.bfloat16)
div = report("f32 divide (1.0000001/a)", lambda a: 1.0000001 / a)
rec_e = report("pl.reciprocal exact", lambda a: pl.reciprocal(a, approx=False))
rec_a = report("pl.reciprocal approx", lambda a: pl.reciprocal(a, approx=True))


def recip_nr(a):
    y = pl.reciprocal(a, approx=True)
    return y * (2.0 - a * y)


report("approx recip + 1 NR (3 ops)", recip_nr)
report("lax.rsqrt", jax.lax.rsqrt)
report("rsqrt^2 (rsqrt+mul)", lambda a: jax.lax.rsqrt(a) * jax.lax.rsqrt(a))

# the kernel's mask pattern: 2 cmp + and + select (4 naive ops)
def mask4(a):
    valid = (a < 1e30) & (a > 0.0)
    return jnp.where(valid, a * 1.0000001, 0.5)


report("cmp,cmp,and,select (4 naive)", mask4)


def mask2(a):
    return jnp.where(a < 1e30, a * 1.0000001, 0.5)


report("cmp,select (2 naive)", mask2)

print(f"\ndivide/mul cost ratio: {mul_f32 / div:.2f}x")
print(f"recip-approx/mul cost ratio: {mul_f32 / rec_a:.2f}x")
print(f"recip-exact/mul cost ratio: {mul_f32 / rec_e:.2f}x")
