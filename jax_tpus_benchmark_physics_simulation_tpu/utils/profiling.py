"""Profiling / tracing hooks (absent in the reference — SURVEY.md §5:
coarse perf_counter timing only).

- :func:`trace`: context manager around ``jax.profiler.trace`` (view with
  TensorBoard or xprof).
- :func:`cost_analysis`: XLA's per-executable FLOP/byte estimates from the
  compiled artifact.
- :func:`timeit_op`: warmup-then-measure timing with a hard host sync (a
  scalar device->host read; plain ``block_until_ready`` has been observed
  unreliable over remote-tunnel backends).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def cost_analysis(fn: Callable, *args, **kwargs) -> Dict[str, Any]:
    """Compile ``fn`` and return XLA's cost analysis (flops, bytes accessed,
    transcendentals, ...)."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):  # older jax returns a per-computation list
        costs = costs[0] if costs else {}
    return dict(costs or {})


def timeit_op(
    fn: Callable,
    *args,
    warmup: int = 3,
    iters: int = 10,
    sync_value: Optional[Callable] = None,
) -> float:
    """Average seconds per call. ``sync_value(out) -> scalar array`` selects
    what to read back for the hard sync (default: first leaf's first item)."""
    compiled = jax.jit(fn)

    def sync(out):
        if sync_value is not None:
            return float(sync_value(out))
        leaf = jax.tree.leaves(out)[0]
        return float(jnp.ravel(leaf)[0])

    for _ in range(warmup):
        sync(compiled(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = compiled(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters
