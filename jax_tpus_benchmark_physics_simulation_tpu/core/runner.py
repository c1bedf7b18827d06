"""Fused device step-loop runners.

The reference has four different loop idioms (SURVEY.md §3):
``lax.scan`` (nbody...:87-97), ``fori_loop`` with cond-gated trajectory writes
(molecular_dynamics...:85-106), a host Python loop with one dispatch per step
(three_particles...:78-85 — 1000 device round-trips), and a host epoch loop
(vmc_dmc...:144). Here there is exactly one runner: an outer ``lax.scan`` over
sample chunks with an inner ``fori_loop`` of un-sampled steps, so the entire
run is a single XLA program, trajectories are written densely (no ``lax.cond``
per step), and observables are computed on device as scan outputs.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

StepFn = Callable[[Any], Any]
ObserveFn = Callable[[Any], Any]


def run_steps(step_fn: StepFn, state: Any, num_steps: int) -> Any:
    """Advance ``num_steps`` steps fully on device, keeping only final state.

    Generalizes the reference equilibration loop
    (molecular_dynamics...:77-83).
    """
    if num_steps <= 0:
        return state
    return lax.fori_loop(0, num_steps, lambda i, s: step_fn(s), state)


def run_trajectory(
    step_fn: StepFn,
    state: Any,
    num_steps: int,
    sample_every: int = 1,
    observe_fn: Optional[ObserveFn] = None,
) -> Tuple[Any, Any]:
    """Advance ``num_steps`` steps, sampling every ``sample_every`` steps.

    Returns ``(final_state, samples)`` where ``samples`` stacks
    ``observe_fn(state)`` after each chunk of ``sample_every`` steps
    (``num_steps // sample_every`` samples). Any trailing remainder steps are
    run without sampling so ``final_state`` reflects exactly ``num_steps``.

    This replaces the reference's production loop with per-step
    ``lax.cond``-gated ``.at[].set`` writes (molecular_dynamics...:91-100)
    with a dense scan: no branch per step, trajectory buffer written
    sequentially — strictly friendlier to XLA.
    """
    if observe_fn is None:
        observe_fn = lambda s: s
    num_samples = num_steps // sample_every

    def chunk(carry, _):
        carry = lax.fori_loop(0, sample_every, lambda i, s: step_fn(s), carry)
        return carry, observe_fn(carry)

    final, samples = lax.scan(chunk, state, length=num_samples)
    remainder = num_steps - num_samples * sample_every
    if remainder:
        final = run_steps(step_fn, final, remainder)
    return final, samples


def run_trajectory_with_initial(
    step_fn: StepFn,
    state: Any,
    num_steps: int,
    observe_fn: Optional[ObserveFn] = None,
) -> Tuple[Any, Any]:
    """Like :func:`run_trajectory` (sample_every=1) but prepends the initial
    sample, matching the reference N-body layout ``vstack([y0, ys])``
    (nbody...:97): output has ``num_steps + 1`` samples.
    """
    if observe_fn is None:
        observe_fn = lambda s: s
    final, samples = run_trajectory(step_fn, state, num_steps, 1, observe_fn)
    first = observe_fn(state)
    samples = jax.tree.map(
        lambda x0, xs: jnp.concatenate([x0[None], xs], axis=0), first, samples
    )
    return final, samples
