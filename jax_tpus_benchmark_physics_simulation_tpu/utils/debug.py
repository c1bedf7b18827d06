"""Numerical-safety guards (engine-level generalization of the reference's
one-off DMC NaN sanitization, vmc_dmc...:250-253 — SURVEY.md §5 "race
detection / sanitizers").
"""

from __future__ import annotations

import contextlib
from typing import Any

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def debug_mode(nans: bool = True, infs: bool = False):
    """Enable jax_debug_nans/_infs for the scope (traps at the op that
    produced the NaN instead of poisoning the run)."""
    old_nans = jax.config.jax_debug_nans
    old_infs = jax.config.jax_debug_infs
    jax.config.update("jax_debug_nans", nans)
    jax.config.update("jax_debug_infs", infs)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old_nans)
        jax.config.update("jax_debug_infs", old_infs)


def all_finite(tree: Any) -> jax.Array:
    """Scalar bool: every leaf of the pytree is finite (usable inside jit)."""
    leaves = [jnp.all(jnp.isfinite(x)) for x in jax.tree.leaves(tree) if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.inexact)]
    if not leaves:
        return jnp.asarray(True)
    out = leaves[0]
    for l in leaves[1:]:
        out = out & l
    return out


def assert_finite(tree: Any, name: str = "state") -> None:
    """Host-side check (forces a sync): raise with context if any leaf has
    NaN/Inf."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.inexact):
            if not bool(jnp.all(jnp.isfinite(leaf))):
                raise FloatingPointError(
                    f"non-finite values in {name}{jax.tree_util.keystr(path)}"
                )


def sanitize_weights(weights: jax.Array, fallback_uniform: bool = True) -> jax.Array:
    """The DMC weight-hygiene pattern promoted to a utility: NaN/Inf -> tiny,
    renormalize, degenerate sum -> uniform (vmc_dmc...:250-253)."""
    n = weights.shape[0]
    w = jnp.nan_to_num(weights, nan=1e-9, posinf=1e-9, neginf=1e-9)
    w = jnp.maximum(w, 0.0)
    s = jnp.sum(w)
    if fallback_uniform:
        return jnp.where(s > 0, w / s, jnp.full_like(w, 1.0 / n))
    return w / jnp.maximum(s, 1e-30)
