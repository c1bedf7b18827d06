"""Profiling + debug utility tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax_tpus_benchmark_physics_simulation_tpu.utils.debug import (
    all_finite,
    assert_finite,
    debug_mode,
    sanitize_weights,
)
from jax_tpus_benchmark_physics_simulation_tpu.utils.profiling import (
    cost_analysis,
    timeit_op,
)


class TestProfiling:
    def test_cost_analysis_matmul(self):
        n = 128
        costs = cost_analysis(
            lambda a, b: a @ b, jnp.ones((n, n)), jnp.ones((n, n))
        )
        assert costs.get("flops", 0) >= 2 * n**3 * 0.9

    def test_timeit_op(self):
        t = timeit_op(lambda x: x * 2.0, jnp.ones((256, 256)), warmup=1, iters=3)
        assert t > 0


class TestDebug:
    def test_all_finite(self):
        assert bool(all_finite({"a": jnp.ones(3), "b": jnp.zeros(2)}))
        assert not bool(all_finite({"a": jnp.array([1.0, jnp.nan])}))

    def test_assert_finite_raises_with_path(self):
        with pytest.raises(FloatingPointError, match="velocity"):
            assert_finite({"velocity": jnp.array([jnp.inf])}, "state")

    def test_sanitize_weights(self):
        w = sanitize_weights(jnp.array([jnp.nan, 1.0, jnp.inf, -2.0]))
        assert np.all(np.isfinite(np.asarray(w)))
        np.testing.assert_allclose(float(jnp.sum(w)), 1.0, rtol=1e-6)
        # degenerate -> uniform
        w0 = sanitize_weights(jnp.zeros(4))
        np.testing.assert_allclose(np.asarray(w0), 0.25)

    def test_debug_mode_restores_config(self):
        before = jax.config.jax_debug_nans
        with debug_mode(nans=True):
            assert jax.config.jax_debug_nans
        assert jax.config.jax_debug_nans == before
