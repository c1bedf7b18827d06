"""Variational Monte Carlo with REINFORCE-style parameter optimization.

Reference: ``vmc_epoch_step`` + host epoch loop at vmc_dmc...:69-97,141-170.
The reference dispatches one jit call per epoch (3000 host round-trips) so it
can append to Python history lists. Here epochs are scanned on device in
chunks (``epoch_chunk``), with history emitted as scan outputs — the chunk
size only controls how often the host sees progress, not the math.

Gradient estimator (identical to reference :86-89):
  grad E = 2 < (E_L - <E_L>) * d(log psi)/d(theta) >
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax import lax, random

from jax_tpus_benchmark_physics_simulation_tpu.core.config import VMCDMCConfig
from jax_tpus_benchmark_physics_simulation_tpu.mc.metropolis import (
    equilibrate,
    make_metropolis_sweep,
)


@dataclass
class VMCResult:
    params: Any  # optimized variational parameters (alpha)
    walkers: jax.Array  # final walker ensemble
    key: jax.Array  # final PRNG key
    energy_history: jax.Array  # (n_epochs,)
    params_history: jax.Array  # (n_epochs,)
    grad_history: jax.Array  # (n_epochs,)
    accept_history: jax.Array  # (n_epochs,)
    walker_snapshots: Optional[jax.Array] = None  # (n_snapshots, n_walkers, dim)


def make_epoch_step(model, cfg: VMCDMCConfig, optimizer: optax.GradientTransformation):
    """One VMC epoch: n_equil Metropolis sweeps, energy + REINFORCE gradient,
    optimizer update, params clamp (vmc_dmc...:94)."""
    sweep = make_metropolis_sweep(model.log_psi, cfg.step_size)

    def epoch_step(carry, _):
        walkers, params, key, opt_state = carry
        key, sub = random.split(key)
        walkers, accept = equilibrate(sweep, walkers, params, sub, cfg.n_equil)

        energies = model.local_energy(params, walkers)  # (n_walkers,)
        e_mean = jnp.mean(energies)

        # REINFORCE over any params pytree: per-walker d log psi / d params,
        # contracted with centered energies along the walker axis.
        per_walker_grad = jax.vmap(jax.grad(model.log_psi, argnums=0), in_axes=(None, 0))(
            params, walkers
        )
        centered = energies - e_mean
        n_w = energies.shape[0]
        grad_e = jax.tree.map(
            lambda g: 2.0 * jnp.tensordot(centered, g, axes=(0, 0)) / n_w,
            per_walker_grad,
        )

        updates, opt_state = optimizer.update(grad_e, opt_state)
        params = optax.apply_updates(params, updates)
        params = jax.tree.map(lambda p: jnp.maximum(cfg.alpha_min, p), params)

        return (walkers, params, key, opt_state), (e_mean, params, grad_e, accept)

    return epoch_step


def run_vmc(
    model,
    cfg: VMCDMCConfig,
    key: Optional[jax.Array] = None,
    progress_cb: Optional[Callable[[int, float, float], None]] = None,
    walker_sharding=None,
    ckpt_dir: Optional[str] = None,
) -> VMCResult:
    """Full VMC optimization. ``progress_cb(epoch, energy, alpha)`` is invoked
    once per device chunk (not per epoch) if given.

    ``walker_sharding``: optional ``NamedSharding`` splitting the walker axis
    over a device mesh — GSPMD shards the Metropolis sweeps and inserts the
    psum for the energy/gradient means; results are placement-invariant
    (jax_threefry_partitionable gives identical random streams).

    ``ckpt_dir``: orbax checkpointing of the optimization carry
    (walkers, params, key, opt_state) at chunk boundaries — a 3000-epoch run
    (the reference default, vmc_dmc...:348) resumes from the latest epoch
    instead of restarting (the resumability the reference lacks, SURVEY §5).
    Histories in the returned result cover the epochs run in THIS process.
    """
    if key is None:
        from jax_tpus_benchmark_physics_simulation_tpu.utils.prng import make_key

        key = make_key(cfg.seed, cfg.prng_impl)
    key, sub = random.split(key)
    walkers = random.normal(sub, (cfg.n_walkers, cfg.dim), dtype=jnp.float32)
    if walker_sharding is not None:
        walkers = jax.device_put(walkers, walker_sharding)
    # models with richer trial wavefunctions provide their own params pytree
    # (e.g. AnharmonicOscillator's {alpha, beta}); the reference model is a
    # bare alpha scalar (vmc_dmc...:33-34)
    if hasattr(model, "init_params"):
        params = model.init_params(cfg.alpha_init)
    else:
        params = jnp.asarray(cfg.alpha_init, dtype=jnp.float32)

    optimizer = optax.adam(cfg.lr)
    opt_state = optimizer.init(params)

    epoch_step = make_epoch_step(model, cfg, optimizer)

    @partial(jax.jit, static_argnums=(1,))
    def run_chunk(carry, n):
        return lax.scan(epoch_step, carry, length=n)

    chunk = max(1, cfg.epoch_chunk)
    if cfg.snapshot_every:
        # Snapshots are only observable at chunk boundaries; align the chunk
        # so every requested snapshot epoch IS a boundary (gcd, not min: a
        # snapshot_every not dividing the chunk would otherwise silently
        # skip frames).
        import math

        chunk = math.gcd(chunk, cfg.snapshot_every)
    carry = (walkers, params, key, opt_state)
    e_hist, p_hist, g_hist, a_hist = [], [], [], []
    snapshots = []
    done = 0
    fp = None
    if ckpt_dir is not None:
        import dataclasses

        from jax_tpus_benchmark_physics_simulation_tpu.ckpt import (
            config_fingerprint,
            latest_step,
            restore_checkpoint,
        )

        # physics fingerprint EXCLUDES run-length/reporting knobs so a run
        # extended with a larger n_epochs still resumes, but changed physics
        # (lr, dim, potential, ...) is detected instead of silently resumed
        # (advisor finding, round 2)
        phys = {
            k: v
            for k, v in sorted(dataclasses.asdict(cfg).items())
            if k not in ("n_epochs", "epoch_chunk", "snapshot_every")
        }
        fp = config_fingerprint(phys)
        step = latest_step(ckpt_dir)
        if step is not None and 0 < step <= cfg.n_epochs:
            try:
                bundle = restore_checkpoint(
                    ckpt_dir, {"carry": carry, "fp": jnp.zeros((), jnp.int32)}, step
                )
            except Exception:  # pre-fingerprint layout (round <= 2)
                bundle = {"carry": restore_checkpoint(ckpt_dir, carry, step),
                          "fp": jnp.asarray(fp, jnp.int32)}
            if int(bundle["fp"]) != fp:
                print(
                    f"[ckpt] config changed since checkpoint in {ckpt_dir} "
                    "(fingerprint mismatch) — starting fresh instead of resuming"
                )
            else:
                carry = bundle["carry"]
                done = step
    while done < cfg.n_epochs:
        n = min(chunk, cfg.n_epochs - done)
        carry, (es, ps, gs, accs) = run_chunk(carry, n)
        e_hist.append(es)
        p_hist.append(ps)
        g_hist.append(gs)
        a_hist.append(accs)
        done += n
        if cfg.snapshot_every and (done % cfg.snapshot_every == 0 or done == cfg.n_epochs):
            snapshots.append(carry[0])
        if ckpt_dir is not None and (done % (10 * chunk) == 0 or done == cfg.n_epochs):
            from jax_tpus_benchmark_physics_simulation_tpu.ckpt import save_checkpoint

            save_checkpoint(
                ckpt_dir, done, {"carry": carry, "fp": jnp.asarray(fp, jnp.int32)}
            )
        if progress_cb is not None:
            progress_cb(done, float(es[-1]), float(jax.tree.leaves(ps)[0][-1]))
    if not e_hist:  # fully restored run: report current state once.
        # The probe epoch populates the histories ONLY — its advanced carry
        # is discarded, so the returned params/walkers are exactly the
        # checkpoint at n_epochs, not one Adam step past it (advisor
        # finding, round 2).
        _, (es, ps, gs, accs) = run_chunk(carry, 1)
        e_hist, p_hist, g_hist, a_hist = [es], [ps], [gs], [accs]

    walkers, params, key, opt_state = carry

    def cat(chunks):  # params/grads may be pytrees (dict params)
        return jax.tree.map(lambda *xs: jnp.concatenate(xs), *chunks)

    return VMCResult(
        params=params,
        walkers=walkers,
        key=key,
        energy_history=jnp.concatenate(e_hist),
        params_history=cat(p_hist),
        grad_history=cat(g_hist),
        accept_history=jnp.concatenate(a_hist),
        walker_snapshots=jnp.stack(snapshots) if snapshots else None,
    )
