"""Checkpoint / resume of engine state via orbax.

The reference has NO checkpointing (SURVEY.md §5: orbax is installed by its
README:89 but never imported; every run restarts from scratch). Here any
pytree (ParticleState, GridMDState, VMC carry, ...) can be saved per step and
restored, so 1M-step runs are resumable.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def _ocp():
    try:
        import orbax.checkpoint as ocp
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise ImportError(
            "checkpoint/resume requires orbax-checkpoint; install the extra: "
            "pip install 'jax_tpus_benchmark_physics_simulation_tpu[ckpt]'"
        ) from e
    return ocp



def _manager(directory: str, max_to_keep: int = 3):
    ocp = _ocp()

    directory = os.path.abspath(directory)
    options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True)
    return ocp.CheckpointManager(directory, options=options)


def save_checkpoint(directory: str, step: int, state: Any, max_to_keep: int = 3) -> None:
    """Save a pytree at ``step`` under ``directory`` (blocking)."""
    ocp = _ocp()

    mgr = _manager(directory, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


def latest_step(directory: str) -> Optional[int]:
    ocp = _ocp()

    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory)
    step = mgr.latest_step()
    mgr.close()
    return step


def config_fingerprint(cfg: Any) -> int:
    """Deterministic int32 fingerprint of a config dataclass (crc32 of its
    repr — dataclass reprs enumerate every field). Stored inside checkpoints
    so a restore against a CHANGED physics config is detected instead of
    silently returning stale results (advisor finding, round 2)."""
    import zlib

    return zlib.crc32(repr(cfg).encode()) & 0x7FFFFFFF


def restore_checkpoint(directory: str, target: Any, step: Optional[int] = None) -> Any:
    """Restore a pytree with the structure/shapes of ``target``. Returns the
    restored pytree (``target`` is the abstract template)."""
    ocp = _ocp()

    mgr = _manager(directory)
    if step is None:
        step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoints in {directory}")
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
    restored = mgr.restore(step, args=ocp.args.StandardRestore(abstract))
    mgr.close()
    return restored
