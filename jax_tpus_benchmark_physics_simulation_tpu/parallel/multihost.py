"""Multi-host initialization.

The reference is single-host by construction (every script is titled
"single-host", SURVEY.md §2g). The engine's mesh/ring machinery is
host-count-agnostic: on a multi-host slice, call :func:`init_multihost` first
and build the mesh over ``jax.devices()`` (global); GSPMD compiles the ring
ppermute onto ICI within the slice and DCN across slices.
"""

from __future__ import annotations

from typing import Optional


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when running under a multi-process launcher
    (GKE/TPU-VM pods auto-detect with no arguments). Returns True if
    distributed mode is active. Safe to call on a single host (no-op)."""
    import jax

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except Exception:
        return False
    return jax.process_count() > 1


def is_primary() -> bool:
    """True on the process that should write artifacts/logs."""
    import jax

    return jax.process_index() == 0
