"""Rich-console reporting (panels, tables, progress) — the reference's
strongest subsystem, centralized (SURVEY.md §5 "Metrics/logging").

Falls back to plain text when rich is unavailable (the reference's
check_deps.py:12-44 fallback pattern, minus its NameError bug at :103).
"""

from __future__ import annotations

import contextlib
from typing import Dict, List, Optional

try:
    from rich.console import Console
    from rich.panel import Panel
    from rich.table import Table

    HAVE_RICH = True
    _console = Console()
except Exception:  # pragma: no cover
    HAVE_RICH = False
    _console = None


def log(message: str) -> None:
    if HAVE_RICH:
        _console.print(message)
    else:
        print(message)


def panel(text: str, title: str = "") -> None:
    if HAVE_RICH:
        _console.print(Panel.fit(text, title=title))
    else:
        print(f"--- {title} ---\n{text}")


def kv_table(title: str, rows: Dict[str, object]) -> None:
    if HAVE_RICH:
        t = Table(title=title, show_header=False)
        t.add_column("key", style="cyan", justify="right")
        t.add_column("value", style="green")
        for k, v in rows.items():
            t.add_row(str(k), str(v))
        _console.print(t)
    else:
        print(f"--- {title} ---")
        for k, v in rows.items():
            print(f"  {k}: {v}")


def records_table(title: str, records: List[dict], columns: Optional[List[str]] = None) -> None:
    if not records:
        log(f"{title}: (no results)")
        return
    if columns is None:
        columns = sorted({k for r in records for k in r})
    if HAVE_RICH:
        t = Table(title=title)
        for c in columns:
            t.add_column(c, justify="right")
        for r in records:
            t.add_row(*(f"{r.get(c, ''):.3f}" if isinstance(r.get(c), float) else str(r.get(c, "")) for c in columns))
        _console.print(t)
    else:
        print(f"--- {title} ---")
        print(" | ".join(columns))
        for r in records:
            print(" | ".join(str(r.get(c, "")) for c in columns))


class _NullProgress:
    """Plain-text fallback: prints phase start lines and description changes
    (rate-limited) so live readouts (e.g. the VMC per-chunk E/alpha) survive
    terminals without rich (advisor finding, round 2)."""

    _MIN_INTERVAL_S = 2.0

    def __init__(self):
        self._last_print = 0.0

    def add_task(self, description: str, total: Optional[float] = None, **kw):
        print(f"... {description}")
        return description

    def update(self, task, description: Optional[str] = None, **kw):
        if description is None or description == task:
            return
        import time

        now = time.monotonic()
        if now - self._last_print >= self._MIN_INTERVAL_S:
            self._last_print = now
            print(f"... {description}")

    def advance(self, task, advance: float = 1):
        pass


@contextlib.contextmanager
def progress(transient: bool = False):
    """Live progress display (parity with the reference's rich bars/spinners,
    nbody...:117-134, vmc_dmc...:133-154). Yields an object with
    ``add_task/update/advance``; falls back to plain prints without rich.

    Use ``total=None`` tasks for indeterminate phases (spinner only) — the
    device-fused phases are single XLA programs, so there is nothing to tick
    until they return; determinate bars are used where the host sees chunk
    boundaries (VMC epoch chunks, MD sample blocks).
    """
    if not HAVE_RICH:
        yield _NullProgress()
        return
    from rich.progress import (
        BarColumn,
        Progress,
        SpinnerColumn,
        TaskProgressColumn,
        TextColumn,
        TimeElapsedColumn,
    )

    with Progress(
        SpinnerColumn(),
        TextColumn("[progress.description]{task.description}"),
        BarColumn(),
        TaskProgressColumn(),
        TimeElapsedColumn(),
        console=_console,
        transient=transient,
    ) as p:
        yield p
