"""Crash-isolated benchmark sweep: parent side.

Runs the whole sweep in ONE subprocess (bench/sweep_worker.py) and parses
its line protocol. If the worker process dies mid-op (a TPU-worker-killing
op — e.g. 3D_FFT at the reference-default 4096^2 x 6 on the remote v5e
backend), the parent:

1. records a loud failure row ``{test, cores, error}`` for the op that was
   running (it appears in the results table and the CSV; plots skip it);
2. adds that (cores, op) pair to the skip set;
3. respawns a fresh worker for everything that hasn't run yet.

The parent process itself never initializes a JAX backend — the
remote-tunnel TPU requires exactly one client process at a time, so
isolation-by-subprocess only works if the parent stays off the device.

Reference behavior generalized: tpus_benchmark...:221-235 (per-op
try/except) and :696-703 (KeyboardInterrupt salvage) survive Python-level
failures in-process; a worker-process crash there loses the sweep.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from dataclasses import asdict
from typing import Callable, List, Optional, Tuple

import jax_tpus_benchmark_physics_simulation_tpu as _pkg
from jax_tpus_benchmark_physics_simulation_tpu.core.config import BenchConfig

_WORKER_MOD = "jax_tpus_benchmark_physics_simulation_tpu.bench.sweep_worker"


def _worker_env() -> dict:
    """Subprocess env whose PYTHONPATH can import this package even when the
    parent was launched from an unrelated cwd (the package is often used
    straight from a checkout, not installed)."""
    env = dict(os.environ)
    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(_pkg.__file__)))
    pp = env.get("PYTHONPATH", "")
    if pkg_parent not in pp.split(os.pathsep):
        env["PYTHONPATH"] = pkg_parent + (os.pathsep + pp if pp else "")
    return env


def run_sweep_isolated(
    cfg: BenchConfig,
    log: Callable[[str], None] = print,
    max_respawns: int = 16,
) -> Tuple[List[dict], dict, List[dict]]:
    """Returns ``(results, system_info, device_rows)``. Results include
    loud ``error`` rows for ops whose TPU worker process died."""
    skip: List[Tuple[int, str]] = []
    results: List[dict] = []
    sysinfo: dict = {}
    devrows: List[dict] = []
    respawns = 0

    while True:
        payload = json.dumps({"cfg": asdict(cfg), "skip": skip})
        proc = subprocess.Popen(
            [sys.executable, "-m", _WORKER_MOD],
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            stderr=None,  # worker's human logs pass through
            text=True,
            env=_worker_env(),
        )
        proc.stdin.write(payload)
        proc.stdin.close()
        current: Optional[Tuple[int, str]] = None
        done = False
        for line in proc.stdout:
            if not line.startswith("@@BENCH "):
                if line.strip():
                    log(line.rstrip())
                continue
            msg = json.loads(line[len("@@BENCH "):])
            kind = msg["kind"]
            if kind == "sysinfo":
                sysinfo = msg["info"]
            elif kind == "devices":
                devrows = msg["rows"]
            elif kind == "begin":
                current = (int(msg["cores"]), str(msg["op"]))
            elif kind == "result":
                results.append(msg["row"])
                skip.append((int(msg["cores"]), str(msg["op"])))
                current = None
            elif kind == "skipped":
                skip.append((int(msg["cores"]), str(msg["op"])))
                current = None
            elif kind == "done":
                done = True
        rc = proc.wait()
        if done and rc == 0:
            return results, sysinfo, devrows
        if current is None:
            # died outside any op (backend init, OOM in allocation bookkeeping,
            # or repeated instant crashes): surface loudly and stop
            log(
                f"[bench] worker process died (exit {rc}) outside any op — "
                "aborting the sweep with partial results"
            )
            return results, sysinfo, devrows
        cores, op = current
        log(
            f"[bench] TPU worker process DIED (exit {rc}) while running "
            f"{op} @ {cores} core(s) — recording failure row, respawning "
            "for the remaining ops"
        )
        results.append(
            {
                "test": op,
                "cores": cores,
                "error": f"TPU worker process crashed (exit {rc})",
            }
        )
        skip.append(current)
        respawns += 1
        if respawns >= max_respawns:
            log(f"[bench] {respawns} worker crashes — giving up on the rest")
            return results, sysinfo, devrows
