"""Subprocess entry point for the crash-isolated benchmark sweep.

`jtps bench` (default mode) never touches the TPU from its own process:
the whole sweep runs HERE, streaming a line protocol on stdout that the
parent (bench/isolate.py) consumes. If an op kills the TPU worker process
(observed: 3D_FFT at 4096^2 x 6 reproducibly crashes the remote v5e worker
and poisons every subsequent op in-process — results/RESULTS.md round 3),
this process dies, the parent records a loud failure row for the op that
was running, and respawns a fresh worker for the remaining (cores, op)
pairs. One TPU client exists at a time (the parent holds none), which the
remote-tunnel backend requires.

This is the in-product generalization of the reference's per-op salvage
behavior (tpus_benchmark...:221-235, :696-703): the reference survives
Python-level op failures in-process; a worker-process death there would
also lose the sweep.

Protocol (stdout, one JSON per line, prefix ``@@BENCH ``):
  {"kind": "sysinfo",  "info": {...}}
  {"kind": "devices",  "rows": [...]}
  {"kind": "begin",    "cores": C, "op": NAME}
  {"kind": "result",   "cores": C, "op": NAME, "row": {...}}
  {"kind": "skipped",  "cores": C, "op": NAME}
  {"kind": "done"}
Human-readable progress goes to stderr (inherited by the parent's tty).

Usage: python -m jax_tpus_benchmark_physics_simulation_tpu.bench.sweep_worker
       (config JSON + skip list on stdin; see isolate.run_sweep_isolated)
"""

from __future__ import annotations

import json
import sys


def _emit(kind: str, payload: dict | None = None) -> None:
    msg = {"kind": kind, **(payload or {})}
    sys.stdout.write("@@BENCH " + json.dumps(msg) + "\n")
    sys.stdout.flush()
    if kind == "begin":
        # test hook: simulate a TPU-worker death at the start of an op
        # (tests/test_bench.py exercises the parent's respawn path with it)
        import os

        crash = os.environ.get("JTPS_BENCH_CRASH_OP", "")
        if crash and msg.get("op") == crash:
            os._exit(139)


def _log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> int:
    payload = json.loads(sys.stdin.read())

    import os

    plat = os.environ.get("JAX_PLATFORMS", "")
    if plat:
        # honor the parent's platform pin authoritatively: some accelerator
        # plugins override the env var, but jax.config wins (tests run the
        # worker on the virtual CPU mesh this way)
        import jax

        jax.config.update("jax_platforms", plat)

    from jax_tpus_benchmark_physics_simulation_tpu.cli import (
        _enable_compilation_cache,
    )

    _enable_compilation_cache()

    from jax_tpus_benchmark_physics_simulation_tpu.bench.runners import run_sweep
    from jax_tpus_benchmark_physics_simulation_tpu.bench.sysinfo import (
        device_rows,
        system_info,
    )
    from jax_tpus_benchmark_physics_simulation_tpu.core.config import BenchConfig

    cfg_d = dict(payload["cfg"])
    if cfg_d.get("ops") is not None:
        cfg_d["ops"] = tuple(cfg_d["ops"])
    cfg = BenchConfig(**cfg_d)
    skip = {(int(c), str(o)) for c, o in payload.get("skip", [])}

    _emit("sysinfo", {"info": system_info()})
    _emit("devices", {"rows": device_rows()})
    run_sweep(cfg, log=_log, emit=_emit, skip=skip)
    _emit("done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
