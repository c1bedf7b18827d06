"""Multi-host smoke test: a REAL 2-process jax.distributed CPU cluster
(round-1 VERDICT item 8 — init_multihost was untested scaffolding).

Each subprocess initializes the cluster via parallel.multihost.init_multihost,
builds the global 2-device mesh (1 CPU device per process), runs a psum
across processes and a shard_map ppermute ring — the exact collective
machinery the sharded MD engine uses — and checks the results.
"""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the fast tier

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ.pop("JAX_PLATFORMS", None)
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from jax_tpus_benchmark_physics_simulation_tpu.parallel.multihost import (
        init_multihost, is_primary,
    )
    from jax_tpus_benchmark_physics_simulation_tpu.parallel.mesh import make_mesh

    addr, pid = sys.argv[1], int(sys.argv[2])
    active = init_multihost(coordinator_address=addr, num_processes=2, process_id=pid)
    assert active, "distributed init did not activate"
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 2, jax.device_count()  # one CPU dev per proc
    assert is_primary() == (pid == 0)

    mesh = make_mesh(2, axis_name="x")

    # cross-process psum + the one-row ppermute pattern of the halo exchange
    def body(v):
        total = jax.lax.psum(jnp.sum(v), "x")
        fwd = [(i, (i - 1) % 2) for i in range(2)]
        halo = jax.lax.ppermute(v[0:1], "x", fwd)
        return total, halo

    v = jnp.arange(8.0).reshape(2, 4)  # global; row per device
    out_total, out_halo = jax.jit(
        jax.shard_map(body, mesh=mesh, in_specs=(P("x"),), out_specs=(P(), P("x")),
                      check_vma=False)
    )(v)
    # psum of all elements = 28; device 0's halo row is device 1's first row
    assert float(out_total) == 28.0, float(out_total)
    import numpy as np
    halo_local = np.asarray(jax.device_get(
        [s.data for s in out_halo.addressable_shards][0]
    ))
    expected_first = [4.0, 5.0, 6.0, 7.0] if pid == 0 else [0.0, 1.0, 2.0, 3.0]
    assert halo_local.reshape(-1).tolist() == expected_first, halo_local
    print(f"proc {pid}: OK", flush=True)
    """
)


def test_two_process_cpu_cluster(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    addr = f"localhost:{port}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # no virtual-device forcing in the workers
    env.pop("JAX_PLATFORMS", None)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), addr, str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=repo_root,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid}: OK" in out


def test_single_host_autodetect_is_noop(monkeypatch):
    """On a plain single host with no launcher env, auto-detect must return
    False — i.e. stay a single-host run — not raise (and not swallow real
    config errors — see module)."""
    from jax_tpus_benchmark_physics_simulation_tpu.parallel.multihost import (
        init_multihost,
    )

    # scrub every cluster-launcher variable jax.distributed auto-detects so
    # the assertion is about a genuinely clean single host
    for var in (
        "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
        "JAX_PROCESS_ID", "TPU_WORKER_HOSTNAMES", "TPU_WORKER_ID",
        "MEGASCALE_COORDINATOR_ADDRESS", "SLURM_JOB_ID", "SLURM_NTASKS",
        "SLURM_PROCID", "SLURM_STEP_NODELIST", "OMPI_MCA_orte_hnp_uri",
        "OMPI_COMM_WORLD_SIZE", "OMPI_COMM_WORLD_RANK", "CLOUD_TPU_TASK_ID",
    ):
        monkeypatch.delenv(var, raising=False)
    assert init_multihost() is False
