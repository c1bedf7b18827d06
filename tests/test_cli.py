"""CLI smoke tests (tiny configs, CPU mesh). Verifies every subcommand wires
end-to-end: parse -> engine -> report/artifacts."""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the fast tier

import os

import numpy as np
import pytest

from jax_tpus_benchmark_physics_simulation_tpu.cli import main


def run_in(tmp_path, argv):
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        return main(argv)
    finally:
        os.chdir(cwd)


def test_devices():
    assert main(["devices"]) == 0


def test_check_deps():
    assert main(["check-deps"]) == 0


def test_em3(tmp_path):
    rc = run_in(tmp_path, ["em3", "--n_steps", "30", "--no-media"])
    assert rc == 0


def test_em3_reference_integrator(tmp_path):
    rc = run_in(tmp_path, ["em3", "--n_steps", "10", "--integrator", "reference", "--no-media"])
    assert rc == 0


def test_md(tmp_path):
    rc = run_in(
        tmp_path,
        [
            "md", "--N", "36", "--eq_steps", "50", "--prod_steps", "100",
            "--sample_every", "20", "--init", "lattice",
            "--output", str(tmp_path / "g.png"),
        ],
    )
    assert rc == 0
    assert os.path.getsize(tmp_path / "g.png") > 0


def test_md_nvt_langevin(tmp_path):
    """--thermostat langevin end-to-end: grid engine (cutoff forces the
    dispatch), NVT summary line, manifest carries pressure + D."""
    rc = run_in(
        tmp_path,
        [
            "md", "--N", "400", "--cutoff", "2.5", "--force-impl", "grid",
            "--eq_steps", "60", "--prod_steps", "120", "--sample_every", "20",
            "--init", "lattice", "--thermostat", "langevin", "--gamma", "2.0",
            "--output", str(tmp_path / "g.png"),
            "--manifest", str(tmp_path / "m.json"),
        ],
    )
    assert rc == 0
    import json

    m = json.loads((tmp_path / "m.json").read_text())
    assert m["config"]["thermostat"] == "langevin"
    assert np.isfinite(m["results"]["pressure"])


def test_md_thermostat_rejected_on_dense(tmp_path):
    with pytest.raises(ValueError, match="grid"):
        run_in(
            tmp_path,
            ["md", "--N", "36", "--eq_steps", "10", "--prod_steps", "20",
             "--sample_every", "10", "--thermostat", "langevin",
             "--force-impl", "dense_xla"],
        )


def test_nbody(tmp_path):
    rc = run_in(
        tmp_path,
        ["nbody", "--sim_time", "10", "--num_steps", "30", "--no-media"],
    )
    assert rc == 0


def test_nbody_two_trajectory_lyapunov(tmp_path):
    rc = run_in(
        tmp_path,
        ["nbody", "--sim_time", "10", "--num_steps", "30", "--no-media",
         "--lyapunov", "two_trajectory"],
    )
    assert rc == 0


def test_vmc(tmp_path):
    rc = run_in(
        tmp_path,
        [
            "vmc", "--n_walkers", "200", "--n_epochs", "20", "--n_equil", "5",
            "--n_dmc", "20", "--dim", "2", "--no-gif", "--no-plot",
        ],
    )
    assert rc == 0


def test_bench_tiny(tmp_path):
    rc = run_in(
        tmp_path,
        [
            "bench", "-w", "0", "-m", "1", "-mxs", "64", "-md", "2",
            "-c", "8", "-b", "1", "--max_cores", "2",
            "--csv", str(tmp_path / "r.csv"), "--plot", str(tmp_path / "b.png"),
        ],
    )
    assert rc == 0
    assert os.path.getsize(tmp_path / "r.csv") > 0
    assert os.path.getsize(tmp_path / "b.png") > 0


def test_vmc_with_gifs(tmp_path):
    """GIF path incl. the snapshot_every > n_dmc edge case (0 frames)."""
    rc = run_in(
        tmp_path,
        [
            "vmc", "--n_walkers", "100", "--n_epochs", "10", "--n_equil", "3",
            "--n_dmc", "10", "--dim", "2", "--no-plot",
        ],
    )
    assert rc == 0
