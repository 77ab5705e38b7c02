"""End-to-end proof of scripts/fortran_parity.py without a Fortran
compiler (VERDICT r3 next #2): a stand-in noahmp.exe
(scripts/mock_noahmp_exe.py) drives stages 2-7 — case generation, the
reference-side run from a staged rundir (tables copied, reference
`output.<stamp>` naming with no .nc suffix), the JAX-side run, the
per-variable divergence table, BOTH cross-restart legs, and the JSON
report — so the first real CI fortran-parity run can only fail in the
build stage.  A second run injects a +0.5 K/step drift into the mock
and asserts the tolerance table FAILS (the comparison has teeth)."""

import json
import os
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


@pytest.fixture(scope="module")
def fake_ref(tmp_path_factory):
    """A minimal reference-shaped tree: run/noahmp.exe (the mock) +
    the four parameter tables."""
    tmp = tmp_path_factory.mktemp("mockref")
    run = tmp / "ref" / "run"
    run.mkdir(parents=True)
    assets = REPO / "noahmp_tpu" / "run_assets"
    for t in ("MPTABLE.TBL", "SOILPARM.TBL", "VEGPARM.TBL",
              "GENPARM.TBL"):
        shutil.copy(assets / t, run / t)
    exe = run / "noahmp.exe"
    exe.write_text("#!/bin/sh\nexec %s %s \"$@\"\n"
                   % (sys.executable,
                      REPO / "scripts" / "mock_noahmp_exe.py"))
    exe.chmod(0o755)
    return tmp / "ref"


def _run_harness(fake_ref, workdir, extra_env=None, extra_args=()):
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)
    env.update(extra_env or {})
    cmd = [sys.executable, str(REPO / "scripts" / "fortran_parity.py"),
           "--ref", str(fake_ref), "--skip-build",
           "--ny", "4", "--nx", "5", "--ndays", "1",
           "--workdir", str(workdir), *extra_args]
    p = subprocess.run(cmd, env=env, capture_output=True, text=True,
                       timeout=1200)
    report = workdir / "parity.json"
    return p, (json.loads(report.read_text()) if report.exists()
               else None)


@pytest.fixture(scope="module")
def green_run(fake_ref, tmp_path_factory):
    """One full harness run shared by both tests (the JAX-side model
    run dominates the cost; the divergence-trip test re-compares
    against a perturbed mock via --reuse-jax instead of paying it
    twice).  Both tests share one xdist worker (loadgroup) so the
    module fixture really runs once."""
    workdir = tmp_path_factory.mktemp("parity") / "work"
    return workdir, *_run_harness(fake_ref, workdir)


@pytest.mark.slow
@pytest.mark.xdist_group("parity")
def test_parity_harness_green(green_run):
    _, p, rep = green_run
    assert p.returncode == 0, (
        f"harness failed:\n{p.stdout[-4000:]}\n{p.stderr[-4000:]}")
    assert rep is not None, "no parity.json written"
    assert rep["failures"] == []
    assert rep["history_files_compared"] >= 8   # 3-hourly over 1 day
    assert rep["restart_files_compared"] >= 1
    assert rep["cross_restart_ok"] is True
    assert rep["fortran_reads_jax_restart_ok"] is True
    assert rep["measured_baseline_col_steps_per_s"] > 0
    # the divergence table must actually contain compared variables
    assert any(k.startswith("hist@") for k in rep["max_divergence"])
    assert any(k.startswith("rst@") for k in rep["max_divergence"])
    # mock oracle == model under test -> divergence exactly zero
    assert max(rep["max_divergence"].values()) == 0.0


@pytest.mark.slow
@pytest.mark.xdist_group("parity")
def test_parity_harness_trips_on_divergence(fake_ref, green_run,
                                            tmp_path):
    green_workdir, p0, _ = green_run
    assert p0.returncode == 0, "green run failed; see its test"
    p, rep = _run_harness(fake_ref, tmp_path / "work",
                          extra_env={"MOCK_PERTURB": "1"},
                          extra_args=("--reuse-jax", str(green_workdir),
                                      "--skip-cross"))
    assert p.returncode != 0, (
        "harness passed against a +0.5 K/step perturbed oracle — the "
        "tolerance table has no teeth")
    assert rep is not None and rep["failures"]
    assert any("TG" in f or "SOIL_T" in f or "TV" in f
               for f in rep["failures"]), rep["failures"]
