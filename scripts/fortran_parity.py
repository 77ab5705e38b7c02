"""Run the reference Fortran `noahmp.exe` and this framework on the
SAME generated case, and assert value-level parity on the history and
restart output — the BASELINE.md correctness oracle:

    "reference Fortran noahmp.exe (same namelist + forcing),
     allclose on prognostics"

Also times the Fortran main loop and writes a MEASURED single-core
baseline (columns*steps/s) to replace bench.py's estimate.

This needs a Fortran toolchain (gfortran + netcdf-fortran), which the
development image does not carry; CI runs it on ubuntu-latest (see
.github/workflows/ci.yml `fortran-parity` job).  Usage:

    python scripts/fortran_parity.py --ref /path/to/NoahMP \
        [--workdir parity_work] [--ndays 3] [--opt-run 3] [--skip-build]

Stages:
  1. build noahmp.exe from --ref (configure option 1: Linux GCC seq;
     Makefile:1-19, run/Makefile:20-48) unless --skip-build,
  2. generate a shared case (examples/make_demo_case.py formats),
  3. run noahmp.exe (timed),
  4. run noahmp_tpu.LandModel on the same namelist,
  5. compare every common output.<date> history file and the final
     restart per-variable (max abs divergence over unmasked cells),
  6. cross-restart BOTH directions (SURVEY §5.4 cross-validation):
     (a) resume LandModel from the FORTRAN-written restart and run one
     more day; (b) point noahmp.exe's namelist RESTART_FILE at the
     JAX-written restart (the reference reads any nf90_open-able file,
     module_hrldas_noahmp_driver.F90:180-251) and run it one more day,
  7. write parity table + measured baseline to --out-json.

The whole pipeline (stages 2-7) is exercised compiler-free in the
test suite against a stand-in oracle (scripts/mock_noahmp_exe.py, see
tests/test_fortran_parity_harness.py), so a real CI run can only fail
in stage 1.
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "examples"))

# per-variable absolute tolerances for a multi-day float32 composed
# run (both sides carry REAL*4 state; divergence grows with steps).
# Prognostics per BASELINE.md; fluxes are instantaneous diagnostics.
HISTORY_TOL = {
    "SOIL_M": 5e-3, "SOIL_W": 5e-3, "SOIL_T": 0.5, "SNOW_T": 1.0,
    "TG": 0.5, "TV": 0.5, "TRAD": 0.5, "TAH": 0.5, "EAH": 20.0,
    "CANLIQ": 0.1, "CANICE": 0.1, "SNEQV": 1.0, "SNOWH": 5e-3,
    "ZWT": 0.05, "WA": 5.0, "WT": 5.0,
    "FSA": 5.0, "FIRA": 5.0, "HFX": 8.0, "GRDFLX": 8.0, "LH": 8.0,
    "UGDRNOFF": 1.0, "SFCRNOFF": 1.0, "ACSNOW": 0.5, "ACSNOM": 0.5,
    "FVEG": 1e-3, "ALBEDO": 5e-3, "EMISS": 5e-3,
    "ISNOW": 0.0, "SNICE": 2.0, "SNLIQ": 1.0, "QSNOW": 1e-4,
    "ECAN": 5e-5, "ETRAN": 5e-5, "EDIR": 5e-5, "FSNO": 5e-2,
    "CM": 5e-3, "CH": 5e-3, "FWET": 5e-2, "RAINRATE": 1e-9,
    "COSZ": 1e-4, "SWFORC": 1e-2, "LWFORC": 1e-2,
}
RESTART_TOL = {
    "SMC": 5e-3, "SH2O": 5e-3, "SOIL_T": 0.5, "SNOW_T": 1.0,
    "SNEQV": 1.0, "SNOWH": 5e-3, "CANLIQ": 0.1, "CANICE": 0.1,
    "TV": 0.5, "TG": 0.5, "ZWT": 0.05, "WA": 5.0, "WT": 5.0,
    "ISNOW": 0.0, "SNICE": 2.0, "SNLIQ": 1.0, "ZSNSO": 5e-3,
    "EAH": 20.0, "TAH": 0.5, "CM": 5e-3, "CH": 5e-3,
    "FWET": 5e-2, "SNEQVO": 1.0, "QSNOW": 1e-4, "QSFC": 5e-4,
    "LFMASS": 1.0, "RTMASS": 1.0, "STMASS": 1.0, "WOOD": 1.0,
    "STBLCP": 1.0, "FASTCP": 1.0, "LAI": 0.05, "SAI": 0.02,
    "TAUSS": 0.05, "ALBOLD": 0.01, "SFCRUNOFF": 1.0, "UDRUNOFF": 1.0,
    "ACMELT": 0.5, "ACSNOW": 0.5,
}
MISSING = -1.0e30     # mask threshold (water cells carry -1e33)


def sh(cmd, cwd=None, env=None, input_text=None):
    print(f"+ {cmd if isinstance(cmd, str) else ' '.join(map(str, cmd))}",
          flush=True)
    subprocess.run(cmd, cwd=cwd, env=env, input=input_text, text=True,
                   check=True,
                   shell=isinstance(cmd, str))


def build_reference(ref: Path):
    """configure (option 1: Linux GCC seq) + make -> run/noahmp.exe."""
    exe = ref / "run" / "noahmp.exe"
    if exe.exists():
        return exe
    env = dict(os.environ)
    # modern gfortran rejects some legacy F77 argument-mismatch code
    env.setdefault("FFLAGS_EXTRA", "")
    sh("./configure", cwd=ref, input_text="1\n")
    # allow legacy Fortran through recent gfortran versions
    mfin = ref / "makefile.in"
    txt = mfin.read_text()
    if "-fallow-argument-mismatch" not in txt:
        txt = txt.replace("F90FLAGS =", "F90FLAGS = "
                          "-fallow-argument-mismatch -fallow-invalid-boz ",
                          1)
        mfin.write_text(txt)
    sh("make", cwd=ref, env=env)
    assert exe.exists(), "reference build produced no run/noahmp.exe"
    return exe


def gen_case(workdir: Path, ny, nx, ndays, opt_run):
    import make_demo_case as demo
    case = workdir / "case"
    (case / "input").mkdir(parents=True, exist_ok=True)
    demo.write_domain(str(case / "domain.nc"), ny, nx)
    demo.write_init(str(case / "init.nc"), ny, nx)
    # one extra day of forcing so the cross-restart legs (resume at
    # the final restart stamp, run one more day) have input to read
    demo.write_forcings(str(case / "input"), ny, nx, ndays + 1)
    return case


def write_namelist(case: Path, tag: str, ndays, opt_run, extra=""):
    import make_demo_case as demo
    nml = demo.NAMELIST.format(case=case.resolve(), ndays=ndays,
                               opt_run=opt_run)
    nml = nml.replace("OUTDIR = '%s/output'" % case.resolve(),
                      "OUTDIR = '%s/output_%s'" % (case.resolve(), tag))
    nml = nml.replace("RESDIR = '%s/restart'" % case.resolve(),
                      "RESDIR = '%s/restart_%s'" % (case.resolve(), tag))
    if extra:
        nml = nml.replace("/\n", extra + "\n/\n")
    p = case / f"noahmp.namelist.{tag}"
    p.write_text(nml)
    (case / f"output_{tag}").mkdir(exist_ok=True)
    (case / f"restart_{tag}").mkdir(exist_ok=True)
    return p


def run_fortran(exe: Path, nml: Path, tables: Path, rundir: Path):
    """Run noahmp.exe from a directory holding the .TBLs + namelist;
    returns wall seconds of the whole process."""
    rundir.mkdir(parents=True, exist_ok=True)
    for tbl in ("MPTABLE.TBL", "SOILPARM.TBL", "VEGPARM.TBL",
                "GENPARM.TBL"):
        dst = rundir / tbl
        if not dst.exists():
            shutil.copy(tables / tbl, dst)
    shutil.copy(nml, rundir / "noahmp.namelist")
    t0 = time.perf_counter()
    sh([str(exe)], cwd=rundir)
    return time.perf_counter() - t0


def run_jax(nml: Path):
    from noahmp_tpu.driver.namelist import read_namelist
    from noahmp_tpu.driver.model import LandModel
    cfg, rs = read_namelist(str(nml))
    m = LandModel.from_namelist(cfg, rs)
    t0 = time.perf_counter()
    m.run(verbose=False)
    return m, time.perf_counter() - t0


def _nc_vars(path):
    from noahmp_tpu.io.nc4 import open_nc
    out = {}
    with open_nc(str(path)) as nc:
        for name, v in nc.variables.items():
            if name == "Times":
                out[name] = b"".join(
                    np.asarray(v[:]).flatten().tolist()).decode()
            else:
                out[name] = np.array(v[:], dtype=np.float64)
    return out


def compare_files(f_path, j_path, tol, label, table):
    """Max-abs-divergence per variable over unmasked cells."""
    fv, jv = _nc_vars(f_path), _nc_vars(j_path)
    failures = []
    for name, lim in sorted(tol.items()):
        if name not in fv or name not in jv:
            continue
        a, b = fv[name], jv[name]
        if a.shape != b.shape:
            # tolerate a transposed-layer layout difference
            if a.ndim == 4 and b.ndim == 4 and a.shape[1] == b.shape[2] \
                    and a.shape[2] == b.shape[1]:
                b = b.transpose(0, 2, 1, 3)
            else:
                failures.append(f"{label}/{name}: shape {a.shape} vs "
                                f"{b.shape}")
                continue
        mask = (a > MISSING) & (b > MISSING) & np.isfinite(a) \
            & np.isfinite(b)
        if not mask.any():
            continue
        dv = float(np.max(np.abs(a - b)[mask]))
        key = f"{label}/{name}"
        table[key] = max(table.get(key, 0.0), dv)
        if dv > lim:
            failures.append(f"{key}: max|diff| = {dv:.4g} > {lim}")
    return failures


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", type=Path, required=True,
                    help="reference NoahMP source tree")
    ap.add_argument("--workdir", type=Path, default=Path("parity_work"))
    ap.add_argument("--ny", type=int, default=20)
    ap.add_argument("--nx", type=int, default=24)
    ap.add_argument("--ndays", type=int, default=3)
    ap.add_argument("--opt-run", type=int, default=3)
    ap.add_argument("--skip-build", action="store_true")
    ap.add_argument("--reuse-jax", type=Path, default=None,
                    help="prior --workdir whose JAX-side outputs "
                         "(case/output_jax, case/restart_jax) are "
                         "reused instead of re-running the model — "
                         "for re-comparing against a different "
                         "reference binary on the identical case")
    ap.add_argument("--skip-cross", action="store_true",
                    help="skip both cross-restart legs (already "
                         "proven by a prior run on the same case)")
    ap.add_argument("--out-json", type=Path, default=None)
    args = ap.parse_args()

    exe = (args.ref / "run" / "noahmp.exe") if args.skip_build \
        else build_reference(args.ref)
    args.workdir.mkdir(parents=True, exist_ok=True)
    case = gen_case(args.workdir, args.ny, args.nx, args.ndays,
                    args.opt_run)
    nml_f = write_namelist(case, "fortran", args.ndays, args.opt_run)
    nml_j = write_namelist(case, "jax", args.ndays, args.opt_run)

    tables = args.ref / "run"
    fsecs = run_fortran(exe, nml_f, tables, args.workdir / "fortran_run")
    if args.reuse_jax:
        import shutil as _sh
        prior = args.reuse_jax / "case"
        for d in ("output_jax", "restart_jax"):
            dst = case / d
            if dst.exists():
                _sh.rmtree(dst)
            _sh.copytree(prior / d, dst)
        jsecs = 0.0          # not re-measured on the reuse path
    else:
        _, jsecs = run_jax(nml_j)

    ncols = args.ny * args.nx
    nsteps = args.ndays * 24          # MODEL_TIMESTEP=3600
    baseline = ncols * nsteps / fsecs
    cpu = "unknown"
    try:
        for line in Path("/proc/cpuinfo").read_text().splitlines():
            if line.startswith("model name"):
                cpu = line.split(":", 1)[1].strip()
                break
    except OSError:
        pass
    print(f"\nFortran: {fsecs:.2f}s ({baseline:,.0f} col*steps/s on "
          f"{cpu}); JAX driver: {jsecs:.2f}s "
          + (f"({ncols * nsteps / jsecs:,.0f} col*steps/s)"
             if jsecs else "(reused prior JAX outputs)"))

    # -- history parity --------------------------------------------------
    table, failures = {}, []
    fouts = sorted((case / "output_fortran").glob("output.*"))
    for f_path in fouts:
        stamp = f_path.name.split(".")[1]
        j_path = case / "output_jax" / f"output.{stamp}.nc"
        if not j_path.exists():
            failures.append(f"missing JAX history {j_path.name}")
            continue
        failures += compare_files(f_path, j_path, HISTORY_TOL,
                                  f"hist@{stamp}", table)
    if not fouts:
        failures.append("Fortran produced no history output")

    # -- restart parity ---------------------------------------------------
    frsts = sorted((case / "restart_fortran").glob("restart.*"))
    for f_path in frsts:
        stamp = f_path.name.split(".")[1]
        j_path = case / "restart_jax" / f"restart.{stamp}.nc"
        if j_path.exists():
            failures += compare_files(f_path, j_path, RESTART_TOL,
                                      f"rst@{stamp}", table)

    # -- cross-restart (a): resume LandModel from the FORTRAN restart -----
    cross_ok = False
    if args.skip_cross:
        frsts = []
    if frsts:
        from noahmp_tpu.driver.namelist import read_namelist
        from noahmp_tpu.driver.model import LandModel
        nml_x = write_namelist(
            case, "cross", args.ndays, args.opt_run,
            extra=(" RESTART_FILE = '%s'\n from_restart = .true.\n"
                   % frsts[-1].resolve()))
        cfg, rs = read_namelist(str(nml_x))
        mx = LandModel.from_namelist(cfg, rs)
        mx.run(nsteps=min(24, nsteps))
        cross_ok = True
        print(f"cross-restart: resumed from {frsts[-1].name}, "
              f"ran {min(24, nsteps)} steps OK")

    # -- cross-restart (b): noahmp.exe resumes from the JAX restart -------
    # (module_hrldas_noahmp_driver.F90:180-251 reads RESTART_FILE by
    # name via hrldas_restart_get; our restart carries the reference
    # variable names/dims, so the Fortran reader must accept it)
    fortran_reads_jax = False
    jrsts = ([] if args.skip_cross
             else sorted((case / "restart_jax").glob("restart.*")))
    if jrsts:
        nml_fx = write_namelist(
            case, "fxj", args.ndays, args.opt_run,
            extra=(" RESTART_FILE = '%s'\n from_restart = .true.\n"
                   % jrsts[-1].resolve()))
        try:
            run_fortran(exe, nml_fx, tables,
                        args.workdir / "fortran_from_jax")
            fxo = sorted((case / "output_fxj").glob("output.*"))
            fortran_reads_jax = len(fxo) > 0
            print(f"fortran-reads-jax-restart: resumed noahmp.exe from "
                  f"{jrsts[-1].name}, wrote {len(fxo)} history files")
            if not fortran_reads_jax:
                failures.append("noahmp.exe resumed from the JAX "
                                "restart but wrote no history output")
        except subprocess.CalledProcessError as e:
            failures.append(f"noahmp.exe failed to resume from the "
                            f"JAX-written restart {jrsts[-1].name}: {e}")

    # -- report -----------------------------------------------------------
    print("\nmax-divergence table (worst over all compared files):")
    for k in sorted(table, key=lambda k: -table[k])[:40]:
        print(f"  {k:<28s} {table[k]:.4g}")
    result = {
        "fortran_seconds": fsecs,
        "jax_seconds": jsecs,
        "measured_baseline_col_steps_per_s": baseline,
        "baseline_cpu": cpu,
        "ncols": ncols, "nsteps": nsteps,
        "history_files_compared": len(fouts),
        "restart_files_compared": len(frsts),
        "cross_restart_ok": cross_ok,
        "fortran_reads_jax_restart_ok": fortran_reads_jax,
        "max_divergence": table,
        "failures": failures,
    }
    out = args.out_json or (args.workdir / "parity.json")
    out.write_text(json.dumps(result, indent=1))
    print(f"\nwrote {out}")
    if failures:
        print("\nPARITY FAILURES:")
        for f in failures:
            print("  " + f)
        sys.exit(1)
    print("\nPARITY OK")


if __name__ == "__main__":
    main()
