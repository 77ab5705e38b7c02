"""Stand-in `noahmp.exe` for exercising scripts/fortran_parity.py
without a Fortran toolchain (VERDICT r3 next #2).

Behaves like the reference binary from the harness's point of view:
 - runs from a directory holding `noahmp.namelist` + the four .TBL
   parameter tables (run_fortran copies them there, exactly as the
   real exe requires — reading the tables from CWD proves the harness
   staged them),
 - integrates the case the namelist points at,
 - writes history/restart under the namelist's OUTDIR/RESDIR using the
   REFERENCE file naming `output.YYYYMMDDTHHMMSS` /
   `restart.YYYYMMDDTHHMMSS` with NO .nc suffix
   (module_hrldas_netcdf_io.F90:1638, :2154), which is what the
   harness's stamp parsing and file mapping must handle.

Set MOCK_PERTURB=1 to inject a +0.5 K/step ground-temperature drift —
used by tests/test_fortran_parity_harness.py to prove the harness's
tolerance table actually FAILS on a real divergence.

This is harness plumbing validation, not physics validation: the
model under test would be compared against itself.  Value-level
physics parity is carried by the scalar-oracle trajectories in
tests/oracles/; the real noahmp.exe comparison runs on CI
(fortran-parity job), which after this test can only fail in the
build stage.
"""

import dataclasses
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    from noahmp_tpu.driver.namelist import read_namelist
    from noahmp_tpu.driver.model import LandModel

    cwd = Path.cwd()
    cfg, rs = read_namelist(str(cwd / "noahmp.namelist"))
    for tbl in ("MPTABLE.TBL", "SOILPARM.TBL", "VEGPARM.TBL",
                "GENPARM.TBL"):
        assert (cwd / tbl).exists(), (
            f"{tbl} not staged in the run directory — the real "
            f"noahmp.exe reads its tables from CWD")

    m = LandModel.from_namelist(cfg, rs, table_dir=str(cwd))

    if os.environ.get("MOCK_PERTURB"):
        core = m._core

        def perturbed(p, s, f, mk, a, mmf, it):
            s2, d, a2, mmf2 = core(p, s, f, mk, a, mmf, it)
            s2 = dataclasses.replace(s2, tg=s2.tg + 0.5)
            return s2, d, a2, mmf2

        m._core = perturbed
        m._chunk_fns = {}
        m.check_mode = "off"    # the drift violates energy closure

    m.run(verbose=True)

    # reference naming: strip the .nc suffix our writers add
    for d in (Path(rs.outdir), Path(rs.resdir)):
        if d.is_dir():
            for p in sorted(d.glob("*.nc")):
                p.rename(p.with_suffix(""))
    print("mock noahmp.exe done")


if __name__ == "__main__":
    main()
